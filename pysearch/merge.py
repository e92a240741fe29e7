"""Segment merge — the compaction path (north_rule: "posting-list
construction, MERGE, compression").

Reference anchors (SURVEY §2.3 `segment_merge`): TieredMergePolicy picks
segments, SegmentMerger k-way-merges sorted postings with docID remap
([lucene dep] org.apache.lucene.index.SegmentMerger; ES side
server/src/main/java/org/elasticsearch/index/MergePolicyConfig.java,
index/engine/ElasticsearchConcurrentMergeScheduler.java).

Spark formulation: a TRUE merge — posting blocks are decoded and
re-encoded, documents are NOT re-tokenized. The shuffle key is
(term, salt), NEVER bare term (the r01 plan audit flagged the old
groupBy(term) as a scale killer: a Zipf-head term's entire merged posting
set landed in ONE task — exactly the skew the build path salts for).
Two paths, chosen per term:

  * FAST (salt keys stable: every input segment salted the term with the
    same n_salts as the merged index wants): encoded block rows shuffle
    by (term, salt) — ~1-2 bytes/posting on the wire — then a
    partition-wise mapInPandas kernel decodes each (term, salt) run,
    re-sorts, and re-encodes with the merged idf. Max task grain = one
    salt sub-list of one term.
  * RE-SALT (a term's df crossed the salt threshold, or segments
    disagree): blocks are decoded to posting-grain rows first
    (vectorized decode_blocks_concat), the new salt = doc_id % n_salts'
    is attached, and the rows flow through THE SAME
    repartition(term, salt) + sortWithinPartitions + encode kernel the
    build path uses (build.encode_partition_kernel).

Invariant (tested): merge(build(A), build(B)) is BYTE-IDENTICAL to
build(A ∪ B) — same blocks, same impacts, same salting — because salting
is a pure function of the merged df and block framing is a pure function
of the sorted docID list.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from . import codec
from .build import (DEFAULT_N_SALTS, DEFAULT_SALT_THRESHOLD, POSTINGS_SCHEMA,
                    Index, Stats, encode_partition_kernel)


_CARRY_TYPES = {"df": "df long", "n_salts": "n_salts int"}


def decode_to_posting_rows(posts, carry: tuple[str, ...] = ()):
    """Encoded block rows -> posting-grain rows (term, doc_id, tf,
    dl_byte [+ carry columns repeated per posting]). Vectorized decode:
    one varint pass over each Arrow batch's concatenated buffers
    (codec.decode_blocks_concat), no per-row Python. Shared by
    merge_indexes' re-salt path and versioning.compact's delete-dropping
    rewrite ([lucene dep] SegmentMerger reads postings the same way)."""
    schema = ("term string, doc_id long, tf long, dl_byte int"
              + "".join(f", {_CARRY_TYPES[c]}" for c in carry))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            counts = pdf["n_in_block"].to_numpy()
            ids, tfs, nrm = codec.decode_blocks_concat(
                pdf["first_doc_id"].to_numpy(), pdf["docid_gaps"],
                counts, pdf["tfs_enc"], pdf["norms_enc"])
            data = {
                "term": np.repeat(pdf["term"].to_numpy(), counts),
                "doc_id": ids, "tf": tfs,
                "dl_byte": nrm.astype(np.int32)}
            for c in carry:
                data[c] = np.repeat(pdf[c].to_numpy(), counts)
            yield pd.DataFrame(data)

    return posts.mapInPandas(kernel, schema=schema)


#: merged-vocab row count above which the term-dim join stops being
#: broadcast (r03 advice: the old unconditional broadcast of the full
#: merged term dim exceeds the 8 GB broadcast cap at full-vocab scale).
#: 2M rows ≈ tens of MB — comfortably broadcastable; above it Catalyst
#: picks a shuffle join co-partitioned with the (term, salt) exchange.
BROADCAST_VOCAB_MAX = 2_000_000


def merge_indexes(spark: SparkSession, indexes: list[Index], *,
                  cache: bool = True, broadcast_dims: bool | None = None,
                  broadcast_vocab_max: int = BROADCAST_VOCAB_MAX) -> Index:
    """Merge N built segments into one (doc_id spaces must be disjoint —
    guaranteed by the contractual global doc_id assignment).

    broadcast_dims: None (default) = ADAPTIVE — broadcast the merged term
    dim only while the merged vocabulary fits under broadcast_vocab_max
    rows (the count is a cheap agg over the already-persisted merged
    term_stats); True/False force either path (r02's escape hatch kept
    for tests and callers that know their vocab)."""
    assert indexes, "need at least one index"
    k1, b = indexes[0].k1, indexes[0].b
    n_buckets = indexes[0].n_buckets
    salt_threshold = indexes[0].meta.get("salt_threshold", DEFAULT_SALT_THRESHOLD)
    n_salts_cfg = indexes[0].meta.get("n_salts", DEFAULT_N_SALTS)

    docs = indexes[0].docs
    for ix in indexes[1:]:
        docs = docs.unionByName(ix.docs)

    stats = Stats(
        n_docs=sum(ix.stats.n_docs for ix in indexes),
        sum_dl=sum(ix.stats.sum_dl for ix in indexes),
    )

    term_stats = indexes[0].term_stats.select("term", "df", "cf")
    for ix in indexes[1:]:
        term_stats = term_stats.unionByName(ix.term_stats.select("term", "df", "cf"))
    term_stats = (
        term_stats.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn(
            "n_salts",
            F.when(F.col("df") > salt_threshold, F.lit(n_salts_cfg))
            .otherwise(F.lit(1)))
    )
    if cache:
        term_stats = term_stats.persist()

    if broadcast_dims is None:
        broadcast_dims = term_stats.count() <= broadcast_vocab_max

    # Route each term to the fast (salt-stable) or re-salt path. The
    # routing flag is derived entirely at TERM grain (per-segment
    # term_stats ⋈ merged term_stats → min over segments of
    # old_n_salts == n_salts), never via a groupBy over posting rows, and
    # reaches the postings through ONE term-keyed join. broadcast_dims
    # mirrors build_index's escape hatch (r02 advice): at vocabularies
    # beyond the broadcast cap pass False and Catalyst picks a shuffle
    # join co-partitioned with the (term, salt) encode exchange.
    seg_salts = None
    for ix in indexes:
        old = ix.term_stats.select("term", F.col("n_salts").alias("old_n_salts"))
        seg_salts = old if seg_salts is None else seg_salts.unionByName(old)
    term_dims = (
        seg_salts.join(term_stats.select("term", "df", "n_salts"), "term")
        .groupBy("term", "df", "n_salts")
        .agg(F.min((F.col("old_n_salts") == F.col("n_salts")).cast("int"))
             .alias("fast")))
    if broadcast_dims:
        term_dims = F.broadcast(term_dims)
    posts = None
    for ix in indexes:
        part = ix.postings.drop("df", "bucket")
        posts = part if posts is None else posts.unionByName(part)
    posts = posts.join(term_dims, "term")

    n_docs, avgdl = stats.n_docs, stats.avgdl
    spark_ = posts.sparkSession
    n_parts = int(spark_.conf.get("spark.sql.shuffle.partitions"))

    # ---- fast path: encoded blocks shuffle by (term, salt) -----------------
    fast = (posts.where(F.col("fast") == 1)
            .repartition(n_parts, "term", "salt")
            .sortWithinPartitions("term", "salt", "first_doc_id"))

    def reencode_runs(batches):
        import numpy as np
        import pandas as pd

        cols = [f.name for f in POSTINGS_SCHEMA.fields]
        carry: pd.DataFrame | None = None

        def encode_run(g, out):
            term = g["term"].iat[0]
            salt = int(g["salt"].iat[0])
            df_global = int(g["df"].iat[0])
            idf = float(codec.bm25_idf(df_global, n_docs))
            ids, tfs, nrm = codec.decode_blocks_concat(
                g["first_doc_id"].to_numpy(), g["docid_gaps"],
                g["n_in_block"].to_numpy(), g["tfs_enc"], g["norms_enc"])
            o = np.argsort(ids, kind="stable")
            for r in codec.encode_blocks(ids[o], tfs[o], nrm[o],
                                         idf, avgdl, k1, b):
                r["term"] = term
                r["salt"] = salt
                r["bucket"] = 0
                r["df"] = df_global
                out.append(r)

        def flush(pdf, last_partial):
            terms = pdf["term"].to_numpy()
            salts = pdf["salt"].to_numpy()
            change = np.flatnonzero((terms[1:] != terms[:-1])
                                    | (salts[1:] != salts[:-1])) + 1
            bounds = np.concatenate(([0], change, [len(pdf)]))
            stop = len(bounds) - 2 if last_partial else len(bounds) - 1
            out: list[dict] = []
            for i in range(stop):
                encode_run(pdf.iloc[bounds[i]:bounds[i + 1]], out)
            rest = pdf.iloc[bounds[stop]:].copy() if last_partial else None
            return out, rest

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            rows, carry = flush(pdf, last_partial=True)
            if rows:
                yield pd.DataFrame(rows, columns=cols)
        if carry is not None and len(carry):
            rows, _ = flush(carry, last_partial=False)
            yield pd.DataFrame(rows, columns=cols)

    fast_posts = fast.mapInPandas(reencode_runs, schema=POSTINGS_SCHEMA)

    # ---- re-salt path: decode to posting grain, reuse the build kernel ----
    slow = posts.where(F.col("fast") == 0)
    decoded = decode_to_posting_rows(slow, carry=("df", "n_salts"))
    slow_sorted = (decoded
                   .withColumn("salt", F.pmod("doc_id", F.col("n_salts"))
                               .cast("int"))
                   .repartition(n_parts, "term", "salt")
                   .sortWithinPartitions("term", "salt"))
    slow_posts = slow_sorted.mapInPandas(
        encode_partition_kernel(n_docs, avgdl, k1, b), schema=POSTINGS_SCHEMA)

    postings = (
        fast_posts.unionByName(slow_posts)
        .withColumn("bucket",
                    F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    )
    if cache:
        postings = postings.persist()

    return Index(
        docs=docs, postings=postings, term_stats=term_stats, stats=stats,
        k1=k1, b=b, n_buckets=n_buckets,
        meta={**indexes[0].meta, "merged_from": len(indexes)},
    )

"""Segment merge — the compaction path (north_rule: "posting-list
construction, MERGE, compression").

Reference anchors (SURVEY §2.3 `segment_merge`): TieredMergePolicy picks
segments, SegmentMerger k-way-merges sorted postings with docID remap
([lucene dep] org.apache.lucene.index.SegmentMerger; ES side
server/src/main/java/org/elasticsearch/index/MergePolicyConfig.java,
index/engine/ElasticsearchConcurrentMergeScheduler.java).

Spark formulation: a TRUE merge — posting blocks are decoded and
re-encoded, documents are NOT re-tokenized. One term-hash shuffle of the
(already tiny) encoded block rows, then a grouped-map re-encode per term:

  postings_a ∪ postings_b ─ join new global term_stats ─ groupBy(term)
    ─ applyInPandas: decode blocks → concat → sort by doc_id → re-salt
      → re-encode 128-doc blocks with merged-index idf/avgdl

Invariant (tested): merge(build(A), build(B)) is BYTE-IDENTICAL to
build(A ∪ B) — same blocks, same impacts, same salting — because salting
is a pure function of the merged df and block framing is a pure function
of the sorted docID list.

Scale notes: the shuffle moves encoded blocks (~1-2 bytes/posting), not
tokens; hot merged terms are one task each (their sub-lists must meet to
be re-salted) — the same skew the build path salts for, bounded here by
the fact that merge inputs are already compressed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from . import codec
from .build import (DEFAULT_N_SALTS, DEFAULT_SALT_THRESHOLD, POSTINGS_SCHEMA,
                    Index, Stats)


def merge_indexes(spark: SparkSession, indexes: list[Index], *,
                  cache: bool = True) -> Index:
    """Merge N built segments into one (doc_id spaces must be disjoint —
    guaranteed by the contractual global doc_id assignment)."""
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

    posts = indexes[0].postings
    for ix in indexes[1:]:
        posts = posts.unionByName(ix.postings)
    # drop per-segment df (stale) and re-attach the merged global df
    posts = (posts.drop("df", "bucket", "salt")
             .join(term_stats.select("term", "df", "n_salts"), "term"))

    n_docs, avgdl = stats.n_docs, stats.avgdl

    def remerge(pdf):
        import numpy as np
        import pandas as pd

        term = pdf["term"].iloc[0]
        df_global = int(pdf["df"].iloc[0])
        n_salts = int(pdf["n_salts"].iloc[0])
        idf = float(codec.bm25_idf(df_global, n_docs))
        ids, tfs, nrm = [], [], []
        for f0, g, t_, nb in zip(pdf["first_doc_id"], pdf["docid_gaps"],
                                 pdf["tfs_enc"], pdf["norms_enc"]):
            d, t, n = codec.decode_block(f0, bytes(g), bytes(t_), bytes(nb))
            ids.append(d); tfs.append(t); nrm.append(n)
        doc_ids = np.concatenate(ids)
        tf = np.concatenate(tfs)
        norms = np.concatenate(nrm)
        outs = []
        salts = (doc_ids % n_salts).astype(np.int64)
        for s in np.unique(salts):
            m = salts == s
            rows = codec.encode_blocks(
                doc_ids[m], tf[m], norms[m], idf, avgdl, k1, b)
            o = pd.DataFrame(rows)
            o.insert(0, "term", term)
            o.insert(1, "salt", int(s))
            o.insert(2, "bucket", 0)
            o.insert(3, "df", df_global)
            outs.append(o)
        return pd.concat(outs, ignore_index=True)

    postings = (
        posts.groupBy("term")
        .applyInPandas(remerge, schema=POSTINGS_SCHEMA)
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

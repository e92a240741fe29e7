"""Query execution: top-k BM25 term/match/bool queries over the index.

Models the reference's query-then-fetch lifecycle (SURVEY §3.1):
  analyze query -> per-term posting lookups (bucket-pruned scans)
  -> scoring (vectorized numpy over decoded blocks)
  -> global top-k (score desc, doc_id asc)  -> fetch phase (join docs).

Two physical strategies (auto-selected by estimated candidate size):

  * 'distributed' — posting rows are decoded+scored per partition with
    mapInPandas (narrow, no gather), then groupBy(doc_id).sum + Spark's
    TakeOrderedAndProject (a distributed bounded heap) produce the global
    top-k. Scales to arbitrarily hot terms; the shuffle carries one row
    per (candidate doc, term). ES analog: per-shard query phase +
    SearchPhaseController#reducedQueryPhase.

  * 'gather' — all posting blocks for the query's terms go to ONE task per
    query (tiny for selective queries; exactly ES's scatter-gather), where
    a numpy MAXSCORE/block-max scorer prunes: terms are processed in
    descending max-impact order; once the sum of remaining terms' upper
    bounds drops below the running kth score, remaining terms can no
    longer introduce new winners, so only blocks whose docID range
    intersects current candidates are decoded (block skipping via the
    block_max/first_doc_id impact metadata). Rank-identical to exhaustive
    scoring — verified in tests. [lucene dep] WANDScorer / MaxScoreCache /
    ImpactsDISI; collector TopScoreDocCollector#setMinCompetitiveScore.

Batch API: search_many() plans N queries as ONE Spark job (queries
broadcast-joined against postings, groupBy(query_id) gather) — the shape a
100 TB deployment actually runs (query throughput, not one-off latency).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, functions as F, types as T

from . import analysis, codec
from .build import Index

HIT_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])

GATHER_MAX_POSTINGS = 2_000_000  # est. candidate postings above which we go distributed


@dataclass
class Query:
    query_id: int
    terms: list[str]        # analyzed tokens (duplicates = clause multiplicity)
    k: int = 10
    mode: str = "or"        # or | and

    @classmethod
    def from_text(cls, query_id: int, text: str, k: int = 10, mode: str = "or"):
        return cls(query_id, analysis.analyze(text), k, mode)


# ---------------------------------------------------------------------------
# numpy scoring kernels (shared by both physical strategies)
# ---------------------------------------------------------------------------


def _decode_rows(first, gaps, tfs, norms):
    """Decode a sequence of block rows -> (doc_ids, tfs, dlq) int64 arrays."""
    ids, fs, ns = [], [], []
    for f0, g, t, nb in zip(first, gaps, tfs, norms):
        d, tf, n = codec.decode_block(f0, bytes(g), bytes(t), bytes(nb))
        ids.append(d); fs.append(tf); ns.append(n)
    if not ids:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (np.concatenate(ids), np.concatenate(fs),
            codec.byte4_to_int(np.concatenate(ns)))


def _topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """Top-k by (score desc, doc_id asc); returns (doc_ids, scores)."""
    if len(doc_ids) == 0:
        return doc_ids, scores
    if len(doc_ids) > k:
        # argpartition alone loses tie determinism at the boundary: take a
        # safe superset of everything >= kth value, then sort exactly.
        kth = scores[np.argpartition(-scores, k - 1)[k - 1]]
        keep = scores >= kth
        doc_ids, scores = doc_ids[keep], scores[keep]
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def _score_query_group(pdf, n_docs: int, avgdl: float, k1: float, b: float):
    """Grouped-map kernel: all posting blocks of one query -> its top-k.

    Implements MAXSCORE with block skipping (see module docstring).
    """
    import pandas as pd

    k = int(pdf["k"].iloc[0])
    mode = pdf["mode"].iloc[0]
    qid = int(pdf["query_id"].iloc[0])

    # per (term,salt) posting lists, with per-term query weight + global df
    lists = []
    for (term, _salt), g in pdf.groupby(["term", "salt"], sort=False):
        g = g.sort_values("block_id")
        idf = float(codec.bm25_idf(int(g["df"].iloc[0]), n_docs))
        lists.append({
            "term": term,
            "weight": float(g["weight"].iloc[0]),
            "idf": idf,
            "first": g["first_doc_id"].to_numpy(),
            "gaps": g["docid_gaps"].tolist(),
            "tfs": g["tfs_enc"].tolist(),
            "norms": g["norms_enc"].tolist(),
            "bms": g["block_max_score"].to_numpy(dtype=np.float64),
        })

    def decode_scores(lst, block_mask=None):
        idx = np.nonzero(block_mask)[0] if block_mask is not None else range(len(lst["first"]))
        ids, tfs, dlq = _decode_rows(
            [lst["first"][i] for i in idx], [lst["gaps"][i] for i in idx],
            [lst["tfs"][i] for i in idx], [lst["norms"][i] for i in idx])
        sc = lst["idf"] * codec.bm25_tf_weight(tfs, dlq, avgdl, k1, b) * lst["weight"]
        return ids, sc

    n_terms = len({l["term"] for l in lists})

    if mode == "and":
        # decode all, per-term doc sets; intersect ascending-df first
        per_term: dict[str, list] = {}
        for lst in lists:
            ids, sc = decode_scores(lst)
            per_term.setdefault(lst["term"], []).append((ids, sc))
        term_arrays = []
        for term, parts in per_term.items():
            ids = np.concatenate([p[0] for p in parts])
            sc = np.concatenate([p[1] for p in parts])
            o = np.argsort(ids, kind="stable")
            term_arrays.append((ids[o], sc[o]))
        term_arrays.sort(key=lambda a: len(a[0]))
        cur_ids, cur_sc = term_arrays[0]
        for ids, sc in term_arrays[1:]:
            pos = np.searchsorted(ids, cur_ids)
            pos_c = np.minimum(pos, len(ids) - 1)
            hit = ids[pos_c] == cur_ids
            cur_ids, cur_sc = cur_ids[hit], cur_sc[hit] + sc[pos_c[hit]]
        top_ids, top_sc = _topk(cur_ids, cur_sc, k)
    else:
        # MAXSCORE: process terms in descending max-contribution order
        term_max: dict[str, float] = {}
        for lst in lists:
            m = float(lst["bms"].max() * lst["weight"]) if len(lst["bms"]) else 0.0
            term_max[lst["term"]] = max(term_max.get(lst["term"], 0.0), m)
        order = sorted(term_max, key=lambda t: -term_max[t])
        remaining_ub = {
            order[i]: sum(term_max[t] for t in order[i:]) for i in range(len(order))
        }
        acc_ids = np.zeros(0, dtype=np.int64)
        acc_sc = np.zeros(0, dtype=np.float64)
        by_term: dict[str, list] = {}
        for lst in lists:
            by_term.setdefault(lst["term"], []).append(lst)
        theta = -np.inf
        for term in order:
            prune = remaining_ub[term] < theta  # new docs can no longer win
            for lst in by_term[term]:
                if prune and len(acc_ids):
                    # block skipping: only blocks whose doc range may contain
                    # a current candidate need decoding
                    firsts = lst["first"]
                    ends = np.append(firsts[1:], np.iinfo(np.int64).max)
                    lo = np.searchsorted(acc_ids, firsts, side="left")
                    hi = np.searchsorted(acc_ids, ends, side="left")
                    mask = hi > lo
                    if not mask.any():
                        continue
                    ids, sc = decode_scores(lst, mask)
                    keep = np.isin(ids, acc_ids, assume_unique=False)
                    ids, sc = ids[keep], sc[keep]
                elif prune:
                    continue
                else:
                    ids, sc = decode_scores(lst)
                acc_ids = np.concatenate([acc_ids, ids])
                acc_sc = np.concatenate([acc_sc, sc])
                o = np.argsort(acc_ids, kind="stable")
                acc_ids, acc_sc = acc_ids[o], acc_sc[o]
                uids, inv = np.unique(acc_ids, return_inverse=True)
                usc = np.zeros(len(uids))
                np.add.at(usc, inv, acc_sc)
                acc_ids, acc_sc = uids, usc
            if len(acc_sc) >= k:
                theta = np.partition(acc_sc, len(acc_sc) - k)[len(acc_sc) - k]
        top_ids, top_sc = _topk(acc_ids, acc_sc, k)

    return pd.DataFrame({"query_id": qid, "doc_id": top_ids, "score": top_sc})


# ---------------------------------------------------------------------------
# physical strategies
# ---------------------------------------------------------------------------


def _queries_df(index: Index, queries: list[Query]):
    spark = index.postings.sparkSession
    rows = []
    for q in queries:
        for term, mult in Counter(q.terms).items():
            rows.append((q.query_id, term, float(mult), q.k, q.mode))
    schema = "query_id long, term string, weight double, k int, mode string"
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


def term_meta(index: Index, terms: list[str]) -> dict[str, tuple[int, int]]:
    """term -> (df, bucket) from term_stats, memoized on the Index.

    One tiny Spark job resolves ALL missing terms of a query at once
    (df for selectivity estimation + WAND, bucket = pmod(xxhash64, P) for
    partition pruning — xxhash64 lives JVM-side only). Repeat queries hit
    the cache and schedule zero extra jobs. ES analog: the terms
    dictionary lookup that precedes posting iteration."""
    cache = index.meta.setdefault("_term_cache", {})
    missing = [t for t in terms if t not in cache]
    if missing:
        rows = (
            index.term_stats.where(F.col("term").isin(missing))
            .select("term", "df",
                    F.pmod(F.xxhash64("term"), F.lit(index.n_buckets))
                    .cast("int").alias("bucket"))
            .collect())
        for r in rows:
            cache[r["term"]] = (int(r["df"]), int(r["bucket"]))
        for t in missing:
            cache.setdefault(t, (0, -1))  # absent from the index
    return {t: cache[t] for t in terms}


def _candidates(index: Index, queries: list[Query]) -> DataFrame:
    """Posting rows for all query terms, tagged with query_id/weight/k/mode.

    Bucket pruning: the IN-list on `bucket` prunes parquet partitions when
    the postings table is disk-backed (postings are partitionBy(bucket))."""
    terms = sorted({t for q in queries for t in q.terms})
    meta = term_meta(index, terms)
    buckets = sorted({b for _, b in meta.values() if b >= 0})
    qdf = _queries_df(index, queries)
    cand = index.postings.where(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    return cand.join(F.broadcast(qdf), "term")


LOCAL_MAX_POSTINGS = 200_000  # below this, gather to the DRIVER (one narrow job)


def search_many(index: Index, queries: list[Query], method: str = "auto") -> DataFrame:
    """Batch top-k search: one Spark job for N queries -> (query_id, doc_id, score).

    Physical strategies (ES query-then-fetch analogs, auto-selected by
    Σ df over the query terms):
      local        — candidate posting blocks are collect()ed straight to
                     the driver (bucket-pruned narrow scan, NO shuffle,
                     no Python workers) and scored in numpy there. This
                     is exactly the ES coordinator gather for selective
                     queries; latency = one Spark scan job.
      gather       — blocks shuffle to one task per query; MAXSCORE kernel.
      distributed  — decode+score per partition, shuffle (doc,query) grain,
                     window top-k. For hot terms / huge candidate sets.
    """
    queries = [q for q in queries if q.terms]
    spark = index.postings.sparkSession
    if not queries:
        return spark.createDataFrame([], HIT_SCHEMA)

    if method == "auto":
        est = _estimate_postings(index, queries)
        method = ("local" if est <= LOCAL_MAX_POSTINGS
                  else "gather" if est <= GATHER_MAX_POSTINGS
                  else "distributed")

    if method == "local":
        return _search_local(index, queries)

    if method == "gather":
        cand = _candidates(index, queries)
        n_docs, avgdl, k1, b = index.stats.n_docs, index.stats.avgdl, index.k1, index.b

        def kernel(pdf):
            return _score_query_group(pdf, n_docs, avgdl, k1, b)

        return cand.groupBy("query_id").applyInPandas(kernel, schema=HIT_SCHEMA)

    # distributed: decode+score per partition, shuffle (doc_id,query_id) grain
    return _search_distributed(index, queries)


def _search_local(index: Index, queries: list[Query]) -> DataFrame:
    """Driver-side scoring: ONE narrow Spark job collects the candidate
    posting blocks (term+bucket pruned), then the same MAXSCORE kernel
    runs in-process. Returns a small local DataFrame of top-k rows."""
    import pandas as pd

    spark = index.postings.sparkSession
    cand = _candidates(index, queries).collect()
    if not cand:
        return spark.createDataFrame([], HIT_SCHEMA)
    pdf = pd.DataFrame([r.asDict() for r in cand])
    outs = []
    for qid, g in pdf.groupby("query_id", sort=True):
        outs.append(_score_query_group(
            g, index.stats.n_docs, index.stats.avgdl, index.k1, index.b))
    hits = pd.concat(outs, ignore_index=True)
    if not len(hits):
        return spark.createDataFrame([], HIT_SCHEMA)
    return spark.createDataFrame(hits, schema=HIT_SCHEMA)


def _estimate_postings(index: Index, queries: list[Query]) -> int:
    """Total candidate postings across queries: Σ_q Σ_{t∈q} df(t).
    Served from the term_meta cache (shares its one lookup job)."""
    terms = sorted({t for q in queries for t in q.terms})
    meta = term_meta(index, terms)
    return sum(meta[t][0] for q in queries for t in set(q.terms))


def _search_distributed(index: Index, queries: list[Query]) -> DataFrame:
    cand = _candidates(index, queries)
    n_docs, avgdl, k1, b = index.stats.n_docs, index.stats.avgdl, index.k1, index.b

    def decode_score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            idf = codec.bm25_idf(pdf["df"].to_numpy(), n_docs)
            for i in range(len(pdf)):
                ids, tfs, dlq = _decode_rows(
                    [pdf["first_doc_id"].iat[i]], [pdf["docid_gaps"].iat[i]],
                    [pdf["tfs_enc"].iat[i]], [pdf["norms_enc"].iat[i]])
                sc = idf[i] * codec.bm25_tf_weight(tfs, dlq, avgdl, k1, b) \
                    * pdf["weight"].iat[i]
                outs.append(pd.DataFrame({
                    "query_id": pdf["query_id"].iat[i], "doc_id": ids,
                    "score": sc, "term": pdf["term"].iat[i],
                    "k": pdf["k"].iat[i], "mode": pdf["mode"].iat[i]}))
            if outs:
                yield pd.concat(outs)

    scored = cand.mapInPandas(
        decode_score,
        schema="query_id long, doc_id long, score double, term string, k int, mode string",
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score"),
        F.count(F.lit(1)).alias("nt"),
        F.first("k").alias("k"),
        F.first("mode").alias("mode"),
    )
    need = {q.query_id: len(set(q.terms)) for q in queries}
    need_df = F.broadcast(
        index.postings.sparkSession.createDataFrame(
            [(qid, n) for qid, n in need.items()], "query_id long, need int"))
    agg = agg.join(need_df, "query_id").where(
        (F.col("mode") != "and") | (F.col("nt") == F.col("need")))
    # per-query top-k: window rank (Spark pushes a per-partition bounded sort)
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("k"))
        .select("query_id", "doc_id", "score")
    )


def search(index: Index, text_or_terms, k: int = 10, mode: str = "or",
           method: str = "auto") -> DataFrame:
    """Single query -> DataFrame(doc_id, score), top-k ordered."""
    terms = (analysis.analyze(text_or_terms)
             if isinstance(text_or_terms, str) else list(text_or_terms))
    q = Query(0, terms, k, mode)
    hits = search_many(index, [q], method=method)
    return hits.select("doc_id", "score").orderBy(F.desc("score"), F.asc("doc_id"))


def fetch(index: Index, hits: DataFrame, verify_sha: bool = True) -> DataFrame:
    """Fetch phase: join winners to the forward index (broadcast the k rows).

    Re-verifies the per-row content sha256 invariant (BASELINE.json)."""
    out = index.docs.join(F.broadcast(hits), "doc_id")
    if verify_sha:
        out = out.withColumn(
            "sha_ok", F.sha2(F.col("content"), 256) == F.col("content_sha"))
    cols = ["doc_id", "score", "repo", "path", "commit", "lang", "content_sha"]
    if verify_sha:
        cols.append("sha_ok")
    return out.select(*cols).orderBy(F.desc("score"), F.asc("doc_id"))


def _per_term_scored(index: Index, terms: list[str]) -> DataFrame:
    """(doc_id, term, score) — one row per matching (doc, clause), the
    shared substrate for the compound scorers below (distributed path)."""
    q = Query(0, terms, k=2**31 - 1, mode="or")
    cand = _candidates(index, [q])
    n_docs, avgdl, k1, b = index.stats.n_docs, index.stats.avgdl, index.k1, index.b

    def decode_score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            idf = codec.bm25_idf(pdf["df"].to_numpy(), n_docs)
            for i in range(len(pdf)):
                ids, tfs, dlq = _decode_rows(
                    [pdf["first_doc_id"].iat[i]], [pdf["docid_gaps"].iat[i]],
                    [pdf["tfs_enc"].iat[i]], [pdf["norms_enc"].iat[i]])
                sc = idf[i] * codec.bm25_tf_weight(tfs, dlq, avgdl, k1, b)
                outs.append(pd.DataFrame({
                    "doc_id": ids, "term": pdf["term"].iat[i], "score": sc}))
            if outs:
                yield pd.concat(outs)

    return cand.mapInPandas(
        decode_score, schema="doc_id long, term string, score double")


def search_dis_max(index: Index, text_or_terms, k: int = 10,
                   tie_breaker: float = 0.0) -> DataFrame:
    """dis_max query (SURVEY §2.4 q_dis_max): per-doc score =
    max(clause scores) + tie_breaker · Σ(other clauses).
    Reference: index/query/DisMaxQueryBuilder.java."""
    terms = (analysis.analyze(text_or_terms)
             if isinstance(text_or_terms, str) else list(text_or_terms))
    scored = _per_term_scored(index, sorted(set(terms)))
    agg = scored.groupBy("doc_id").agg(
        F.max("score").alias("mx"), F.sum("score").alias("sm"))
    score = F.col("mx") + tie_breaker * (F.col("sm") - F.col("mx"))
    return (agg.select("doc_id", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def search_constant_score(index: Index, text_or_terms, boost: float = 1.0,
                          mode: str = "or") -> DataFrame:
    """constant_score query (SURVEY §2.5): matching-doc set, score = boost,
    BM25 skipped entirely. Reference: ConstantScoreQueryBuilder.java."""
    terms = (analysis.analyze(text_or_terms)
             if isinstance(text_or_terms, str) else list(text_or_terms))
    q = Query(0, terms, k=2**31 - 1, mode=mode)
    hits = search_many(index, [q], method="distributed")
    return (hits.select("doc_id", F.lit(float(boost)).alias("score"))
            .orderBy("doc_id"))


def search_function_score(index: Index, text_or_terms, k: int = 10,
                          mode: str = "or") -> DataFrame:
    """function_score with a field_value_factor-style modifier (SURVEY
    §2.4 q_function_score): final = bm25 · ln(1 + len(content)/100).
    Reference: index/query/functionscore/FunctionScoreQueryBuilder.java,
    FieldValueFactorFunctionBuilder (modifier=ln1p)."""
    terms = (analysis.analyze(text_or_terms)
             if isinstance(text_or_terms, str) else list(text_or_terms))
    q = Query(0, terms, k=2**31 - 1, mode=mode)
    hits = search_many(index, [q], method="distributed")
    boosted = (hits.join(index.docs.select("doc_id", "content"), "doc_id")
               .withColumn("score",
                           F.col("score")
                           * F.log(F.lit(1.0) + F.length("content") / 100.0))
               .drop("content"))
    return (boosted.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def search_bool_full(index: Index, plan) -> DataFrame:
    """Full `bool` query (SURVEY §2.4 q_bool_full; BoolQueryBuilder.java):
    must (AND, scored) + filter (AND, unscored) + should (OR, score-add,
    minimum_should_match) + must_not (NOT).

    One pass over the per-term scored relation, then pure DataFrame logic:
    clause weights are broadcast; requirements are enforced with
    conditional distinct counts; must_not is a max-flag anti-filter."""
    all_terms = sorted(set(plan.must) | set(plan.should)
                       | set(plan.must_not) | set(plan.filter))
    spark = index.postings.sparkSession
    if not all_terms:
        return spark.createDataFrame([], "doc_id long, score double")
    scored = _per_term_scored(index, all_terms)

    from collections import Counter
    wm, ws = Counter(plan.must), Counter(plan.should)
    req = sorted(set(plan.must) | set(plan.filter))
    clauses = spark.createDataFrame(
        [(t, float(wm.get(t, 0)), float(ws.get(t, 0)),
          t in set(req), t in set(plan.must_not)) for t in all_terms],
        "term string, w_must double, w_should double, "
        "is_req boolean, is_not boolean")

    j = scored.join(F.broadcast(clauses), "term")
    agg = j.groupBy("doc_id").agg(
        F.sum(F.col("score") * (F.col("w_must") + F.col("w_should")))
        .alias("score"),
        F.count_distinct(F.when(F.col("is_req"), F.col("term")))
        .alias("n_req"),
        F.count_distinct(F.when(F.col("w_should") > 0, F.col("term")))
        .alias("n_should"),
        F.max(F.when(F.col("is_not"), 1).otherwise(0)).alias("has_not"),
    )
    out = agg.where(
        (F.col("n_req") == len(req)) & (F.col("has_not") == 0)
        & (F.col("n_should") >= plan.msm))
    return (out.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(plan.k))


def count_matches(index: Index, text_or_terms, mode: str = "or") -> int:
    """_count analog: number of matching docs (no scoring)."""
    terms = (analysis.analyze(text_or_terms)
             if isinstance(text_or_terms, str) else list(text_or_terms))
    if not terms:
        return 0
    q = Query(0, terms, k=2**31 - 1, mode=mode)
    return search_many(index, [q], method="distributed").count()

"""Positional (phrase) queries — SURVEY §2.4 q_phrase.

Reference: MatchPhraseQueryBuilder / [lucene dep] PhraseQuery,
ExactPhraseMatcher: terms must appear at consecutive positions (slop=0) or
within `slop` moves (sloppy). Positions are 0-based indexes into the
POST-analysis token stream (stopwords removed before position assignment —
matches how dl is counted, SURVEY §8.7).

Spark formulation: positions live in a PERSISTED positional-postings
table (term, doc_id, poss array<int>, bucket) written ONCE per corpus —
bucket-partitioned parquet, bucket = crc32(term) % N so the coordinator
derives the partition-pruning predicate in pure Python (build.py
POSITIONS_SCHEMA; [lucene dep] Lucene84PostingsWriter's position stream
next to the doc/freq stream). A phrase [t0, t1] is a join of the two
terms' bucket-pruned position rows on (doc_id, pos+1) — the
ExactPhraseMatcher intersection, expressed relationally so Catalyst
plans it. Queries NEVER re-tokenize documents (the r03 plan audit's one
remaining scale-killer: posexplode of content at query time was a full
corpus scan + tokenize per phrase query)."""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import analysis, build
from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}

N_POS_BUCKETS = 16

#: field name -> Spark column over documents.text (mirrors _MMP_FIELDS)
_FIELD_COLS = {
    "content": lambda: F.col("text"),
    "title": lambda: F.substring("text", 1, 80),
}

#: (sf_dir, field) -> (parquet path, reader DataFrame) of the persisted
#: positional index. The DataFrame handle is cached so the parquet file
#: listing (InMemoryFileIndex over N_POS_BUCKETS dirs, ~1.5 s on a fresh
#: store) happens ONCE at store-build time, not inside the first query.
_POS_STORE: dict[tuple[str, str], tuple[str, DataFrame]] = {}


def _cleanup_pos_store():
    for path, _df in _POS_STORE.values():
        shutil.rmtree(path, ignore_errors=True)
    _POS_STORE.clear()


atexit.register(_cleanup_pos_store)


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


def positions_table(spark: SparkSession, sf_dir: str,
                    field: str = "content") -> DataFrame:
    """The persisted positional-postings table (term, doc_id, poss,
    bucket) for one corpus field, bucket-partitioned parquet so term
    lookups partition-prune to 1 of N_POS_BUCKETS dirs.

    For the primary content field this IS the committed segment's
    positions table (store.segment_index — build.write_index writes it,
    load_index reads it; r05 brief item 4 removed the former tempdir
    twin). Derived fields (title) still materialize a standalone
    positions-only store once per (sf_dir, field)."""
    if field == "content":
        from . import store

        idx = store.segment_index(spark, sf_dir)
        assert idx.n_buckets == N_POS_BUCKETS, \
            "segment bucket layout must match pos_bucket_of pruning"
        return idx.positions
    key = (sf_dir.rstrip("/"), field)
    if key not in _POS_STORE:
        d = tbl(spark, sf_dir, "documents")
        flat = d.select(
            "doc_id",
            F.posexplode(analysis.tokens_expr(_FIELD_COLS[field]()))
            .alias("pos", "term"))
        path = tempfile.mkdtemp(prefix="pysearch_positions_")
        (build.positions_frame(flat, N_POS_BUCKETS)
         .write.mode("overwrite").partitionBy("bucket").parquet(path))
        _POS_STORE[key] = (path, spark.read.parquet(path))
    path, df = _POS_STORE[key]
    # r04 advice: the cached handle is bound to the session that created
    # it; if that session was stopped and a new one created in the same
    # process, re-open the (still valid) parquet store on the live session
    if df.sparkSession is not spark:
        df = spark.read.parquet(path)
        _POS_STORE[key] = (path, df)
    return df


def positions(spark: SparkSession, sf_dir: str,
              field: str = "content") -> DataFrame:
    """(doc_id, pos, term) — flat view of the positional index, for
    consumers that need unrestricted positions (e.g. suggest_phrase's
    bigram LM). Scans the persisted store, not the corpus."""
    return positions_table(spark, sf_dir, field).select(
        "doc_id", F.explode("poss").alias("pos"), "term")


def term_positions(spark: SparkSession, sf_dir: str, term: str,
                   field: str = "content") -> DataFrame:
    """(doc_id, pos) occurrences of one term — bucket partition-pruned
    scan (1 of N_POS_BUCKETS dirs) + term predicate pushdown."""
    t = positions_table(spark, sf_dir, field)
    b = build.pos_bucket_of(term, N_POS_BUCKETS)
    return (t.where((F.col("bucket") == b) & (F.col("term") == term))
            .select("doc_id", F.explode("poss").alias("pos")))


_POS_CTE = f"""
pos AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[CAST(i AS INT)] AS term
  FROM (SELECT doc_id, {analysis.duckdb_tokens_nostop_expr('text')} AS t
        FROM documents),
       unnest(range(1, len(t) + 1)) AS u(i)
)"""


def term_doc_positions(spark: SparkSession, sf_dir: str, term: str,
                       field: str = "content") -> DataFrame:
    """(doc_id, poss) — one ARRAY row per doc for one term, bucket
    partition-pruned (the un-exploded sibling of term_positions)."""
    t = positions_table(spark, sf_dir, field)
    b = build.pos_bucket_of(term, N_POS_BUCKETS)
    return (t.where((F.col("bucket") == b) & (F.col("term") == term))
            .select("doc_id", "poss"))


# Below this many (term, doc) rows across both phrase legs, the bucket-
# pruned position rows are gathered to the DRIVER in ONE narrow scan job
# and intersected in-process — the same ES coordinator-gather shape (and
# cap discipline) as exec.LOCAL_MAX_POSTINGS: a selective phrase is a
# single Spark job instead of a scan+scan+join pipeline (3-4 stages).
# The cap is probed with a narrow count() on the pruned scan itself
# (bucket PartitionFilter + term PushedFilter reach the parquet reader,
# so the count touches 2 of 16 dirs; ~0.15 s warm) followed by the
# parallel collect — NOT with limit(cap).collect(), whose CollectLimit
# executes as executeTake's incremental partition waves (measured 3.5 s
# where count+collect takes 0.3–0.6 s), and NOT via the main index's
# terms dictionary, which a phrase-only workload would have to build
# first. Hot phrases fall back to the distributed join below.
LOCAL_MAX_PAIR_ROWS = 200_000


def _pair_count(p0, p1, slop: int) -> int:
    """Per-doc phrase frequency from two position lists — the Python
    mirror of the array expressions in the distributed plan."""
    if slop == 0:
        s1 = set(p1)
        return sum(1 for x in p0 if x + 1 in s1)
    return sum(1 for x in p0 for y in p1 if x + 1 <= y <= x + 1 + slop)


def _pair_rows_pandas(spark: SparkSession, sf_dir: str, t0: str, t1: str):
    """Coordinator pyarrow read of the two phrase legs' pruned position
    bucket dirs — ZERO Spark jobs (the phrase sibling of
    exec._local_blocks_pandas; r05). The cap is probed first with
    pyarrow's count_rows under the same term filter (narrow: reads only
    the filter column's row groups), mirroring the narrow-count probe
    discipline of the Spark gather below. Returns None when the store is
    not disk-backed (caller uses the Spark probe+gather), False when the
    pair is hot (caller uses the distributed join), else a pandas frame
    of (term, doc_id, poss) rows."""
    import glob
    import os

    from . import store

    idx = store.segment_index(spark, sf_dir)
    path = getattr(idx, "disk_path", None)
    if path is None or idx.positions is None:
        return None
    import pandas as pd
    import pyarrow.dataset as ds

    buckets = sorted({build.pos_bucket_of(t, N_POS_BUCKETS)
                      for t in (t0, t1)})
    files = sorted(
        f for b in buckets
        for f in glob.glob(os.path.join(path, "positions",
                                        f"bucket={b}", "*.parquet")))
    if not files:
        return pd.DataFrame(columns=["term", "doc_id", "poss"])
    dataset = ds.dataset(files, format="parquet")
    flt = ds.field("term").isin([t0, t1])
    if dataset.count_rows(filter=flt) > LOCAL_MAX_PAIR_ROWS:
        return False
    return dataset.to_table(columns=["term", "doc_id", "poss"],
                            filter=flt).to_pandas()


def _pair_scan(spark: SparkSession, sf_dir: str,
               t0: str, t1: str) -> DataFrame:
    """Bucket+term-pruned scan of BOTH phrase legs' (term, doc_id, poss)
    rows — the single narrow job the local gather path collects."""
    pt = positions_table(spark, sf_dir)
    buckets = sorted({build.pos_bucket_of(t, N_POS_BUCKETS)
                      for t in (t0, t1)})
    return (pt.where(F.col("bucket").isin(buckets)
                     & F.col("term").isin(t0, t1))
            .select("term", "doc_id", "poss"))


def _phrase_pair_join(spark: SparkSession, sf_dir: str,
                      t0: str, t1: str, slop: int) -> DataFrame:
    """Distributed fallback: the two terms' array rows join on doc_id
    (both sides bucket-pruned, the smaller broadcast by AQE); pair count
    is pure array arithmetic — no explode, no occurrence-grain shuffle."""
    a = term_doc_positions(spark, sf_dir, t0) \
        .withColumnRenamed("poss", "poss0")
    b = term_doc_positions(spark, sf_dir, t1) \
        .withColumnRenamed("poss", "poss1")
    j = a.join(b, "doc_id")
    if slop == 0:
        n = F.size(F.array_intersect(
            F.transform("poss0", lambda x: x + 1), F.col("poss1")))
    else:
        n = F.aggregate(
            "poss0", F.lit(0),
            lambda acc, x: acc + F.size(F.filter(
                "poss1",
                lambda y: (y >= x + 1) & (y <= x + 1 + slop))))
    return (j.select("doc_id", n.cast("long").alias("n_occurrences"))
            .where(F.col("n_occurrences") > 0)
            .orderBy("doc_id"))


def _phrase_pair(t0: str, t1: str, slop: int):
    """Query for a 2-term phrase with the given slop.

    slop=0 → exact adjacency (pos1 == pos0+1); slop>0 → Lucene-sloppy-ish:
    t1 within (pos0+1 .. pos0+1+slop), order preserved.

    Physical strategies (selected by a limit-probe on the pruned scan):
      local — ONE job collects both terms' (doc_id, poss) array rows
              (bucket+term pruned) to the driver; the per-doc position
              intersection runs in-process. ES's coordinator gather for
              selective phrases.
      join  — the two terms' array rows join on doc_id (both sides
              bucket-pruned, the smaller broadcast by AQE) and the pair
              count is pure array arithmetic — ExactPhraseMatcher's
              per-doc position-list intersection with NO explode and no
              occurrence-grain shuffle. Counts match the relational pair
              join exactly: positions are distinct within a doc, so
              array_intersect(poss0+1, poss1) enumerates the adjacency
              pairs (slop=0), and the aggregate-over-filter counts
              banded pairs."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        pdf = _pair_rows_pandas(spark, sf_dir, t0, t1)
        if pdf is False:                       # probed hot: distributed join
            return _phrase_pair_join(spark, sf_dir, t0, t1, slop)
        if pdf is not None:                    # coordinator pyarrow read
            rows = [(r.term, int(r.doc_id), list(r.poss))
                    for r in pdf.itertuples(index=False)]
        else:                                  # tempdir store: Spark gather
            scan = _pair_scan(spark, sf_dir, t0, t1)
            if scan.count() > LOCAL_MAX_PAIR_ROWS:
                return _phrase_pair_join(spark, sf_dir, t0, t1, slop)
            rows = [(r["term"], r["doc_id"], r["poss"])
                    for r in scan.collect()]
        first = {doc: poss for term, doc, poss in rows if term == t0}
        out = sorted(
            (doc, n)
            for term, doc, poss in rows if term == t1
            and (p0 := first.get(doc)) is not None
            and (n := _pair_count(p0, poss, slop)) > 0)
        # already sorted; createDataFrame preserves local row order —
        # an orderBy here would shuffle k rows across 32 partitions
        # (measured ~0.8 s of pure overhead on a 1-row relation)
        return spark.createDataFrame(
            out, "doc_id long, n_occurrences long")
    return run


def _phrase_pair_sql(t0: str, t1: str, slop: int) -> str:
    return f"""
WITH {_POS_CTE}
SELECT a.doc_id, count(*) AS n_occurrences
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id
 AND b.pos BETWEEN a.pos + 1 AND a.pos + 1 + {slop}
WHERE a.term = '{t0}' AND b.term = '{t1}'
GROUP BY a.doc_id ORDER BY a.doc_id"""


def _phrase_prefix(t0: str, prefix: str):
    """match_phrase_prefix (MatchPhrasePrefixQueryBuilder.java): the last
    position holds a PREFIX match over the terms dictionary — the
    search-as-you-type query. Expressed as the positional pair join with
    startswith on the trailing leg (the prefix leg spans buckets — a
    prefix does not determine the term hash — so it scans the positions
    table with the startswith pushed to parquet, like Lucene's
    terms-dict-wide prefix expansion)."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        a = term_positions(spark, sf_dir, t0).alias("a")
        b = (positions_table(spark, sf_dir)
             .where(F.col("term").startswith(prefix))
             .select("doc_id", F.explode("poss").alias("pos")).alias("b"))
        return (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                       & (F.col("b.pos") == F.col("a.pos") + 1))
                .groupBy(F.col("a.doc_id").alias("doc_id"))
                .agg(F.count("*").alias("n_occurrences"))
                .orderBy("doc_id"))
    return run


def _phrase_prefix_sql(t0: str, prefix: str) -> str:
    return f"""
WITH {_POS_CTE}
SELECT a.doc_id, count(*) AS n_occurrences
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = '{t0}' AND b.term LIKE '{prefix}%'
GROUP BY a.doc_id ORDER BY a.doc_id"""


REGISTRY["q_phrase_prefix"] = Entry(
    fn=_phrase_prefix("merge", "so"),
    sql=_phrase_prefix_sql("merge", "so"))


# ---------------------------------------------------------------------------
# multi_match type=phrase — MatchPhraseQuery per field, dis_max combine
# (MultiMatchQueryBuilder Type PHRASE). Lucene scores a phrase like a term
# with tf = phrase frequency and idf = Σ idf(member term), per field with
# that field's own dl/avgdl statistics.
# ---------------------------------------------------------------------------

_MMP_FIELDS = {  # field name -> DuckDB text expression (Spark: _FIELD_COLS)
    "content": "text",
    "title": "substr(text, 1, 80)",
}
_MMP_BOOSTS = {"title": 2.0}
_MMP_TB = 0.3


def _mm_phrase(t0: str, t1: str, k: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import math

        from . import codec

        d = tbl(spark, sf_dir, "documents")
        k1, b = analysis.K1, analysis.B
        # n counts ALL docs (zero-token docs included) — shared by fields
        n = float(d.count())
        per_field = []
        for fname in _MMP_FIELDS:
            w = float(_MMP_BOOSTS.get(fname, 1.0))
            pt = positions_table(spark, sf_dir, fname)
            # ONE stats job per field over the (term, doc)-grain positional
            # index: sum_dl (avgdl numerator) + both member-term dfs (a
            # (term, doc) row count IS the df) — no corpus re-tokenize.
            st = pt.agg(
                F.coalesce(F.sum(F.size("poss")), F.lit(0)).alias("sum_dl"),
                F.count(F.when(F.col("term") == t0, 1)).alias("df0"),
                F.count(F.when(F.col("term") == t1, 1)).alias("df1"),
            ).collect()[0]
            avgdl = float(st["sum_dl"]) / n
            dfs = {t0: float(st["df0"]), t1: float(st["df1"])}
            if dfs[t0] == 0 or dfs[t1] == 0:
                continue  # phrase cannot match in this field
            idf_sum = sum(
                math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                for t in (t0, t1))
            a = term_positions(spark, sf_dir, t0, field=fname).alias("a")
            bb = term_positions(spark, sf_dir, t1, field=fname).alias("b")
            ptf = (a.join(bb, (F.col("a.doc_id") == F.col("b.doc_id"))
                          & (F.col("b.pos") == F.col("a.pos") + 1))
                   .groupBy(F.col("a.doc_id").alias("doc_id"))
                   .agg(F.count("*").cast("double").alias("ptf")))
            # per-doc field length from the positional index (inner join:
            # only phrase-matching docs need dl, and those have tokens)
            dl = (pt.groupBy("doc_id")
                  .agg(F.sum(F.size("poss")).cast("long").alias("dl")))
            dlq = F.expr(codec.spark_dlq_sql("dl")).cast("double")
            scored = (ptf.join(dl, "doc_id")
                      .select("doc_id",
                              (F.lit(idf_sum * w) * F.col("ptf")
                               / (F.col("ptf") + k1 * (1.0 - b + b * dlq / avgdl))
                               ).alias("fscore")))
            per_field.append(scored)
        if not per_field:
            return spark.createDataFrame([], "doc_id long, score double")
        u = per_field[0]
        for rel in per_field[1:]:
            u = u.unionByName(rel)
        agg = u.groupBy("doc_id").agg(
            F.max("fscore").alias("mx"), F.sum("fscore").alias("sm"))
        score = F.col("mx") + _MMP_TB * (F.col("sm") - F.col("mx"))
        topk = (agg.select("doc_id", score.alias("score_raw"))
                .orderBy(F.desc("score_raw"), F.asc("doc_id")).limit(k))
        return topk.select("doc_id", F.round("score_raw", 4).alias("score"))
    return run


def _mm_phrase_sql(t0: str, t1: str, k: int) -> str:
    from . import codec, oracle_sql as osql

    k1, b = analysis.K1, analysis.B
    frags, branches = [], []
    for i, (fname, fexpr) in enumerate(_MMP_FIELDS.items()):
        p = f"f{i}_"
        w = float(_MMP_BOOSTS.get(fname, 1.0))
        dlq = codec.duckdb_dlq_expr(f"{p}dl.dl")
        frags.append(f"""{osql.corpus_ctes('documents', fexpr, p)},
{p}pos AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[CAST(i AS INT)] AS term
  FROM (SELECT doc_id, {analysis.duckdb_tokens_nostop_expr(fexpr)} AS t
        FROM documents),
       unnest(range(1, len(t) + 1)) AS u(i)
),
{p}df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM {p}pos WHERE term IN ('{t0}', '{t1}') GROUP BY term
),
{p}idf AS (
  SELECT sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS idf_sum,
         count(*) AS n_terms
  FROM {p}df d CROSS JOIN {p}stats s
),
{p}ptf AS (
  SELECT a.doc_id, count(*)::DOUBLE AS ptf
  FROM {p}pos a JOIN {p}pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{t0}' AND b.term = '{t1}'
  GROUP BY a.doc_id
)""")
        branches.append(f"""
  SELECT p.doc_id,
         i.idf_sum * {w} * p.ptf
           / (p.ptf + {k1} * (1 - {b} + {b} * {dlq} / s.avgdl)) AS fscore
  FROM {p}ptf p
  JOIN {p}dl ON p.doc_id = {p}dl.doc_id
  CROSS JOIN {p}stats s
  CROSS JOIN {p}idf i
  WHERE i.n_terms = 2""")
    union = "\n  UNION ALL ".join(branches)
    return f"""
WITH {",".join(frags)},
perfield AS ({union}),
agg AS (
  SELECT doc_id, max(fscore) AS mx, sum(fscore) AS sm
  FROM perfield GROUP BY doc_id),
topk AS (
  SELECT doc_id, mx + {_MMP_TB} * (sm - mx) AS score_raw FROM agg
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {osql.ROUND_DIGITS}) AS score FROM topk"""


REGISTRY["q_mm_phrase"] = Entry(
    fn=_mm_phrase("merge", "sort", 10),
    sql=_mm_phrase_sql("merge", "sort", 10))

REGISTRY["q_phrase"] = Entry(
    fn=_phrase_pair("merge", "sort", slop=0),
    sql=_phrase_pair_sql("merge", "sort", slop=0))

REGISTRY["q_phrase_slop2"] = Entry(
    fn=_phrase_pair("merge", "sort", slop=2),
    sql=_phrase_pair_sql("merge", "sort", slop=2))

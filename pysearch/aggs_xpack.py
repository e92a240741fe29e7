"""x-pack analytics aggregations — the metric/bucket surface ES ships in
the analytics plugin, re-expressed as single-pass Catalyst plans.

Reference anchors (upstream ES tree; checkout empty, grep-able paths):
  * string_stats — x-pack analytics StringStatsAggregationBuilder:
    count/min_length/max_length/avg_length + Shannon entropy over the
    character distribution of all values. Spark: length stats are one
    map-side-combinable agg; the entropy leg explodes characters (a
    sequence+substring explode — identical arithmetic in DuckDB, whose
    RE2 regexes lack the lookahead split idiom) into a char-frequency
    groupBy. Both legs are 1-row reduces cross-joined at the end.
  * top_metrics — TopMetricsAggregationBuilder: per bucket, the metric
    value at the extreme of a sort field. One window row_number per
    bucket — the shuffle carries (bucket, sort, metric), nothing else;
    ES does the same per-shard top-1 + coordinator merge.
  * boxplot — BoxplotAggregationBuilder: min/q1/q2/q3/max. ES uses
    t-digest; here exact linear-interpolation percentiles (Spark
    `percentile` ≡ DuckDB `quantile_cont`), the same parity choice as
    agg_percentiles.
  * matrix_stats — MatrixStatsAggregationBuilder: pairwise sample
    covariance / Pearson correlation across numeric fields, one
    single-pass agg row (Spark covar_samp/corr are map-side combinable
    moment sketches — the distributed formulation ES implements by
    merging per-shard moment matrices).
  * t_test — TTestAggregationBuilder (unpaired heteroscedastic):
    Welch's t over two filtered populations, computed from
    avg/var_samp/count of each side in ONE pass (conditional aggregates,
    no self-join).
  * rate — RateAggregationBuilder: per date_histogram bucket, the metric
    normalized to a unit interval (here per-day within month buckets).
  * diversified_sampler — DiversifiedAggregationBuilder: sample capped
    at max_docs_per_value per diversity key, then aggregate. ES keeps a
    per-key de-duplicating collector per shard; the deterministic
    relational formulation is a row_number window over the diversity
    key (shuffle keyed by user — the same key the collector dedups on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


# ---------------------------------------------------------------------------
# string_stats
# ---------------------------------------------------------------------------

@_reg("agg_string_stats", """
WITH lens AS (
  SELECT CAST(count(*) AS BIGINT) AS cnt,
         CAST(min(len(source)) AS BIGINT) AS min_len,
         CAST(max(len(source)) AS BIGINT) AS max_len,
         round(avg(len(source)), 4) AS avg_len
  FROM documents),
chars AS (
  SELECT substr(source, CAST(i AS INT), 1) AS ch
  FROM documents, unnest(range(1, len(source) + 1)) AS u(i)),
freq AS (SELECT ch, count(*)::DOUBLE AS c FROM chars GROUP BY ch),
ent AS (
  SELECT round(-sum((c / t) * log2(c / t)), 4) AS entropy
  FROM freq, (SELECT sum(c) AS t FROM freq))
SELECT cnt, min_len, max_len, avg_len, entropy FROM lens, ent""")
def agg_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_stats over documents.source: length stats + Shannon entropy
    of the character distribution (x-pack StringStatsAggregationBuilder).
    Two 1-row reduces (lengths; char-frequency entropy) cross-joined —
    the entropy explode is (rows × avg_len) narrow chars, shuffled only
    at char-key grain (≤ |alphabet| groups)."""
    d = tbl(spark, sf_dir, "documents")
    lens = d.agg(
        F.count("*").alias("cnt"),
        F.min(F.length("source")).cast("long").alias("min_len"),
        F.max(F.length("source")).cast("long").alias("max_len"),
        F.round(F.avg(F.length("source")), 4).alias("avg_len"))
    chars = (d.select(F.explode(F.sequence(F.lit(1), F.length("source")))
                      .alias("i"), "source")
             .select(F.expr("substring(source, i, 1)").alias("ch")))
    freq = chars.groupBy("ch").agg(F.count("*").cast("double").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    ent = (freq.crossJoin(F.broadcast(total))
           .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("entropy")))
    return lens.crossJoin(ent)


# ---------------------------------------------------------------------------
# top_metrics
# ---------------------------------------------------------------------------

@_reg("agg_top_metrics", """
SELECT event_type, round(value, 4) AS top_value
FROM (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1 ORDER BY event_type""")
def agg_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top_metrics: per event_type bucket, the `value` at the latest ts
    (event_id tie-break). One row_number window per bucket — per-shard
    top-1 + merge, the TopMetricsAggregator shape."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("ts"), F.desc("event_id"))
    return (ev.select("event_type", "value", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
            .select("event_type", F.round("value", 4).alias("top_value"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# boxplot
# ---------------------------------------------------------------------------

@_reg("agg_boxplot", """
SELECT l_returnflag,
       round(min(l_extendedprice), 4) AS lo,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS q1,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS q2,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS q3,
       round(max(l_extendedprice), 4) AS hi
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
def agg_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """boxplot per l_returnflag: min/q1/q2/q3/max. Exact interpolated
    percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`); ES's
    t-digest twin trades this exactness for mergeable sketches."""
    li = tbl(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag").agg(
        F.round(F.min("l_extendedprice"), 4).alias("lo"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("q2"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("q3"),
        F.round(F.max("l_extendedprice"), 4).alias("hi"))
        .orderBy("l_returnflag"))


# ---------------------------------------------------------------------------
# matrix_stats
# ---------------------------------------------------------------------------

@_reg("agg_matrix_stats", """
SELECT CAST(count(*) AS BIGINT) AS n,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
       round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
       round(covar_samp(l_extendedprice, l_discount), 4) AS cov_price_disc,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
       round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc
FROM lineitem""")
def agg_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix_stats over (l_quantity, l_extendedprice, l_discount):
    pairwise sample covariance + Pearson correlation in one agg row —
    map-side-combinable moment accumulators, the per-shard
    moment-matrix merge MatrixStatsAggregator performs."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4)
        .alias("cov_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6)
        .alias("cov_qty_disc"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4)
        .alias("cov_price_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6)
        .alias("corr_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6)
        .alias("corr_qty_disc"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6)
        .alias("corr_price_disc"))


# ---------------------------------------------------------------------------
# t_test (Welch, unpaired heteroscedastic)
# ---------------------------------------------------------------------------

TT_A, TT_B = "click", "view"


@_reg("agg_t_test", f"""
WITH s AS (
  SELECT avg(value) FILTER (WHERE event_type = '{TT_A}') AS m1,
         var_samp(value) FILTER (WHERE event_type = '{TT_A}') AS v1,
         count(*) FILTER (WHERE event_type = '{TT_A}') AS n1,
         avg(value) FILTER (WHERE event_type = '{TT_B}') AS m2,
         var_samp(value) FILTER (WHERE event_type = '{TT_B}') AS v2,
         count(*) FILTER (WHERE event_type = '{TT_B}') AS n2
  FROM events WHERE event_type IN ('{TT_A}', '{TT_B}'))
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat
FROM s""")
def agg_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t_test (x-pack TTestAggregationBuilder, heteroscedastic/Welch):
    t = (m1−m2)/√(v1/n1 + v2/n2) between the click and view
    populations — conditional aggregates in ONE pass over the filtered
    scan, no self-join, map-side combinable."""
    ev = tbl(spark, sf_dir, "events").where(
        F.col("event_type").isin(TT_A, TT_B))
    a = F.col("event_type") == TT_A
    b = F.col("event_type") == TT_B
    s = ev.agg(
        F.avg(F.when(a, F.col("value"))).alias("m1"),
        F.var_samp(F.when(a, F.col("value"))).alias("v1"),
        F.count(F.when(a, F.lit(1))).alias("n1"),
        F.avg(F.when(b, F.col("value"))).alias("m2"),
        F.var_samp(F.when(b, F.col("value"))).alias("v2"),
        F.count(F.when(b, F.lit(1))).alias("n2"))
    t = (F.col("m1") - F.col("m2")) / F.sqrt(
        F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2"))
    return s.select(F.col("n1").cast("long").alias("n1"),
                    F.col("n2").cast("long").alias("n2"),
                    F.round(t, 4).alias("t_stat"))


# ---------------------------------------------------------------------------
# rate
# ---------------------------------------------------------------------------

@_reg("agg_rate", """
SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
       round(sum(value)
             / date_part('day', date_trunc('month', ts) + INTERVAL 1 MONTH
                                - INTERVAL 1 DAY), 4) AS per_day
FROM events GROUP BY month,
     date_part('day', date_trunc('month', ts) + INTERVAL 1 MONTH
                      - INTERVAL 1 DAY)
ORDER BY month""")
def agg_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate (x-pack RateAggregationBuilder): per month bucket, sum(value)
    normalized to a per-day rate (divided by the bucket's calendar
    length) — the bucket id and divisor are both computed map-side."""
    ev = tbl(spark, sf_dir, "events")
    month = F.date_format("ts", "yyyy-MM").alias("month")
    days = F.dayofmonth(F.last_day("ts"))
    return (ev.groupBy(month, days.alias("days"))
            .agg(F.sum("value").alias("total"))
            .select("month",
                    F.round(F.col("total") / F.col("days"), 4)
                    .alias("per_day"))
            .orderBy("month"))


# ---------------------------------------------------------------------------
# diversified_sampler
# ---------------------------------------------------------------------------

DIV_MAX_PER_KEY = 2


@_reg("agg_diversified_sampler", f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events)
WHERE rn <= {DIV_MAX_PER_KEY}
GROUP BY event_type ORDER BY event_type""")
def agg_diversified_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diversified_sampler (DiversifiedAggregationBuilder): cap the
    sample at max_docs_per_value per diversity key (user_id, first
    {DIV_MAX_PER_KEY} by time) before aggregating — deterministic
    row_number over the diversity key instead of ES's per-shard
    de-duplicating collector; the shuffle is keyed exactly by the
    diversity field either way."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (ev.select("event_type", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") <= DIV_MAX_PER_KEY)
            .groupBy("event_type").agg(F.count("*").alias("cnt"))
            .orderBy("event_type"))

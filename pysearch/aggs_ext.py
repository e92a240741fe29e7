"""Aggregation-surface extensions — multi_terms, date_range, and the two
pipeline aggs the r02 coverage pass left out.

Reference anchors (upstream ES tree; checkout empty, grep-able paths):
  * multi_terms — aggregations/bucket/terms/MultiTermsAggregationBuilder
    (x-pack analytics): buckets keyed by a TUPLE of fields, ranked by
    doc count. Spark: one groupBy over the composite key — identical
    shuffle shape to single-field terms, no cross-product.
  * date_range — aggregations/bucket/range/DateRangeAggregationBuilder:
    explicit half-open [from, to) timestamp buckets. Spark: a CASE
    column then groupBy — the bucket id is computed map-side, so the
    shuffle carries one small label key per row.
  * percentiles_bucket — pipeline/PercentilesBucketPipelineAggregator:
    percentiles OVER the per-bucket metric values (sibling pipeline).
    Like every pipeline agg here it runs on the ~|buckets| rows AFTER
    the main reduce — ES does the same on the coordinator.
  * cumulative_cardinality — pipeline/CumulativeCardinalityPipelineAggregator
    (x-pack analytics): running count of DISTINCT users per day bucket.
    A naive window-count(distinct) is unsupported/expensive in both
    engines; the exact distributed formulation is first-touch
    attribution (min(day) per user → new users per day → cumulative
    sum), which is one extra user-keyed aggregation — map-side
    combinable, no per-day state explosion at 100 TB.
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


@_reg("agg_multi_terms", """
SELECT event_type, CAST(user_id % 7 AS BIGINT) AS cohort,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY event_type, cohort
ORDER BY cnt DESC, event_type ASC, cohort ASC LIMIT 10""")
def agg_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_terms: buckets keyed by (event_type, user cohort) tuple,
    top 10 by doc count with full key tie-break."""
    ev = tbl(spark, sf_dir, "events")
    return (ev.groupBy("event_type",
                       (F.col("user_id") % 7).cast("long").alias("cohort"))
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("event_type"), F.asc("cohort"))
            .limit(10))


_DR_EDGES = ("2024-01-10", "2024-01-20")


@_reg("agg_date_range", f"""
SELECT CASE WHEN ts < TIMESTAMP '{_DR_EDGES[0]}' THEN '*-{_DR_EDGES[0]}'
            WHEN ts < TIMESTAMP '{_DR_EDGES[1]}'
                 THEN '{_DR_EDGES[0]}-{_DR_EDGES[1]}'
            ELSE '{_DR_EDGES[1]}-*' END AS bucket,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(value), 3) AS sum_value
FROM events GROUP BY bucket ORDER BY bucket""")
def agg_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_range: three half-open [from, to) buckets with a sub-metric
    (count + sum(value)) per bucket."""
    ev = tbl(spark, sf_dir, "events")
    lo, hi = (F.to_timestamp(F.lit(e)) for e in _DR_EDGES)
    bucket = (F.when(F.col("ts") < lo, f"*-{_DR_EDGES[0]}")
              .when(F.col("ts") < hi, f"{_DR_EDGES[0]}-{_DR_EDGES[1]}")
              .otherwise(f"{_DR_EDGES[1]}-*"))
    return (ev.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 3).alias("sum_value"))
            .orderBy("bucket"))


_DAILY_SQL = """
daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt FROM events
  GROUP BY day
)"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (tbl(spark, sf_dir, "events")
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("cnt")))


@_reg("pipe_percentiles_bucket", f"""
WITH {_DAILY_SQL}
SELECT round(quantile_cont(cnt, 0.25), 6) AS p25,
       round(quantile_cont(cnt, 0.50), 6) AS p50,
       round(quantile_cont(cnt, 0.75), 6) AS p75
FROM daily""")
def pipe_percentiles_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentiles_bucket: exact linear-interpolated percentiles over the
    per-day doc-count metric (runs on ~30 post-reduce rows)."""
    pcts = F.percentile("cnt", F.lit([0.25, 0.50, 0.75]))
    return (_daily(spark, sf_dir)
            .agg(pcts.alias("p"))
            .select(F.round(F.col("p")[0], 6).alias("p25"),
                    F.round(F.col("p")[1], 6).alias("p50"),
                    F.round(F.col("p")[2], 6).alias("p75")))


@_reg("pipe_cumulative_cardinality", """
WITH first_touch AS (
  SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
  FROM events GROUP BY user_id),
newu AS (SELECT day, count(*) AS new_users FROM first_touch GROUP BY day),
days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events)
SELECT d.day, CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM days d LEFT JOIN newu n ON d.day = n.day ORDER BY d.day""")
def pipe_cumulative_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cumulative_cardinality: running distinct-user count per day via
    exact first-touch attribution (min(day) per user), so the distinct
    state is a single user-keyed aggregation instead of a re-scan per
    bucket. The unpartitioned window runs over ~|days| post-reduce rows."""
    ev = tbl(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    newu = (ev.groupBy("user_id").agg(F.min(day).alias("day"))
            .groupBy("day").agg(F.count("*").alias("new_users")))
    days = ev.select(day.alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (days.join(newu, "day", "left")
            .select("day",
                    F.coalesce("new_users", F.lit(0)).cast("long")
                    .alias("new_users"))
            .withColumn("cum_users", F.sum("new_users").over(w).cast("long"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# auto_date_histogram — coordinator-chosen interval from a fixed ladder
# ---------------------------------------------------------------------------

_ADH_TARGET = 10
_ADH_LADDER = (60, 300, 1800, 3600, 10800, 43200, 86400, 604800, 2592000)


def _adh_sql() -> str:
    # the CASE mirrors _ADH_LADDER exactly: smallest interval whose
    # estimated bucket count (epoch-floored) fits the target
    cases = "\n".join(
        f"    WHEN mx // {i} - mn // {i} + 1 <= {_ADH_TARGET} THEN {i}"
        for i in _ADH_LADDER)
    return f"""
WITH mm AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS mn,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS mx FROM events),
sel AS (SELECT CASE\n{cases}
    ELSE {_ADH_LADDER[-1]} END AS ival FROM mm)
SELECT CAST(floor(epoch(ts)) AS BIGINT) // ival * ival AS bucket_epoch,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(ival AS BIGINT) AS interval_sec
FROM events, sel GROUP BY bucket_epoch, ival ORDER BY bucket_epoch"""


@_reg("agg_auto_date_histogram", _adh_sql())
def agg_auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auto_date_histogram (bucket/histogram/
    AutoDateHistogramAggregationBuilder): the caller gives a target bucket
    COUNT, not an interval; the engine picks the smallest interval from a
    fixed ladder whose bucket count fits. ES chooses on the coordinator
    while reducing shard results — here the same 1-row min/max reduce is
    collected to the driver and the ladder walk is plain Python; the
    bucketing itself stays distributed (map-side epoch-floor key, one
    groupBy shuffle on ~target keys)."""
    ev = tbl(spark, sf_dir, "events")
    mm = ev.agg(F.min(F.unix_timestamp("ts")).alias("mn"),
                F.max(F.unix_timestamp("ts")).alias("mx")).collect()[0]
    ival = next((i for i in _ADH_LADDER
                 if mm["mx"] // i - mm["mn"] // i + 1 <= _ADH_TARGET),
                _ADH_LADDER[-1])
    bucket = (F.unix_timestamp("ts") / ival).cast("long") * ival
    return (ev.groupBy(bucket.alias("bucket_epoch"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("interval_sec", F.lit(ival).cast("long"))
            .orderBy("bucket_epoch"))

"""EQL (Event Query Language), transforms and rollup — the x-pack
event-analytics surface over the `events` table.

Reference anchors (upstream ES tree; checkout empty, grep-able paths):
  * EQL sequence — x-pack/plugin/eql `SequenceMatcher.java` /
    `TumblingWindow.java`: `sequence by <key> with maxspan=<t>
    [stage1] [stage2]` joins consecutive-stage events per key within a
    time span. ES matches a stage-2 event against the MOST RECENT
    pending stage-1 event for the key; the relational mirror is an
    as-of join — for each stage-2 event, the latest stage-1 event of
    the same key strictly before it and within maxspan.
  * EQL until — `SequenceMatcher.java#until`: an `until` event expires
    pending stage-1 state, so a pair only matches when no until-event
    intervenes between the two stages.
  * EQL head — `LimitWithOffset` pipe: `any where <cond> | head N`.
  * transforms — x-pack/plugin/transform `TransformIndexer.java`:
    `latest` (newest doc per unique key) and `pivot` (entity-centric
    aggregate snapshot) materializations.
  * rollup — x-pack/plugin/rollup `RollupIndexer.java` +
    `RollupResponseTranslator.java`: metrics are pre-aggregated at a
    (date_histogram, terms) grain as (sum, count) pairs and queries are
    answered FROM the rollup index by re-aggregating the partials —
    avg = Σsum / Σcount. The `rollup_query_equiv` key proves the
    translation: the engine answers from its rollup materialization,
    the oracle from the raw events.

Spark shapes (and why they hold at 10^12 rows):
  * sequence/until are ONE window pass per key — `last(..., ignorenulls)`
    over (user, ts)-ordered rows. No self-join, no time-band blowup:
    a single hash-partition shuffle on the sequence key, then a sorted
    scan per partition. This is the as-of-join formulation; an
    equi-join + band filter would shuffle the same data AND materialize
    every in-band pair.
  * latest/pivot are a row_number window / one groupBy — both map-side
    combinable.
  * the rollup materialization is a groupBy at (day, type) grain —
    ~1e4 grain rows per year regardless of raw row count — and queries
    against it never touch raw events.
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


# sequence by user_id with maxspan=4h [event_type=view] [event_type=purchase]
_SEQ_FIRST, _SEQ_SECOND, _SEQ_UNTIL = "view", "purchase", "error"
_SEQ_SPAN_S = 4 * 3600

#: latest preceding stage-1 (and until-) event per key — the shared
#: window formulation (both engines): order by (ts, event_id), frame
#: = everything strictly before the current row.
_SEQ_CTE = f"""
w AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type = '{_SEQ_FIRST}' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pv_ts,
         last_value(CASE WHEN event_type = '{_SEQ_FIRST}' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pv_id,
         last_value(CASE WHEN event_type = '{_SEQ_UNTIL}' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pe_ts
  FROM events)"""


def _seq_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of _SEQ_CTE: one hash shuffle on user_id, one sorted
    window pass. last(ignorenulls) over the same ordering picks the
    SAME row for both the ts and event_id projections."""
    e = tbl(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_first = F.col("event_type") == _SEQ_FIRST
    is_until = F.col("event_type") == _SEQ_UNTIL
    return e.select(
        "user_id", "event_id", "ts", "event_type",
        F.last(F.when(is_first, F.col("ts")), ignorenulls=True)
         .over(w).alias("pv_ts"),
        F.last(F.when(is_first, F.col("event_id")), ignorenulls=True)
         .over(w).alias("pv_id"),
        F.last(F.when(is_until, F.col("ts")), ignorenulls=True)
         .over(w).alias("pe_ts"))


def _seq_select(until: bool) -> tuple:
    """Shared post-window predicate + projection (Spark columns)."""
    cond = ((F.col("event_type") == _SEQ_SECOND)
            & F.col("pv_ts").isNotNull()
            & (F.col("pv_ts") >= F.col("ts") - F.expr(
                f"INTERVAL {_SEQ_SPAN_S} SECONDS")))
    if until:
        cond = cond & (F.col("pe_ts").isNull()
                       | (F.col("pe_ts") <= F.col("pv_ts")))
    # (ts - pv_ts) is a day-time interval — scale to micros BEFORE the
    # bigint cast (which truncates to whole units): exact integer micros,
    # no timezone interpretation of the NTZ timestamps, no float format
    gap = ((F.col("ts") - F.col("pv_ts")) * 1000000).cast("bigint")
    return cond, gap


def _seq_sql(until: bool) -> str:
    extra = ("AND (pe_ts IS NULL OR pe_ts <= pv_ts)" if until else "")
    return f"""
WITH {_SEQ_CTE}
SELECT user_id, pv_id AS first_id, event_id AS second_id,
       epoch_us(ts) - epoch_us(pv_ts) AS gap_us
FROM w
WHERE event_type = '{_SEQ_SECOND}' AND pv_ts IS NOT NULL
  AND pv_ts >= ts - INTERVAL {_SEQ_SPAN_S} SECONDS {extra}
QUALIFY row_number() OVER (PARTITION BY user_id, pv_id
                           ORDER BY ts, event_id) = 1
ORDER BY second_id"""


def _consume_first(matched: DataFrame) -> DataFrame:
    """SequenceMatcher's CONSUMING semantics (r04 advice): completing a
    sequence consumes the pending stage-1 event, so only the FIRST
    in-span stage-2 event pairs with a given stage-1 event — a later
    stage-2 with no fresh stage-1 in between matches nothing. One
    row_number window over MATCH-grain rows (already span-filtered, far
    smaller than the event stream), keyed by the consumed stage-1 id."""
    dw = Window.partitionBy("user_id", "pv_id").orderBy("ts", "event_id")
    return (matched.withColumn("_rn", F.row_number().over(dw))
            .where(F.col("_rn") == 1).drop("_rn"))


@_reg("eql_sequence", _seq_sql(until=False))
def eql_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence by user_id with maxspan=4h [view] [purchase] — as-of
    window join (x-pack eql SequenceMatcher semantics: each stage-2
    event pairs with the key's most recent pending stage-1 event, and
    the completed pair CONSUMES that stage-1 event — _consume_first)."""
    cond, gap = _seq_select(until=False)
    matched = _seq_window(spark, sf_dir).where(cond)
    return (_consume_first(matched)
            .select("user_id", F.col("pv_id").alias("first_id"),
                    F.col("event_id").alias("second_id"),
                    gap.alias("gap_us"))
            .orderBy("second_id"))


@_reg("eql_sequence_until", _seq_sql(until=True))
def eql_sequence_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence … until [error]: an intervening until-event expires the
    pending stage-1 state (pe_ts in (pv_ts, ts) kills the pair);
    completion consumes stage-1 like eql_sequence."""
    cond, gap = _seq_select(until=True)
    matched = _seq_window(spark, sf_dir).where(cond)
    return (_consume_first(matched)
            .select("user_id", F.col("pv_id").alias("first_id"),
                    F.col("event_id").alias("second_id"),
                    gap.alias("gap_us"))
            .orderBy("second_id"))


_HEAD_MIN_VALUE, _HEAD_N = 9.0, 20


@_reg("eql_head", f"""
SELECT event_id, user_id, value
FROM events
WHERE event_type = '{_SEQ_UNTIL}' AND value > {_HEAD_MIN_VALUE}
ORDER BY ts, event_id LIMIT {_HEAD_N}""")
def eql_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`any where event_type == "error" and value > 9 | head 20` —
    EQL's filter + head pipe: stream-ordered filter with an early-out
    limit (TakeOrderedAndProject; no global sort materialized)."""
    e = tbl(spark, sf_dir, "events")
    return (e.where((F.col("event_type") == _SEQ_UNTIL)
                    & (F.col("value") > _HEAD_MIN_VALUE))
            .orderBy("ts", "event_id")
            .limit(_HEAD_N)
            .select("event_id", "user_id", "value"))


@_reg("transform_latest", """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_id, event_type, value
FROM ranked WHERE rn = 1 ORDER BY user_id""")
def transform_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform `latest`: newest event per unique key — row_number
    window, rn=1 (per-partition top-1 then merge; map-side combinable
    at scale via the same partial top-1 ES's composite source does)."""
    e = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    return (e.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type", "value")
            .orderBy("user_id"))


@_reg("transform_pivot", """
SELECT user_id,
       count(*) AS n_events,
       count(*) FILTER (WHERE event_type = 'error') AS n_error,
       round(sum(value), 4) AS sum_value,
       max(ts) AS last_seen
FROM events GROUP BY user_id ORDER BY user_id""")
def transform_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform `pivot`: entity-centric aggregate snapshot per key —
    one hash aggregate, every metric map-side combinable."""
    e = tbl(spark, sf_dir, "events")
    return (e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("ts").alias("last_seen"))
        .orderBy("user_id"))


_ROLL_FROM, _ROLL_TO = "2024-01-05", "2024-01-20"


@_reg("rollup_query_equiv", f"""
SELECT event_type,
       count(*) AS n,
       round(avg(value), 4) AS avg_value
FROM events
WHERE ts >= TIMESTAMP '{_ROLL_FROM}' AND ts < TIMESTAMP '{_ROLL_TO}'
GROUP BY event_type ORDER BY event_type""")
def rollup_query_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup round-trip proof: the engine materializes the rollup grain
    (day, event_type) -> (sum_value, cnt) and answers the query FROM the
    rollup by re-aggregating partials (avg = Σsum/Σcnt — exactly
    RollupResponseTranslator's unrolling); the oracle computes the same
    answer from RAW events. A green row proves the rollup translation
    end-to-end. The range aligns to the day grain, as ES requires
    (rollup queries must land on rollup interval boundaries)."""
    e = tbl(spark, sf_dir, "events")
    rollup = (e.groupBy(F.date_trunc("day", "ts").alias("day"),
                        "event_type")
              .agg(F.sum("value").alias("sum_value"),
                   F.count("*").alias("cnt")))
    return (rollup
            .where((F.col("day") >= F.lit(_ROLL_FROM).cast("timestamp"))
                   & (F.col("day") < F.lit(_ROLL_TO).cast("timestamp")))
            .groupBy("event_type")
            .agg(F.sum("cnt").alias("n"),
                 F.round(F.sum("sum_value") / F.sum("cnt"), 4)
                  .alias("avg_value"))
            .orderBy("event_type"))

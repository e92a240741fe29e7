"""Surface wave 4 — interval filters, IP-range buckets, geo_line,
multi-doc termvectors, the html_strip char filter, and context-filtered
completion.

Reference anchors (upstream ES tree; checkout empty, grep-able paths):
  * intervals not_containing — `IntervalQueryBuilder.java` filter rules
    ([lucene dep] o.a.l.queries.intervals.Intervals#notContaining): keep
    source intervals that do NOT contain an occurrence of the filter
    term strictly inside them.
  * ip_range agg — `bucket/range/IpRangeAggregationBuilder.java`:
    explicit from/to buckets over IPv4 addresses (Lucene stores them as
    sortable bytes; relationally an integer-range CASE). The driver
    tables carry no IPs, so both engines DERIVE a deterministic address
    per user with identical integer arithmetic (same device as geo.py's
    synthetic coordinates).
  * geo_line agg — x-pack spatial `GeoLineAggregationBuilder`: per
    bucket, connect points in sort-field order into a line; we emit the
    line's invariants (n_points, total haversine length) instead of a
    float-formatted linestring.
  * mtermvectors — `action/termvectors/MultiTermVectorsRequest.java`:
    the batched sibling of _termvectors, one relation for N docs.
  * html_strip — analysis-common `HtmlStripCharFilterFactory`
    ([lucene dep] HTMLStripCharFilter): char filter removing markup
    BEFORE tokenization.
  * completion contexts — `search/suggest/completion/context/
    CategoryContextMapping.java`: completion candidates filtered (and
    weighted) within a category context at query time.

Spark shapes at 10^12 rows: interval/termvector legs read the persisted
positional store (term legs bucket-pruned); geo_line is one window pass
per bucket (lag + map-side haversine, no self-join); ip_range is a pure
map-side CASE + hash aggregate; html_strip is expression-only analysis;
completion-contexts joins the (term,doc)-grain store against a
broadcast doc-subset and aggregates at vocab grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import analysis
from .geo import EARTH_R_KM, _LAT_SQL, _LON_SQL
from .phrase import _POS_CTE, positions_table, term_positions
from .registry import Entry, tbl
from .span import IV_MAX_GAPS, IV_T0, IV_T1

REGISTRY: dict[str, Entry] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


# ---------------------------------------------------------------------------
# intervals … filter: not_containing
# ---------------------------------------------------------------------------

IV_NOT = "batch"


@_reg("q_intervals_not_containing", f"""
WITH {_POS_CTE}
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id
 AND b.pos > a.pos
 AND b.pos - a.pos - 1 <= {IV_MAX_GAPS}
WHERE a.term = '{IV_T0}' AND b.term = '{IV_T1}'
  AND NOT EXISTS (
    SELECT 1 FROM pos x
    WHERE x.doc_id = a.doc_id AND x.term = '{IV_NOT}'
      AND x.pos > a.pos AND x.pos < b.pos)
GROUP BY a.doc_id ORDER BY a.doc_id""")
def q_intervals_not_containing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intervals ordered(IV_T0..IV_T1, max_gaps) FILTERED by
    not_containing(IV_NOT): the filter leg is a third bucket-pruned
    position stream anti-joined on the strict-inside band — the
    relational mirror of Lucene's IntervalFilter wrapping."""
    a = term_positions(spark, sf_dir, IV_T0).alias("a")
    b = term_positions(spark, sf_dir, IV_T1).alias("b")
    x = term_positions(spark, sf_dir, IV_NOT).alias("x")
    pairs = a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("b.pos") > F.col("a.pos"))
                   & (F.col("b.pos") - F.col("a.pos") - 1 <= IV_MAX_GAPS))
    kept = pairs.join(
        x, (F.col("a.doc_id") == F.col("x.doc_id"))
        & (F.col("x.pos") > F.col("a.pos"))
        & (F.col("x.pos") < F.col("b.pos")), "left_anti")
    return (kept.groupBy(F.col("a.doc_id").alias("doc_id"))
            .agg(F.count("*").alias("n_pairs"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# ip_range agg — deterministic synthetic IPv4 per user, identical in both
# engines: offset = (user_id * 7919) mod 65536 within 10.0.0.0/16
# ---------------------------------------------------------------------------

_IP_OFF_SQL = "(user_id * 7919) % 65536"
_IP_EDGES = (0, 20000, 40000, 65536)


def _ip_case(col_sql: str) -> str:
    whens = " ".join(
        f"WHEN {col_sql} < {hi} THEN 'r{i}'"
        for i, hi in enumerate(_IP_EDGES[1:]))
    return f"CASE {whens} END"


@_reg("agg_ip_range", f"""
WITH ip AS (SELECT {_IP_OFF_SQL} AS off FROM events)
SELECT {_ip_case('off')} AS bucket, count(*) AS doc_count
FROM ip GROUP BY bucket ORDER BY bucket""")
def agg_ip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ip_range with explicit from/to buckets: the synthetic address
    offset buckets into 10.0.0.0/16 sub-ranges via a map-side CASE —
    one hash aggregate, no shuffle beyond the ≤3-bucket reduce."""
    e = tbl(spark, sf_dir, "events").select(
        F.expr(_IP_OFF_SQL).alias("off"))
    bucket = (F.when(F.col("off") < _IP_EDGES[1], "r0")
              .when(F.col("off") < _IP_EDGES[2], "r1")
              .when(F.col("off") < _IP_EDGES[3], "r2"))
    return (e.select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("doc_count"))
            .orderBy("bucket"))


# ---------------------------------------------------------------------------
# geo_line agg — per market segment, customers connected in custkey order
# ---------------------------------------------------------------------------

_GL_HAV_SQL = f"""
2 * {EARTH_R_KM} * asin(sqrt(
    sin(radians((lat - plat) / 2)) ^ 2
    + cos(radians(plat)) * cos(radians(lat))
      * sin(radians((lon - plon) / 2)) ^ 2))"""


@_reg("agg_geo_line", f"""
WITH pts AS (
  SELECT c_mktsegment AS seg, c_custkey,
         {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM customer),
hops AS (
  SELECT seg, lat, lon,
         lag(lat) OVER (PARTITION BY seg ORDER BY c_custkey) AS plat,
         lag(lon) OVER (PARTITION BY seg ORDER BY c_custkey) AS plon
  FROM pts)
SELECT seg, count(*) AS n_points,
       round(coalesce(sum({_GL_HAV_SQL}), 0), 3) AS line_km
FROM hops GROUP BY seg ORDER BY seg""")
def agg_geo_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_line: per segment, connect the derived customer points in
    c_custkey (sort-field) order; emit the line's point count and total
    haversine length — ONE lag-window pass per bucket plus a map-side
    great-circle hop, no pair join (x-pack spatial GeoLineAggregator
    also accumulates sorted points per bucket)."""
    c = tbl(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"), "c_custkey",
        F.expr(_LAT_SQL).alias("lat"), F.expr(_LON_SQL).alias("lon"))
    w = Window.partitionBy("seg").orderBy("c_custkey")
    hops = c.select(
        "seg", "lat", "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"))
    dlat = F.radians((F.col("lat") - F.col("plat")) / 2.0)
    dlon = F.radians((F.col("lon") - F.col("plon")) / 2.0)
    hav = (F.pow(F.sin(dlat), 2)
           + F.cos(F.radians("plat")) * F.cos(F.radians("lat"))
           * F.pow(F.sin(dlon), 2))
    hop = 2.0 * EARTH_R_KM * F.asin(F.sqrt(hav))
    return (hops.groupBy("seg")
            .agg(F.count("*").alias("n_points"),
                 F.round(F.coalesce(F.sum(hop), F.lit(0.0)), 3)
                  .alias("line_km"))
            .orderBy("seg"))


# ---------------------------------------------------------------------------
# mtermvectors — batched _termvectors over N docs
# ---------------------------------------------------------------------------

MTV_DOC_IDS = (7, 11)


@_reg("mtermvectors", f"""
WITH t AS (
  SELECT doc_id, {analysis.duckdb_tokens_nostop_expr('text')} AS a
  FROM documents WHERE doc_id IN {MTV_DOC_IDS!r}
),
pos AS (
  SELECT doc_id, a[CAST(i AS INT)] AS term, CAST(i - 1 AS INT) AS p
  FROM t, unnest(range(1, len(a) + 1)) AS u(i)
)
SELECT doc_id, term, count(*)::BIGINT AS tf, CAST(min(p) AS INT) AS first_pos
FROM pos GROUP BY doc_id, term ORDER BY doc_id, term""")
def mtermvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_mtermvectors: one relation of per-doc term vectors for a batch
    of ids — the engine reads the PERSISTED positional store (doc_id
    predicate pushed to the scan; tf = array size, first_pos = array
    min — positions are stored sorted, but min() keeps the invariant
    explicit) instead of re-analyzing _source per doc."""
    pt = positions_table(spark, sf_dir)
    return (pt.where(F.col("doc_id").isin(*MTV_DOC_IDS))
            .select("doc_id", "term",
                    F.size("poss").cast("long").alias("tf"),
                    F.array_min("poss").cast("int").alias("first_pos"))
            .orderBy("doc_id", "term"))


# ---------------------------------------------------------------------------
# html_strip char filter — markup removed BEFORE tokenization
# ---------------------------------------------------------------------------

_HTML_IN = ("<p>QuickSort <b>beats</b> bubble_sort</p><br/>"
            "<a href=\"x\">mergeSort</a> wins")
_HTML_TAG_RE = "<[^>]*>"


@_reg("analyze_html_strip", f"""
WITH stripped AS (
  SELECT regexp_replace('{_HTML_IN}', '{_HTML_TAG_RE}', ' ', 'g') AS s),
tok AS (
  SELECT {analysis.duckdb_tokens_nostop_expr('s')} AS a FROM stripped)
SELECT CAST(i - 1 AS INT) AS pos, a[CAST(i AS INT)] AS token
FROM tok, unnest(range(1, len(a) + 1)) AS u(i)
ORDER BY pos""")
def analyze_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_analyze with char_filter=[html_strip]: tags are replaced by
    whitespace BEFORE the code-aware tokenizer runs (so '<b>beats</b>'
    still splits cleanly and camelCase inside tags' text survives) —
    expression-only, whole-stage codegen, no Python."""
    stripped = F.regexp_replace(F.lit(_HTML_IN), _HTML_TAG_RE, " ")
    return (spark.range(1)
            .select(F.posexplode(analysis.tokens_expr(stripped))
                    .alias("pos", "token"))
            .select(F.col("pos").cast("int").alias("pos"), "token")
            .orderBy("pos"))


# ---------------------------------------------------------------------------
# completion suggester with a category context
# ---------------------------------------------------------------------------

SCC_PREFIX, SCC_CONTEXT, SCC_N = "so", "src0", 5


@_reg("suggest_completion_contexts", f"""
WITH {_POS_CTE},
ctx AS (SELECT doc_id FROM documents WHERE source = '{SCC_CONTEXT}'),
w AS (
  SELECT term, count(*) AS weight
  FROM pos JOIN ctx USING (doc_id)
  WHERE term LIKE '{SCC_PREFIX}%' GROUP BY term)
SELECT term, CAST(weight AS BIGINT) AS weight FROM w
ORDER BY weight DESC, term ASC LIMIT {SCC_N}""")
def suggest_completion_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """completion with a category context (CategoryContextMapping):
    candidates and weights are computed WITHIN the context subset —
    the (term,doc)-grain positional store joins a broadcast list of
    in-context doc_ids (the context filter ES bakes into the FST arcs),
    then aggregates at vocab grain under the sargable prefix."""
    ctx = (tbl(spark, sf_dir, "documents")
           .where(F.col("source") == SCC_CONTEXT).select("doc_id"))
    pt = positions_table(spark, sf_dir)
    return (pt.where(F.col("term").startswith(SCC_PREFIX))
            .join(F.broadcast(ctx), "doc_id")
            .groupBy("term")
            .agg(F.sum(F.size("poss")).cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term")).limit(SCC_N))

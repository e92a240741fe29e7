"""Geo filters — SURVEY §2.5 geo family, previously the only declared
out-of-scope item (r02 VERDICT 'What's missing' #6).

Reference anchors: index/query/GeoBoundingBoxQueryBuilder.java (bbox
containment over doc_values lat/lon), GeoDistanceQueryBuilder.java +
common/geo/GeoDistance.java (haversine ARC distance).

The driver tables carry no coordinates, so both engines DERIVE a
deterministic (lat, lon) per customer from c_custkey with identical
integer arithmetic — the geo predicates themselves (containment, arc
distance, nearest-k) are then exact mirrors. At scale both are one
narrow projected scan + filter (bbox pushes to the parquet scan when
lat/lon are stored columns) and a TakeOrderedAndProject for nearest-k —
no shuffle beyond the top-k reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}

# deterministic synthetic coordinates (identical in both engines):
#   lat = (custkey·7919 mod 18000)/100 − 90    ∈ [−90, 90)
#   lon = (custkey·104729 mod 36000)/100 − 180 ∈ [−180, 180)
#   (explicit DOUBLE cast: Spark promotes BIGINT/literal division to
#    DECIMAL while DuckDB gives DOUBLE — the cast pins both to DOUBLE)
_LAT_SQL = ("CAST(CAST(c_custkey AS BIGINT) * 7919 % 18000 AS DOUBLE)"
            " / 100.0 - 90.0")
_LON_SQL = ("CAST(CAST(c_custkey AS BIGINT) * 104729 % 36000 AS DOUBLE)"
            " / 100.0 - 180.0")

BBOX = {"lat_min": 10.0, "lat_max": 40.0, "lon_min": -30.0, "lon_max": 30.0}
ORIGIN_LAT, ORIGIN_LON = 48.8566, 2.3522  # Paris
EARTH_R_KM = 6371.0088


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


def _latlon(df: DataFrame) -> DataFrame:
    return df.select(
        "c_custkey",
        F.expr(_LAT_SQL).alias("lat"),
        F.expr(_LON_SQL).alias("lon"))


@_reg("geo_bbox", f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)
SELECT c_custkey, lat, lon FROM pts
WHERE lat BETWEEN {BBOX['lat_min']} AND {BBOX['lat_max']}
  AND lon BETWEEN {BBOX['lon_min']} AND {BBOX['lon_max']}
ORDER BY c_custkey""")
def geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_bounding_box filter: customers whose point falls inside the
    box (GeoBoundingBoxQueryBuilder — non-scoring, filter context)."""
    pts = _latlon(tbl(spark, sf_dir, "customer"))
    return (pts.where(F.col("lat").between(BBOX["lat_min"], BBOX["lat_max"])
                      & F.col("lon").between(BBOX["lon_min"], BBOX["lon_max"]))
            .orderBy("c_custkey"))


_HAVERSINE_SQL = f"""2 * {EARTH_R_KM} * asin(sqrt(
    sin(radians((lat - {ORIGIN_LAT}) / 2)) ^ 2
    + cos(radians({ORIGIN_LAT})) * cos(radians(lat))
      * sin(radians((lon - {ORIGIN_LON}) / 2)) ^ 2))"""


@_reg("geo_distance", f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer),
dist AS (
  SELECT c_custkey, {_HAVERSINE_SQL} AS d_km FROM pts),
topk AS (
  SELECT c_custkey, d_km FROM dist
  ORDER BY d_km ASC, c_custkey ASC LIMIT 10)
SELECT c_custkey, round(d_km, 4) AS d_km FROM topk""")
def geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_distance nearest-k: haversine arc distance from a fixed origin
    (GeoDistanceQueryBuilder, GeoDistance.ARC), 10 closest customers.
    Nearest-k on the raw double, rounded for the cross-engine compare."""
    pts = _latlon(tbl(spark, sf_dir, "customer"))
    dlat = F.radians((F.col("lat") - ORIGIN_LAT) / 2.0)
    dlon = F.radians((F.col("lon") - ORIGIN_LON) / 2.0)
    h = (F.sin(dlat) * F.sin(dlat)
         + F.cos(F.radians(F.lit(ORIGIN_LAT))) * F.cos(F.radians("lat"))
         * F.sin(dlon) * F.sin(dlon))
    d_km = 2.0 * EARTH_R_KM * F.asin(F.sqrt(h))
    topk = (pts.select("c_custkey", d_km.alias("d_raw"))
            .orderBy(F.asc("d_raw"), F.asc("c_custkey")).limit(10))
    return topk.select("c_custkey", F.round("d_raw", 4).alias("d_km"))


@_reg("agg_geo_bounds", f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)
SELECT round(min(lat), 4) AS lat_min, round(max(lat), 4) AS lat_max,
       round(min(lon), 4) AS lon_min, round(max(lon), 4) AS lon_max
FROM pts
WHERE lat BETWEEN {BBOX['lat_min']} AND {BBOX['lat_max']}
  AND lon BETWEEN {BBOX['lon_min']} AND {BBOX['lon_max']}""")
def agg_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_bounds aggregation (metrics/GeoBoundsAggregator.java): the
    tightest box enclosing the (bbox-filtered) point set — one
    map-side-combinable min/max agg, no shuffle beyond the 1-row reduce."""
    pts = _latlon(tbl(spark, sf_dir, "customer"))
    return (pts.where(F.col("lat").between(BBOX["lat_min"], BBOX["lat_max"])
                      & F.col("lon").between(BBOX["lon_min"], BBOX["lon_max"]))
            .agg(F.round(F.min("lat"), 4).alias("lat_min"),
                 F.round(F.max("lat"), 4).alias("lat_max"),
                 F.round(F.min("lon"), 4).alias("lon_min"),
                 F.round(F.max("lon"), 4).alias("lon_max")))


@_reg("agg_geo_centroid", f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)
SELECT round(avg(lat), 4) AS lat_c, round(avg(lon), 4) AS lon_c,
       count(*) AS n_points
FROM pts
WHERE lat BETWEEN {BBOX['lat_min']} AND {BBOX['lat_max']}
  AND lon BETWEEN {BBOX['lon_min']} AND {BBOX['lon_max']}""")
def agg_geo_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_centroid aggregation (metrics/GeoCentroidAggregator.java):
    arithmetic mean of the filtered point set + count (ES accumulates the
    same running sums per shard and reduces on the coordinator)."""
    pts = _latlon(tbl(spark, sf_dir, "customer"))
    return (pts.where(F.col("lat").between(BBOX["lat_min"], BBOX["lat_max"])
                      & F.col("lon").between(BBOX["lon_min"], BBOX["lon_max"]))
            .agg(F.round(F.avg("lat"), 4).alias("lat_c"),
                 F.round(F.avg("lon"), 4).alias("lon_c"),
                 F.count("*").alias("n_points")))


_RING_EDGES = (3000.0, 6000.0, 9000.0)  # km from origin


@_reg("agg_geo_distance", f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer),
dist AS (
  SELECT c_custkey, {_HAVERSINE_SQL} AS d_km FROM pts)
SELECT CASE WHEN d_km < {_RING_EDGES[0]} THEN '*-3000'
            WHEN d_km < {_RING_EDGES[1]} THEN '3000-6000'
            WHEN d_km < {_RING_EDGES[2]} THEN '6000-9000'
            ELSE '9000-*' END AS ring,
       CAST(count(*) AS BIGINT) AS cnt
FROM dist GROUP BY ring ORDER BY ring""")
def agg_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_distance aggregation (bucket/range/GeoDistanceAggregationBuilder):
    concentric half-open distance rings around a fixed origin. The ring id
    is computed map-side from the same haversine as geo_distance, so the
    shuffle carries a 4-value label key — the cheapest possible bucket agg."""
    pts = _latlon(tbl(spark, sf_dir, "customer"))
    dlat = F.radians((F.col("lat") - ORIGIN_LAT) / 2.0)
    dlon = F.radians((F.col("lon") - ORIGIN_LON) / 2.0)
    h = (F.sin(dlat) * F.sin(dlat)
         + F.cos(F.radians(F.lit(ORIGIN_LAT))) * F.cos(F.radians("lat"))
         * F.sin(dlon) * F.sin(dlon))
    d_km = 2.0 * EARTH_R_KM * F.asin(F.sqrt(h))
    ring = (F.when(d_km < _RING_EDGES[0], "*-3000")
            .when(d_km < _RING_EDGES[1], "3000-6000")
            .when(d_km < _RING_EDGES[2], "6000-9000")
            .otherwise("9000-*"))
    return (pts.groupBy(ring.alias("ring"))
            .agg(F.count("*").alias("cnt")).orderBy("ring"))


_TILE_Z = 4          # 16x16 world grid (slippy-map tiles)
_TILE_N = 1 << _TILE_Z


@_reg("agg_geotile_grid", f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer),
tiles AS (
  SELECT CAST(floor(round((lon + 180.0) / 360.0 * {_TILE_N}, 9)) AS BIGINT)
           AS tx,
         CAST(floor(round((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat)))
                           / pi()) / 2.0 * {_TILE_N}, 9)) AS BIGINT) AS ty
  FROM pts WHERE lat BETWEEN -80.0 AND 80.0)
SELECT '{_TILE_Z}/' || tx || '/' || ty AS tile, CAST(count(*) AS BIGINT) AS cnt
FROM tiles GROUP BY tile ORDER BY cnt DESC, tile ASC LIMIT 10""")
def agg_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geotile_grid aggregation (bucket/geogrid/GeoTileGridAggregationBuilder):
    buckets are web-mercator map tiles keyed 'z/x/y' (GeoTileUtils.java
    longEncode uses the same slippy-map formula). Latitudes outside the
    mercator domain are filtered exactly as ES clips to GeoTileUtils
    LATITUDE_MASK. The intermediate is rounded to 9 decimals BEFORE floor
    in BOTH engines so a last-ulp libm difference (JVM Math vs C libm
    tan/ln) cannot flip a tile boundary."""
    import math

    pts = _latlon(tbl(spark, sf_dir, "customer"))
    pts = pts.where(F.col("lat").between(-80.0, 80.0))
    tx = F.floor(F.round((F.col("lon") + 180.0) / 360.0 * _TILE_N, 9))
    merc = (1.0 - (F.log(F.tan(F.radians("lat"))
                         + 1.0 / F.cos(F.radians("lat"))) / math.pi)) / 2.0
    ty = F.floor(F.round(merc * _TILE_N, 9))
    tile = F.concat(F.lit(f"{_TILE_Z}/"), tx.cast("string"),
                    F.lit("/"), ty.cast("string"))
    return (pts.groupBy(tile.alias("tile"))
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("tile")).limit(10))


# ---------------------------------------------------------------------------
# geo_polygon — point-in-polygon filter (closes §2.5: the last geo item)
# ---------------------------------------------------------------------------

#: polygon vertices as (lon, lat) — offsets of .005 keep every edge off
#: the 0.01-degree synthetic coordinate grid (no point ever sits ON an
#: edge, so ray-casting parity is unambiguous in both engines)
POLYGON = (
    (-50.005, 10.005),
    (-20.005, 60.005),
    (30.005, 50.005),
    (40.005, -5.005),
    (-10.005, -20.005),
)


def _poly_crossing_terms():
    """Per-edge ray-cast predicates with the slope PRE-COMPUTED in Python
    (both engines then evaluate the identical double constants — no
    cross-libm division drift). Edge (x1,y1)->(x2,y2) crosses the
    +x ray from (lon, lat) iff (y1 > lat) != (y2 > lat) and
    lon < slope*(lat - y1) + x1."""
    edges = list(zip(POLYGON, POLYGON[1:] + POLYGON[:1]))
    out = []
    for (x1, y1), (x2, y2) in edges:
        slope = (x2 - x1) / (y2 - y1)  # y1 != y2 for every POLYGON edge
        out.append((x1, y1, x2, y2, slope))
    return out


def _poly_sql_pred() -> str:
    terms = [
        f"(CASE WHEN (({y1!r} > lat) <> ({y2!r} > lat))"
        f" AND lon < {slope!r} * (lat - {y1!r}) + {x1!r}"
        f" THEN 1 ELSE 0 END)"
        for x1, y1, x2, y2, slope in _poly_crossing_terms()]
    return f"({' + '.join(terms)}) % 2 = 1"


def _poly_col():
    lat, lon = F.col("lat"), F.col("lon")
    crossings = F.lit(0)
    for x1, y1, x2, y2, slope in _poly_crossing_terms():
        hit = (((F.lit(y1) > lat) != (F.lit(y2) > lat))
               & (lon < F.lit(slope) * (lat - F.lit(y1)) + F.lit(x1)))
        crossings = crossings + hit.cast("int")
    return crossings % 2 == 1


@_reg("geo_polygon", f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)
SELECT c_custkey, lat, lon FROM pts
WHERE {_poly_sql_pred()}
ORDER BY c_custkey""")
def geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_polygon filter (index/query/GeoPolygonQueryBuilder.java):
    customers whose point falls inside a fixed 5-vertex polygon, decided
    by even-odd ray casting ([lucene dep] o.a.l.geo.Polygon2D contains).
    Pure column arithmetic over the derived lat/lon — one narrow
    projected scan + filter, no shuffle, same plan shape as geo_bbox."""
    pts = _latlon(tbl(spark, sf_dir, "customer"))
    return pts.where(_poly_col()).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# geo_shape — shape-vs-shape relations (SURVEY §2.5's last 'no': minimal
# slice per the r04 brief: envelope-vs-polygon INTERSECTS / WITHIN)
# ---------------------------------------------------------------------------

#: synthetic per-customer shape: an ENVELOPE (axis-aligned rect) centered
#: on the customer's derived point with custkey-derived half-extents in
#: degrees. Extents are multiples of 0.1 (+ the point grid is 0.01), so
#: corners stay on the 0.01 grid — the .005 polygon-vertex offsets keep
#: every corner off every polygon vertex/edge and make the strict
#: orientation tests unambiguous in both engines.
_DX_SQL = "CAST(CAST(c_custkey AS BIGINT) * 31 % 97 + 3 AS DOUBLE) / 10.0"
_DY_SQL = "CAST(CAST(c_custkey AS BIGINT) * 17 % 89 + 3 AS DOUBLE) / 10.0"

#: rect corners as (x=lon, y=lat) SQL expressions, counter-clockwise
_CORNERS = (("(lon - dx)", "(lat - dy)"), ("(lon + dx)", "(lat - dy)"),
            ("(lon + dx)", "(lat + dy)"), ("(lon - dx)", "(lat + dy)"))
_RECT_EDGES = tuple(zip(_CORNERS, _CORNERS[1:] + _CORNERS[:1]))


def _pip_sql(x: str, y: str) -> str:
    """Even-odd ray-cast point-in-polygon for an arbitrary (x, y)
    expression pair — the parametric generalization of _poly_sql_pred
    (same precomputed-slope form, so both engines evaluate identical
    double constants with +,-,* only)."""
    terms = [
        f"(CASE WHEN (({y1!r} > {y}) <> ({y2!r} > {y}))"
        f" AND {x} < {slope!r} * ({y} - {y1!r}) + {x1!r}"
        f" THEN 1 ELSE 0 END)"
        for x1, y1, x2, y2, slope in _poly_crossing_terms()]
    return f"(({' + '.join(terms)}) % 2 = 1)"


def _edge_cross_sql() -> str:
    """OR over the 5×4 polygon-edge × rect-edge proper-intersection
    tests. Segments AB (polygon, constants) and CD (rect, expressions)
    properly cross iff orient(A,B,C)·orient(A,B,D) < 0 AND
    orient(C,D,A)·orient(C,D,B) < 0 — orientation is the 2×2 cross
    product, so the whole predicate is +,-,* arithmetic that both
    engines evaluate bit-identically (no division, no libm)."""
    poly_edges = list(zip(POLYGON, POLYGON[1:] + POLYGON[:1]))
    crosses = []
    for (ax, ay), (bx, by) in poly_edges:
        ex, ey = bx - ax, by - ay  # AB direction, precomputed constants
        for (cx, cy), (dx_, dy_) in _RECT_EDGES:
            o_c = f"({ex!r} * ({cy} - {ay!r}) - {ey!r} * ({cx} - {ax!r}))"
            o_d = f"({ex!r} * ({dy_} - {ay!r}) - {ey!r} * ({dx_} - {ax!r}))"
            o_a = (f"(({dx_} - {cx}) * ({ay!r} - {cy}) -"
                   f" ({dy_} - {cy}) * ({ax!r} - {cx}))")
            o_b = (f"(({dx_} - {cx}) * ({by!r} - {cy}) -"
                   f" ({dy_} - {cy}) * ({bx!r} - {cx}))")
            crosses.append(f"({o_c} * {o_d} < 0 AND {o_a} * {o_b} < 0)")
    return "(" + " OR ".join(crosses) + ")"


def _vertex_in_rect_sql() -> str:
    """OR over the 5 polygon-vertex-inside-rect tests (strict)."""
    tests = [
        f"({vx!r} > lon - dx AND {vx!r} < lon + dx"
        f" AND {vy!r} > lat - dy AND {vy!r} < lat + dy)"
        for vx, vy in POLYGON]
    return "(" + " OR ".join(tests) + ")"


def _corner_pip_terms() -> list[str]:
    return [_pip_sql(x, y) for x, y in _CORNERS]


def _shape_cte() -> str:
    return (f"SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon,"
            f" {_DX_SQL} AS dx, {_DY_SQL} AS dy FROM customer")


def _intersects_pred() -> str:
    """Rect ∩ polygon ≠ ∅ ⇔ a rect corner is inside the polygon (polygon
    ⊇-covers or partially covers the rect), OR a polygon vertex is inside
    the rect (rect covers part/all of the polygon), OR some boundary
    edges properly cross (overlap with no contained vertex)."""
    corner_any = "(" + " OR ".join(_corner_pip_terms()) + ")"
    return (f"({corner_any} OR {_vertex_in_rect_sql()}"
            f" OR {_edge_cross_sql()})")


def _within_pred() -> str:
    """Rect ⊆ polygon ⇔ all 4 corners inside AND no boundary crossing
    (sufficient for simple polygons: a boundary excursion would have to
    cross the rect boundary)."""
    corner_all = "(" + " AND ".join(_corner_pip_terms()) + ")"
    return f"({corner_all} AND NOT {_edge_cross_sql()})"


@_reg("geo_shape_intersects", f"""
WITH shp AS ({_shape_cte()})
SELECT c_custkey, lat, lon, dx, dy FROM shp
WHERE {_intersects_pred()}
ORDER BY c_custkey""")
def geo_shape_intersects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_shape INTERSECTS relation (GeoShapeQueryBuilder.java,
    ShapeRelation.INTERSECTS; [lucene dep] LatLonShape envelope-vs-
    polygon component queries): customer ENVELOPE shapes intersecting
    the fixed 5-vertex query polygon. Decided entirely by column
    arithmetic (ray-cast containment + 2×2-cross-product segment
    orientation) over a derived-shape projection — one narrow scan +
    filter, no shuffle, no UDF; at 100 TB this is the same
    whole-stage-codegen filter shape as geo_bbox."""
    shp = (_latlon(tbl(spark, sf_dir, "customer"))
           .withColumn("dx", F.expr(_DX_SQL))
           .withColumn("dy", F.expr(_DY_SQL)))
    return shp.where(F.expr(_intersects_pred())).orderBy("c_custkey")


@_reg("geo_shape_within", f"""
WITH shp AS ({_shape_cte()})
SELECT c_custkey, lat, lon, dx, dy FROM shp
WHERE {_within_pred()}
ORDER BY c_custkey""")
def geo_shape_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_shape WITHIN relation (ShapeRelation.WITHIN): customer
    envelopes entirely inside the query polygon — all-corners-contained
    plus no boundary crossing. Same plan shape as geo_shape_intersects."""
    shp = (_latlon(tbl(spark, sf_dir, "customer"))
           .withColumn("dx", F.expr(_DX_SQL))
           .withColumn("dy", F.expr(_DY_SQL)))
    return shp.where(F.expr(_within_pred())).orderBy("c_custkey")

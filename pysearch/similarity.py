"""Similarity search over the embeddings table (driver brief):
brute-force cosine top-k as the exact baseline, and a deterministic
sign-random-projection LSH variant as the scale path.

Scale design:
  * brute force is a single narrow scan (cosine is a Catalyst higher-order
    expression — JVM-side, no shuffle) + TakeOrderedAndProject: at 100 TB
    this is the per-partition-heap pattern and parallelizes perfectly;
  * the LSH path prunes candidates to one signature bucket before scoring;
    buckets come from SIGN-random-projection with INTEGER arithmetic:
    hyperplane components are ±1 derived from md5 parity and vectors are
    quantized to int(v*1000), so the bucket id is bit-for-bit reproducible
    in DuckDB (strong oracle even for the ANN path — no fp sign flips);
  * batch kNN (many query vectors at once) is a blocked pair join +
    per-query ranked window, the join-shaped formulation a training
    pipeline runs nightly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import cosine_expr
from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}

TOPK = 10
QUERY_VEC_ID = 0
LSH_BITS = 8
QUANT = 1000  # vector quantization scale for integer LSH dots


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (tbl(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") == QUERY_VEC_ID)
           .select("embedding").collect())
    return [float(v) for v in row[0][0]]


@_reg("sim_cosine_topk", f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, round(raw_cos, 6) AS cos FROM (
  SELECT vec_id,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) AS raw_cos
  FROM embeddings, q WHERE vec_id != {QUERY_VEC_ID})
ORDER BY raw_cos DESC, vec_id ASC LIMIT {TOPK}""")
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-k for one query vector.
    The scan is embarrassingly parallel; global top-k is Spark's
    distributed bounded heap (TakeOrderedAndProject)."""
    qv = _query_vec(spark, sf_dir)
    qcol = F.array(*[F.lit(v) for v in qv])
    e = tbl(spark, sf_dir, "embeddings").where(F.col("vec_id") != QUERY_VEC_ID)
    return (e.select("vec_id", cosine_expr(F.col("embedding"), qcol).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOPK)
            .select("vec_id", F.round("cos", 6).alias("cos")))


@_reg("sim_knn_batch", """
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 20
),
ranked AS (
  SELECT qid, nid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rn
  FROM pairs)
SELECT qid, nid, round(cos, 6) AS cos, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= 3 ORDER BY qid, rn""")
def sim_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN: top-3 neighbors for each of the first 20 vectors in ONE
    job (pair join + per-query ranked window). At scale the join is
    blocked by an IVF/LSH bucket key instead of a cross join."""
    e = tbl(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") < 20).alias("a")
    b = e.alias("b")
    from pyspark.sql import Window
    pairs = (a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("qid"),
                     F.col("b.vec_id").alias("nid"),
                     cosine_expr(F.col("a.embedding"),
                                 F.col("b.embedding")).alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("qid", "nid", F.round("cos", 6).alias("cos"), "rn")
            .orderBy("qid", "rn"))


def _knn_lsh_sql() -> str:
    return f"""
WITH {_LSH_CTE},
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                CAST(eb.embedding AS DOUBLE[])) AS cos
  FROM sig a
  JOIN sig b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE a.vec_id < 20),
ranked AS (
  SELECT qid, nid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rn
  FROM pairs)
SELECT qid, nid, round(cos, 6) AS cos, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= 3 ORDER BY qid, rn"""


def sim_knn_batch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN, LSH-BLOCKED — the 100 TB formulation of sim_knn_batch
    (r01 advice: the all-pairs join had to become bucket-blocked before
    it is a scale claim): candidate pairs meet only inside a signature
    bucket, so pair work is Σ bucket² not n². Top-3 within-bucket
    neighbors per query vector; the integer-exact bucket id makes even
    this approximate path fully DuckDB-reproducible."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "embeddings")
    bucketed = lsh_buckets(e).select("vec_id", "embedding", "bucket")
    a = bucketed.where(F.col("vec_id") < 20).alias("a")
    b = bucketed.alias("b")
    pairs = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") != F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("qid"),
                     F.col("b.vec_id").alias("nid"),
                     cosine_expr(F.col("a.embedding"),
                                 F.col("b.embedding")).alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("qid", "nid", F.round("cos", 6).alias("cos"), "rn")
            .orderBy("qid", "rn"))


# --- deterministic sign-random-projection LSH ------------------------------

def lsh_buckets(e: DataFrame) -> DataFrame:
    """(vec_id, embedding, bucket) via a relational plan: explode (h, d)
    grid AFTER quantization, two groupBys — same shape as simhash."""
    quant = e.select(
        "vec_id", "embedding",
        F.posexplode(F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * QUANT).cast("long"))))
    quant = quant.withColumnRenamed("pos", "d0").withColumnRenamed("col", "vq")
    bits = quant.select(
        "vec_id", "d0", "vq",
        F.explode(F.sequence(F.lit(0), F.lit(LSH_BITS - 1))).alias("h"))
    comp = F.expr("CASE WHEN instr('01234567', "
                  "substr(md5(concat(h, '|', d0 + 1)), 1, 1)) > 0 "
                  "THEN 1L ELSE -1L END")
    dots = (bits.withColumn("c", comp)
            .groupBy("vec_id", "h")
            .agg(F.sum(F.col("c") * F.col("vq")).alias("dot")))
    sig = (dots.groupBy("vec_id")
           .agg(F.sum(F.when(F.col("dot") > 0,
                             F.expr("shiftleft(1L, h)")).otherwise(F.lit(0)))
                .alias("bucket")))
    return e.join(sig, "vec_id")


_LSH_CTE = f"""
grid AS (
  SELECT vec_id, h,
         sum((CASE WHEN instr('01234567',
                substr(md5(h || '|' || CAST(d AS VARCHAR)), 1, 1)) > 0
              THEN 1 ELSE -1 END)
             * CAST(round(CAST(embedding[CAST(d AS INT)] AS DOUBLE)
                          * {QUANT}) AS BIGINT)) AS dot
  FROM embeddings,
       unnest(range(1, len(embedding) + 1)) AS dd(d),
       unnest(range(0, {LSH_BITS})) AS hh(h)
  GROUP BY vec_id, h
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN CAST(pow(2, h) AS BIGINT) ELSE 0 END) AS bucket
  FROM grid GROUP BY vec_id
)"""


@_reg("sim_ann_lsh", f"""
WITH {_LSH_CTE},
qb AS (SELECT bucket FROM sig WHERE vec_id = {QUERY_VEC_ID}),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb
  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id, qb
  WHERE s.bucket = qb.bucket AND e.vec_id != {QUERY_VEC_ID})
SELECT vec_id, round(list_cosine_similarity(emb, qv.v), 6) AS cos
FROM cand, qv
ORDER BY list_cosine_similarity(emb, qv.v) DESC, vec_id ASC LIMIT {TOPK}""")
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-random-projection LSH: candidates = query's signature
    bucket only, then exact cosine rank. Sub-linear candidate set; recall
    vs sim_cosine_topk asserted in tests. The bucket id is integer-exact,
    so even this approximate path has a full DuckDB oracle."""
    e = tbl(spark, sf_dir, "embeddings")
    bucketed = lsh_buckets(e)
    qrow = bucketed.where(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qbucket = qrow["bucket"]
    qv = [float(v) for v in qrow["embedding"]]
    qcol = F.array(*[F.lit(v) for v in qv])
    cand = bucketed.where((F.col("bucket") == qbucket)
                          & (F.col("vec_id") != QUERY_VEC_ID))
    return (cand.select("vec_id",
                        cosine_expr(F.col("embedding"), qcol).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOPK)
            .select("vec_id", F.round("cos", 6).alias("cos")))


# registered at EOF: _knn_lsh_sql() needs _LSH_CTE, defined above
REGISTRY["sim_knn_batch_lsh"] = Entry(fn=sim_knn_batch_lsh, sql=_knn_lsh_sql())

"""Deduplication operators for training-data pipelines (driver brief):
exact, n-gram Jaccard, MinHash+LSH, SimHash (banded), embedding-cosine.

Design principles (all five):
  * every hash is md5-derived → bit-for-bit reproducible in DuckDB, so even
    the sketch-based dedupers get STRONG oracles (not rows-only checks);
  * every operator is a declarative DataFrame plan (explode → groupBy →
    join), so Catalyst gets partial aggregation and AQE skew handling; no
    Python UDFs anywhere in the path;
  * pair generation never goes O(n²): candidates come from band buckets
    (LSH/SimHash) or shingle co-occurrence (Jaccard), which is how these
    run at 100 TB — the all-pairs join is confined to docs sharing a
    bucket. Self-joins keep `a.doc_id < b.doc_id`.

SimHash banding is EXACT for the chosen radius: 64-bit signatures split
into 4 bands of 16 bits; hamming distance ≤ 3 ⇒ at least one band is
identical (pigeonhole), so the banded join loses no true pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import analysis
from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}

JACCARD_TAU = 0.6
SHINGLE_K = 3          # word 3-grams
SHINGLE_DF_CAP = 100   # shingles in more docs than this are dropped: they
                       # carry no dedup signal and a shingle shared by m
                       # docs fans out m²/2 candidate pairs — the Zipf-head
                       # skew killer at 100 TB (r01 advice: the cap was
                       # documented but not implemented)
MINHASH_N = 8          # minhash functions
MINHASH_BAND = 1       # rows per band -> 8 bands of 1: high-recall config
                       # (P(miss) = (1-j)^8 ≈ 0.07% at j = τ = 0.6; exact-
                       # Jaccard verification prunes the extra candidates)
SIMHASH_BITS = 64
SIMHASH_BANDS = 4      # 16 bits per band; exact for hamming <= 3
SIMHASH_RADIUS = 3
COSINE_TAU = 0.4    # synthetic embeddings are near-orthogonal; 0.4 captures the tail


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


# ---------------------------------------------------------------------------
# exact dedup — hash-groupBy on content
# ---------------------------------------------------------------------------

@_reg("dedup_exact", """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY content_hash
ORDER BY keep_doc_id""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor (min doc_id) per distinct content hash.
    At scale this is a single hash-shuffle on a 16-byte key."""
    return (tbl(spark, sf_dir, "documents")
            .groupBy(F.md5("text").alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_copies"))
            .orderBy("keep_doc_id"))


# ---------------------------------------------------------------------------
# word n-gram shingles (shared by Jaccard and MinHash)
# ---------------------------------------------------------------------------

def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word-SHINGLE_K-grams of the analyzed
    token stream, with shingles above SHINGLE_DF_CAP docs dropped (the
    frequent-shingle skew cap; identical filter in the SQL oracle)."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", analysis.tokens_expr(F.col("text")).alias("t"))
    n = F.size("t") - (SHINGLE_K - 1)
    # guard: sequence(1, 0) DESCENDS in Spark, so empty/short docs need an
    # explicit empty position list
    pos = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>"))
    sh = F.transform(pos, lambda i: F.concat_ws(" ", F.slice("t", i, SHINGLE_K)))
    raw = toks.select("doc_id", F.explode(sh).alias("shingle")).distinct()
    ok = (raw.groupBy("shingle").agg(F.count("*").alias("sdf"))
          .where(F.col("sdf") <= SHINGLE_DF_CAP).select("shingle"))
    return raw.join(ok, "shingle").select("doc_id", "shingle")


_SHINGLE_CTE = f"""
tokarr AS (
  SELECT doc_id, {analysis.duckdb_tokens_nostop_expr('text')} AS t FROM documents
),
shingle0 AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i:i+{SHINGLE_K - 1}], ' ') AS shingle
  FROM tokarr, unnest(range(1, greatest(len(t) - {SHINGLE_K - 2}, 1))) AS u(i)
),
shok AS (
  SELECT shingle FROM shingle0 GROUP BY shingle
  HAVING count(*) <= {SHINGLE_DF_CAP}
),
shingle AS (
  SELECT s.doc_id, s.shingle FROM shingle0 s JOIN shok USING (shingle)
)"""


@_reg("dedup_ngram_jaccard", f"""
WITH {_SHINGLE_CTE},
card AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingle a JOIN shingle b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
FROM inter
JOIN card ca ON ca.doc_id = doc_a
JOIN card cb ON cb.doc_id = doc_b
WHERE i * 1.0 / (ca.n + cb.n - i) >= {JACCARD_TAU}
ORDER BY doc_a, doc_b""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ τ. Candidates are generated
    by shingle co-occurrence (join on shingle), NOT an n² cross join —
    disjoint docs never meet. Skew note: a shingle shared by m docs fans
    out m²/2 pairs; at 100 TB frequent shingles are dropped first (they
    carry no dedup signal), AQE splits the rest."""
    sh = shingles(spark, sf_dir)
    card = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("i")))
    ca, cb = card.alias("ca"), card.alias("cb")
    jac = F.col("i") / (F.col("ca.n") + F.col("cb.n") - F.col("i"))
    return (inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
            .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
            .where(jac >= JACCARD_TAU)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
            .orderBy("doc_a", "doc_b"))


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, minhash): minhash_i = lexicographic min of
    md5(i || '|' || shingle) — md5 order approximates a uniform random
    permutation per seed, and is reproducible in any engine with md5."""
    sh = shingles(spark, sf_dir)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(MINHASH_N - 1))).alias("seed")
    hashed = sh.select("doc_id", seeds, "shingle").select(
        "doc_id", "seed",
        F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle"))).alias("h"))
    return hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


_MINHASH_CTE = _SHINGLE_CTE + f""",
mh AS (
  SELECT doc_id, seed, min(md5(seed || '|' || shingle)) AS minhash
  FROM shingle, unnest(range(0, {MINHASH_N})) AS s(seed)
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // {MINHASH_BAND} AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM mh GROUP BY doc_id, band
)"""


@_reg("dedup_minhash_lsh", f"""
WITH {_MINHASH_CTE},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
card AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN shingle sa ON sa.doc_id = c.doc_a
  JOIN shingle sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT v.doc_a, v.doc_b, round(v.i * 1.0 / (ca.n + cb.n - v.i), 6) AS jaccard
FROM verified v
JOIN card ca ON ca.doc_id = v.doc_a
JOIN card cb ON cb.doc_id = v.doc_b
WHERE v.i * 1.0 / (ca.n + cb.n - v.i) >= {JACCARD_TAU}
ORDER BY doc_a, doc_b""")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle → 8 minhashes → 4 bands of 2 →
    band-bucket join → exact-Jaccard verification of candidates only.
    This is the scale path: pair work is proportional to bucket collisions,
    not n². Verified candidate pairs ⊆ jaccard pairs; LSH recall vs the
    exhaustive operator is asserted in tests."""
    mh = minhash_signatures(spark, sf_dir)
    bands = (mh.withColumn("band", (F.col("seed") / MINHASH_BAND).cast("int"))
             .groupBy("doc_id", "band")
             .agg(F.md5(F.concat_ws(
                 ",", F.array_sort(F.collect_list(
                     F.concat_ws(":", "seed", "minhash"))))).alias("band_key")))
    # band_key built from (seed:minhash) pairs sorted -> order-insensitive
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")).distinct())
    sh = shingles(spark, sf_dir)
    card = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
             .join(sb, (F.col("doc_b") == F.col("sb.doc_id"))
                   & (F.col("sb.shingle") == F.col("sa.shingle")))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("i")))
    ca, cb = card.alias("ca"), card.alias("cb")
    jac = F.col("i") / (F.col("ca.n") + F.col("cb.n") - F.col("i"))
    return (inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
            .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
            .where(jac >= JACCARD_TAU)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
            .orderBy("doc_a", "doc_b"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_CTE = f"""
tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS w, md5(term) AS h
       FROM tok GROUP BY doc_id, term),
bits AS (
  SELECT doc_id, i,
         sum(w * (2 * ((instr('0123456789abcdef', substr(h, 1 + i // 4, 1)) - 1)
                        // CAST(pow(2, i % 4) AS BIGINT) % 2) - 1)) AS v
  FROM tf, unnest(range(0, {SIMHASH_BITS})) AS u(i)
  GROUP BY doc_id, i
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN CAST(pow(2, i) AS HUGEINT) ELSE 0 END) AS sim
  FROM bits GROUP BY doc_id
)"""


@_reg("dedup_simhash", f"""
WITH {_SIMHASH_CTE},
sig64 AS (SELECT doc_id, CAST(sim - CASE WHEN sim >= 9223372036854775808
  THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS sim FROM sig),
banded AS (
  SELECT doc_id, sim, band,
         (sim >> (band * {SIMHASH_BITS // SIMHASH_BANDS}))
           & {(1 << (SIMHASH_BITS // SIMHASH_BANDS)) - 1} AS band_v
  FROM sig64, unnest(range(0, {SIMHASH_BANDS})) AS u(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sim AS sim_a, b.sim AS sim_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_v = b.band_v AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_RADIUS}
ORDER BY doc_a, doc_b""")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming radius ≤ 3 over 64-bit signatures.

    Signature: per token, 64 bits of md5(term); bit i votes ±tf; sign of
    the per-bit sum. Everything is integer/bit arithmetic on both engines
    (hex digits decoded positionally — no hex-to-int builtin needed).
    Banding into 4×16 bits makes the pair join exact for radius ≤ 3
    (pigeonhole) and O(bucket collisions), not O(n²)."""
    sigs = simhash_signatures(spark, sf_dir)
    w = SIMHASH_BITS // SIMHASH_BANDS
    bandix = F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band")
    banded = sigs.select("doc_id", "sim", bandix).withColumn(
        "band_v",
        F.expr(f"(sim >> (band * {w})) & {(1 << w) - 1}"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_v") == F.col("b.band_v"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    ham.alias("hamming"))
            .distinct()
            .where(F.col("hamming") <= SIMHASH_RADIUS)
            .orderBy("doc_a", "doc_b"))


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sim BIGINT) — 64-bit SimHash, fully relational.

    Plan: tf(doc,term) × 64 bit-positions → groupBy(doc,bit) weighted vote
    → groupBy(doc) bit-assemble. Two narrow aggs after one token shuffle;
    the ×64 explode happens AFTER tf aggregation, so it multiplies the
    (doc, distinct-term) grain, not the raw token stream."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    tf = (tok.groupBy("doc_id", "term").agg(F.count("*").alias("w"))
          .withColumn("h", F.md5("term")))
    bit_i = F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("i")
    # hex digit (i // 4) of h, bit (i % 4) of that digit -> vote ±w
    digit = F.expr("instr('0123456789abcdef', substr(h, 1 + CAST(i / 4 AS INT), 1)) - 1")
    votes = (tf.select("doc_id", "w", "h", bit_i)
             .withColumn("digit", digit)
             .withColumn("bit", F.expr("(digit div CAST(pow(2, i % 4) AS BIGINT)) % 2"))
             .groupBy("doc_id", "i")
             .agg(F.sum(F.col("w") * (F.col("bit") * 2 - 1)).alias("v")))
    return (votes.groupBy("doc_id")
            .agg(F.sum(F.when(F.col("v") > 0,
                              F.expr("shiftleft(CAST(1 AS BIGINT), i)"))
                       .otherwise(F.lit(0))).alias("sim")))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def cosine_expr(x, y):
    """Cosine similarity of two array<float> columns as a pure Catalyst
    expression (higher-order functions, double accumulation — matches
    DuckDB list_cosine_similarity over DOUBLE[]). No Python in the loop."""
    xd = F.transform(x, lambda v: v.cast("double"))
    yd = F.transform(y, lambda v: v.cast("double"))
    dot = F.aggregate(F.zip_with(xd, yd, lambda p, q: p * q),
                      F.lit(0.0), lambda acc, v: acc + v)
    nx = F.sqrt(F.aggregate(F.transform(xd, lambda p: p * p),
                            F.lit(0.0), lambda acc, v: acc + v))
    ny = F.sqrt(F.aggregate(F.transform(yd, lambda p: p * p),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (nx * ny)

@_reg("dedup_embedding_cosine", f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos, 4) AS cos
FROM pairs WHERE cos >= {COSINE_TAU}
ORDER BY vec_a, vec_b""")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs with cosine ≥ τ, blocked by `label`
    (stand-in for an LSH/IVF bucket id at 100 TB — the join key confines
    the quadratic pair work to one bucket). Cosine runs JVM-side via
    higher-order functions — no Python in the loop."""
    e = tbl(spark, sf_dir, "embeddings")

    a, b = e.alias("a"), e.alias("b")
    cos = cosine_expr(F.col("a.embedding"), F.col("b.embedding"))
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"), cos.alias("cos"))
            .where(F.col("cos") >= COSINE_TAU)
            .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
            .orderBy("vec_a", "vec_b"))

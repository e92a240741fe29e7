"""Analysis-chain extensions beyond the core code-aware analyzer
(SURVEY §2.2): the `_analyze` debug surface, a light stemmer, edge
n-grams (prefix index) and synonym mapping.

Reference anchors: RestAnalyzeAction / TransportAnalyzeAction
(`analyze_api`); analysis-common stemmer/edge_ngram/synonym_graph token
filter factories (modules/analysis-common/.../CommonAnalysisPlugin.java →
#getTokenFilters). Each filter is expressed as an engine-portable
transformation (identical regex/arithmetic in Spark and DuckDB), so all
entries carry strong oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import analysis
from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}

# light English stemmer: one anchored suffix strip, longest-alternative
# first (identical leftmost-first semantics in Java regex and RE2)
STEM_RE = "(ing|ed|es|s)$"
STEM_MIN_LEN = 5           # only stem tokens this long or longer
EDGE_MIN, EDGE_MAX = 3, 3  # edge-ngram width (prefix grams)
SYNONYMS: dict[str, str] = {"quick": "fast", "rapid": "fast", "big": "large"}

_ANALYZE_SAMPLE = "the QuickBrownFox jumped_over 2 lazyDogs"


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


@_reg("analyze_api", f"""
WITH t(txt) AS (VALUES ('{_ANALYZE_SAMPLE}')),
arr AS (SELECT {analysis.duckdb_tokens_nostop_expr('txt')} AS a FROM t)
SELECT CAST(i - 1 AS INT) AS pos, a[CAST(i AS INT)] AS term
FROM arr, unnest(range(1, len(a) + 1)) AS u(i)
ORDER BY pos""")
def analyze_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_analyze` endpoint analog: tokenize a literal string, return
    (pos, term) rows — the debugging surface for the analysis chain."""
    one = spark.createDataFrame([(_ANALYZE_SAMPLE,)], "txt string")
    return (one.select(F.posexplode(analysis.tokens_expr(F.col("txt")))
                       .alias("pos", "term"))
            .orderBy("pos"))


@_reg("analyze_stem_light", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
stemmed AS (
  SELECT DISTINCT term,
         CASE WHEN len(term) >= {STEM_MIN_LEN}
              THEN regexp_replace(term, '{STEM_RE}', '')
              ELSE term END AS stem
  FROM tok
)
SELECT stem, count(*) AS n_variants FROM stemmed
GROUP BY stem HAVING count(*) > 1 ORDER BY stem""")
def analyze_stem_light(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Light suffix stemmer (stemmer token filter, 'light_english'
    flavor): conflation groups — stems with more than one surface form."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select(F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    stem = F.when(F.length("term") >= STEM_MIN_LEN,
                  F.regexp_replace("term", STEM_RE, "")).otherwise(F.col("term"))
    stemmed = tok.select("term", stem.alias("stem")).distinct()
    return (stemmed.groupBy("stem").agg(F.count("*").alias("n_variants"))
            .where(F.col("n_variants") > 1).orderBy("stem"))


@_reg("analyze_edge_ngram", f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, substr(term, 1, {EDGE_MAX}) AS gram
  FROM tok WHERE len(term) >= {EDGE_MIN}
)
SELECT gram, count(*) AS df FROM grams
GROUP BY gram ORDER BY df DESC, gram ASC LIMIT 15""")
def analyze_edge_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edge_ngram filter: prefix grams per token — the index structure
    behind fast prefix/autocomplete search (search-as-you-type). Emits
    the 15 most document-frequent 3-prefixes."""
    d = tbl(spark, sf_dir, "documents")
    tok = (d.select("doc_id",
                    F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
           .distinct())
    grams = (tok.where(F.length("term") >= EDGE_MIN)
             .select("doc_id", F.substring("term", 1, EDGE_MAX).alias("gram"))
             .distinct())
    return (grams.groupBy("gram").agg(F.count("*").alias("df"))
            .orderBy(F.desc("df"), F.asc("gram")).limit(15))


_SYN_CASE = "CASE term " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in sorted(SYNONYMS.items())) + " ELSE term END"


@_reg("analyze_synonym", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
mapped AS (SELECT doc_id, {_SYN_CASE} AS term FROM tok)
SELECT term, count(DISTINCT doc_id) AS df FROM mapped
WHERE term IN ('fast', 'large')
GROUP BY term ORDER BY term""")
def analyze_synonym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """synonym_graph filter (replace flavor): map surface forms onto a
    canonical term before indexing; df of the canonical terms."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    mapping = F.col("term")
    for k, v in sorted(SYNONYMS.items()):
        mapping = F.when(F.col("term") == k, F.lit(v)).otherwise(mapping)
    mapped = tok.select("doc_id", mapping.alias("term"))
    return (mapped.where(F.col("term").isin("fast", "large"))
            .groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
            .orderBy("term"))

"""Positional (phrase) queries — SURVEY §2.4 q_phrase.

Reference: MatchPhraseQueryBuilder / [lucene dep] PhraseQuery,
ExactPhraseMatcher: terms must appear at consecutive positions (slop=0) or
within `slop` moves (sloppy). Positions are 0-based indexes into the
POST-analysis token stream (stopwords removed before position assignment —
matches how dl is counted, SURVEY §8.7).

Spark formulation: positions are a (doc_id, pos, term) relation derived by
posexplode; a phrase [t0, t1] is a self-join on (doc_id, pos+1). This is
exactly the positional-postings intersection Lucene runs, expressed
relationally so Catalyst plans it (broadcast/shuffle-hash as appropriate).
At scale the positions relation is precomputed once per segment next to
the postings table, not re-derived per query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import analysis
from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


def positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, term) — positional index of the documents table."""
    d = tbl(spark, sf_dir, "documents")
    return (d.select("doc_id",
                     F.posexplode(analysis.tokens_expr(F.col("text")))
                     .alias("pos", "term")))


_POS_CTE = f"""
pos AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[CAST(i AS INT)] AS term
  FROM (SELECT doc_id, {analysis.duckdb_tokens_nostop_expr('text')} AS t
        FROM documents),
       unnest(range(1, len(t) + 1)) AS u(i)
)"""


def _phrase_pair(t0: str, t1: str, slop: int):
    """Spark plan for a 2-term phrase with the given slop.

    slop=0 → exact adjacency (pos1 == pos0+1); slop>0 → Lucene-sloppy-ish:
    t1 within (pos0+1 .. pos0+1+slop), order preserved."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        p = positions(spark, sf_dir)
        a = p.where(F.col("term") == t0).alias("a")
        b = p.where(F.col("term") == t1).alias("b")
        cond = ((F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("b.pos") >= F.col("a.pos") + 1)
                & (F.col("b.pos") <= F.col("a.pos") + 1 + slop))
        return (a.join(b, cond)
                .groupBy(F.col("a.doc_id").alias("doc_id"))
                .agg(F.count("*").alias("n_occurrences"))
                .orderBy("doc_id"))
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
    startswith on the trailing leg."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        p = positions(spark, sf_dir)
        a = p.where(F.col("term") == t0).alias("a")
        b = p.where(F.col("term").startswith(prefix)).alias("b")
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

REGISTRY["q_phrase"] = Entry(
    fn=_phrase_pair("merge", "sort", slop=0),
    sql=_phrase_pair_sql("merge", "sort", slop=0))

REGISTRY["q_phrase_slop2"] = Entry(
    fn=_phrase_pair("merge", "sort", slop=2),
    sql=_phrase_pair_sql("merge", "sort", slop=2))

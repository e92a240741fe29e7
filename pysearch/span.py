"""Span (proximity) queries — the positional query family beyond phrase.

Reference anchors (upstream ES tree):
  * span_near — index/query/SpanNearQueryBuilder ([lucene dep]
    SpanNearQuery): component spans within `slop` positions, optionally
    order-free (in_order=false). For two single-term spans the unordered
    match condition is |posA - posB| - 1 <= slop over distinct positions.
  * span_first — index/query/SpanFirstQueryBuilder (SpanFirstQuery):
    the span must END within the first `end` positions of the field
    (a single-term span at pos p has end p+1).

Spark formulation: reads the PERSISTED positional-postings table
(phrase.positions_table — bucket-partitioned parquet, crc32 buckets),
matched with a join whose band predicate Catalyst turns into a
doc_id-keyed join + filter. Term legs partition-prune to 1 of
N_POS_BUCKETS dirs; no query-time re-tokenize (r03 plan-audit fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .phrase import _POS_CTE, term_positions
from .registry import Entry

REGISTRY: dict[str, Entry] = {}

SPAN_T0, SPAN_T1, SPAN_SLOP = "merge", "sort", 3
SPAN_FIRST_TERM, SPAN_FIRST_END = "sort", 5


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


@_reg("q_span_near", f"""
WITH {_POS_CTE}
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_spans
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id
 AND abs(a.pos - b.pos) - 1 <= {SPAN_SLOP}
 AND a.pos <> b.pos
WHERE a.term = '{SPAN_T0}' AND b.term = '{SPAN_T1}'
GROUP BY a.doc_id ORDER BY a.doc_id""")
def q_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_near(in_order=false): SPAN_T0 and SPAN_T1 within SPAN_SLOP
    positions in either order; n_spans counts the matching position
    pairs (Lucene's sloppy-freq numerator)."""
    a = term_positions(spark, sf_dir, SPAN_T0).alias("a")
    b = term_positions(spark, sf_dir, SPAN_T1).alias("b")
    cond = ((F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")) - 1 <= SPAN_SLOP)
            & (F.col("a.pos") != F.col("b.pos")))
    return (a.join(b, cond)
            .groupBy(F.col("a.doc_id").alias("doc_id"))
            .agg(F.count("*").alias("n_spans"))
            .orderBy("doc_id"))


@_reg("q_span_first", f"""
WITH {_POS_CTE}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
FROM pos
WHERE term = '{SPAN_FIRST_TERM}' AND pos + 1 <= {SPAN_FIRST_END}
GROUP BY doc_id ORDER BY doc_id""")
def q_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_first: SPAN_FIRST_TERM occurrences whose span end (pos+1)
    falls within the first SPAN_FIRST_END positions of the document."""
    p = term_positions(spark, sf_dir, SPAN_FIRST_TERM)
    return (p.where(F.col("pos") + 1 <= SPAN_FIRST_END)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_spans"))
            .orderBy("doc_id"))

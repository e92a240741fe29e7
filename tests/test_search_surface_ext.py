"""Edge-case tests for the r03 search-surface wave: multi-term rewrite
(wildcard/prefix/regexp), percolate msm boundaries, span semantics, and
the auto_date_histogram interval ladder."""

import pytest

from tests.conftest import SF_SMOKE


def test_multi_term_rewrite_empty_expansion(spark, built_index):
    """A pattern matching no dictionary term must return an EMPTY frame
    with the stable (doc_id, score) schema — not raise."""
    from pysearch import exec as pexec

    out = pexec.search_wildcard(built_index, "zzzz*")
    assert out.columns == ["doc_id", "score"]
    assert out.count() == 0


def test_prefix_equals_wildcard_star(spark, built_index):
    """prefix(p) must equal wildcard(p*) — same rewrite, sargable path."""
    from pysearch import exec as pexec

    a = sorted(r["doc_id"]
               for r in pexec.search_prefix(built_index, "s").collect())
    b = sorted(r["doc_id"]
               for r in pexec.search_wildcard(built_index, "s*").collect())
    assert a == b and len(a) > 0


def test_regexp_is_anchored(spark, built_index):
    """Lucene regexp matches the WHOLE term: pattern 'art' must NOT match
    'part' (substring) — only a term exactly equal to 'art'."""
    from pysearch import exec as pexec

    out = pexec.search_regexp(built_index, "art")
    assert out.count() == 0  # vocab has 'part' but no term 'art'
    out2 = pexec.search_regexp(built_index, ".*art.*")
    assert out2.count() > 0  # explicit dot-star does match 'part' docs


def test_percolate_msm_boundary(spark):
    """A doc matching exactly msm-1 of a rule's terms must NOT match the
    rule; msm of them must."""
    from pysearch import percolate

    out = percolate.q_percolate(spark, SF_SMOKE)
    rows = out.collect()
    # invariant from the operator contract, checked per returned row
    msm_by_qid = {qid: msm for qid, _, msm in percolate.PERC_QUERIES}
    assert len(rows) > 0
    for r in rows:
        assert r["n_matched"] >= msm_by_qid[r["query_id"]]


def test_span_near_symmetric_unordered(spark):
    """in_order=false: every matched pair is counted from the 'a' side;
    n_spans must be >= 1 and the doc set must contain every doc where the
    two terms are adjacent (slop 3 is a superset of slop 0 adjacency)."""
    from pysearch import span
    from pysearch.phrase import positions
    from pyspark.sql import functions as F

    out = {r["doc_id"] for r in span.q_span_near(spark, SF_SMOKE).collect()}
    p = positions(spark, SF_SMOKE)
    a = p.where(F.col("term") == span.SPAN_T0).alias("a")
    b = p.where(F.col("term") == span.SPAN_T1).alias("b")
    adj = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                  & (F.abs(F.col("a.pos") - F.col("b.pos")) == 1))
           .select(F.col("a.doc_id").alias("doc_id")).distinct())
    adjacent = {r["doc_id"] for r in adj.collect()}
    assert adjacent <= out


def test_auto_date_histogram_ladder():
    """The ladder walk must pick the smallest interval fitting the target
    for representative spans (pure-python check of the choice rule)."""
    from pysearch.aggs_ext import _ADH_LADDER, _ADH_TARGET

    def choose(mn, mx):
        return next((i for i in _ADH_LADDER
                     if mx // i - mn // i + 1 <= _ADH_TARGET),
                    _ADH_LADDER[-1])

    base = 1704067200  # 2024-01-01 UTC
    assert choose(base, base + 120) == 60            # 2-min span → 1m
    # 5h span: 30m gives 11 epoch-floored buckets (> target 10) → 1h
    assert choose(base, base + 3600 * 5) == 3600
    assert choose(base, base + 86400 * 30) == 604800  # 30d span → 7d
    assert choose(base, base + 86400 * 365) == 2592000  # 1y → 30d cap

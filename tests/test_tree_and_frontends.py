"""Round-2 surface: recursive bool trees, query_string mini-language,
multi_match, Porter stemmer, count-only path, vectorized block decode."""

import numpy as np
import pytest

from pysearch import analysis, codec
from pysearch import plan as pplan
from pysearch.analysis_ext import porter_stem

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# parser units (no Spark)
# ---------------------------------------------------------------------------


def test_parse_tree_nested_bool():
    node = pplan.parse_tree({
        "bool": {"must": [{"bool": {"should": [{"term": {"value": "a"}}]}}],
                 "must_not": [{"match": {"query": "bad stuff"}}]}})
    assert isinstance(node, pplan.BoolNode)
    assert isinstance(node.must[0], pplan.BoolNode)
    assert node.must[0].should[0].terms == ["a"]
    assert node.must_not[0].terms == ["bad", "stuff"]


def test_parse_query_string_clauses():
    n = pplan.parse_query_string('+merge sort -batch lang:en "hash join"')
    assert [c.terms for c in n.must] == [["merge"]]
    assert [c.terms for c in n.must_not] == [["batch"]]
    assert [(c.field, c.value) for c in n.filter] == [("lang", "en")]
    kinds = [type(c).__name__ for c in n.should]
    assert "MatchNode" in kinds and "PhraseNode" in kinds


def test_parse_query_string_and_operator():
    n = pplan.parse_query_string("merge AND sort window")
    assert sorted(c.terms[0] for c in n.must) == ["merge", "sort"]
    assert [c.terms for c in n.should] == [["window"]]


def test_parse_query_string_stopword_only_clause_dropped():
    n = pplan.parse_query_string("the merge")
    assert [c.terms for c in n.should] == [["merge"]]


# ---------------------------------------------------------------------------
# Porter stemmer vs the published in-paper examples
# ---------------------------------------------------------------------------

PORTER_PAPER_CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "oscillators": "oscil", "adoption": "adopt",
    "generalization": "gener",
}


def test_porter_paper_examples():
    bad = {w: (porter_stem(w), e)
           for w, e in PORTER_PAPER_CASES.items() if porter_stem(w) != e}
    assert not bad, bad


# ---------------------------------------------------------------------------
# vectorized multi-block decode == per-block decode
# ---------------------------------------------------------------------------


def test_decode_blocks_concat_roundtrip():
    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(10_000, size=700, replace=False))
    tfs = rng.integers(1, 50, size=700)
    dlb = codec.int_to_byte4(rng.integers(1, 5000, size=700))
    rows = codec.encode_blocks(doc_ids, tfs, dlb, 1.0, 100.0, 1.2, 0.75)
    ids2, tfs2, nrm2 = codec.decode_blocks_concat(
        [r["first_doc_id"] for r in rows], [r["docid_gaps"] for r in rows],
        [r["n_in_block"] for r in rows], [r["tfs_enc"] for r in rows],
        [r["norms_enc"] for r in rows])
    assert np.array_equal(ids2, doc_ids)
    assert np.array_equal(tfs2, tfs)
    assert np.array_equal(nrm2, dlb)


# ---------------------------------------------------------------------------
# Spark end-to-end semantics
# ---------------------------------------------------------------------------


def _exhaustive_bm25(oracle_index, terms):
    """doc_id -> summed BM25 using the brute-force oracle, full match set."""
    hits = oracle_index.search(terms, k=10**9)
    return {d: s for d, s in hits}


@pytest.fixture(scope="module")
def tree_index(built_index):
    return built_index


def test_search_tree_flat_matches_search(spark, tree_index):
    """A one-level bool tree must agree with the flat search path."""
    from pysearch import exec as pexec

    node = pplan.parse_tree({"bool": {"should": [
        {"term": {"value": "merge"}}, {"term": {"value": "sort"}}],
        "minimum_should_match": 1}})
    tree_hits = pexec.search_tree(tree_index, node, k=10).collect()
    flat_hits = pexec.search(tree_index, ["merge", "sort"], k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in tree_hits] == \
        [(r["doc_id"], round(r["score"], 9)) for r in flat_hits]


def test_search_tree_nested_semantics(spark, tree_index, oracle_index):
    """Nested bool: (merge OR sort) AND value, NOT batch — check the match
    set and scores against brute-force set algebra over the oracle."""
    from pysearch import exec as pexec

    node = pplan.parse_tree({
        "bool": {"must": [
            {"bool": {"should": [{"term": {"value": "merge"}},
                                 {"term": {"value": "sort"}}],
                      "minimum_should_match": 1}},
            {"term": {"value": "value"}}],
            "must_not": [{"term": {"value": "batch"}}]}})
    got = {r["doc_id"]: r["score"]
           for r in pexec.search_tree(tree_index, node, k=10**6).collect()}

    ms = _exhaustive_bm25(oracle_index, ["merge"])
    so = _exhaustive_bm25(oracle_index, ["sort"])
    va = _exhaustive_bm25(oracle_index, ["value"])
    ba = _exhaustive_bm25(oracle_index, ["batch"])
    inner = set(ms) | set(so)
    want_docs = (inner & set(va)) - set(ba)
    assert set(got) == want_docs
    for d in want_docs:
        want = ms.get(d, 0.0) + so.get(d, 0.0) + va[d]
        assert got[d] == pytest.approx(want, rel=1e-9)


def test_must_not_only_matches_complement(spark, tree_index, oracle_index):
    from pysearch import exec as pexec

    node = pplan.parse_tree({"bool": {"must_not": [{"term": {"value": "value"}}]}})
    got = {r["doc_id"] for r in pexec.search_tree(tree_index, node, k=10**6).collect()}
    va = set(_exhaustive_bm25(oracle_index, ["value"]))
    all_docs = {r["doc_id"] for r in tree_index.docs.select("doc_id").collect()}
    assert got == all_docs - va


def test_multi_match_best_fields(spark, tree_index):
    """best_fields == max + tb*rest over per-field scores; with one field
    it must equal the plain match score."""
    from pysearch import exec as pexec

    one = pexec.search_multi_match(
        {"content": tree_index}, "merge sort", k=10,
        match_type="best_fields", tie_breaker=0.3).collect()
    flat = pexec.search(tree_index, "merge sort", k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in one] == \
        [(r["doc_id"], round(r["score"], 9)) for r in flat]


def test_count_matches_or_and(spark, tree_index, oracle_index):
    from pysearch import exec as pexec

    ms = set(_exhaustive_bm25(oracle_index, ["merge"]))
    so = set(_exhaustive_bm25(oracle_index, ["sort"]))
    assert pexec.count_matches(tree_index, "merge sort") == len(ms | so)
    assert pexec.count_matches(tree_index, "merge sort", mode="and") == len(ms & so)


def test_check_order_is_never_green_then_sentinels():
    """Registration order is coverage policy (driver checks the first ~50
    keys). The self-maintaining invariant (r02 judge item 1): every key
    WITHOUT a green row in a committed CORRECTNESS_r*.json precedes every
    proven key, sentinels come immediately after, and the unproven set
    fits inside the driver's 50-row window."""
    import __spark_entry__ as em

    qs = em.queries()
    keys = list(qs)
    green, _ = em._green_keys()
    unproven = {k for k in qs if k not in green}
    assert set(keys[:len(unproven)]) == unproven, (
        "an unproven key is ordered after a proven one")
    assert len(unproven) <= 50, (
        f"{len(unproven)} unproven keys exceed the driver's 50-row window")
    sent = [k for k in em._SENTINELS if k in qs and k in green]
    assert keys[len(unproven):len(unproven) + len(sent)] == sent
    # every registered key must have an oracle (rows-only keys excepted
    # by name, none currently)
    sqls = em.oracle_sql()
    assert set(qs) - set(sqls) == set(), sorted(set(qs) - set(sqls))


def test_porter_golden_is_engine_independent():
    """The analyze_porter oracle is a HAND-FROZEN literal; this pins the
    engine to it so impl drift fails pytest before the driver round."""
    from pysearch.analysis_ext import PORTER_GOLDEN

    bad = {w: (porter_stem(w), s) for w, s in PORTER_GOLDEN.items()
           if porter_stem(w) != s}
    assert not bad, bad

"""Query-DSL parser + full bool query semantics."""

import pytest

from pysearch import plan as pplan

SF = "/root/testdata/sf0.001"


def test_parse_dsl_shapes():
    p = pplan.parse_dsl({"match": {"query": "mergeSort the window"}}, k=5)
    # camel split + stopword removal, OR semantics with msm=1
    assert p.should == ["merge", "sort", "window"]
    assert p.msm == 1 and p.k == 5

    p = pplan.parse_dsl({"bool": {
        "must": [{"term": {"value": "merge"}}],
        "should": [{"match": "sort window"}],
        "must_not": [{"term": "batch"}],
        "filter": [{"term": "value"}],
    }})
    assert p.must == ["merge"]
    assert sorted(p.should) == ["sort", "window"]
    assert p.must_not == ["batch"] and p.filter == ["value"]
    assert p.msm == 0  # must present -> should optional

    p = pplan.parse_dsl({"bool": {"should": [{"term": "a"}],
                                  "minimum_should_match": 2}})
    assert p.msm == 2


def test_parse_dsl_rejects_unknown():
    with pytest.raises(ValueError):
        pplan.parse_dsl({"fuzzy": {"value": "x"}})


def test_bool_full_semantics(spark, built_index):
    """Cross-check the DataFrame bool executor against a brute-force
    python evaluation over the corpus."""
    from pysearch import analysis, exec as pexec
    import pandas as pd
    import os

    pdf = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    toks = {int(r.doc_id): analysis.analyze(r.text) for r in pdf.itertuples()}

    plan = pplan.parse_dsl({"bool": {
        "must": [{"term": "merge"}],
        "should": [{"term": "sort"}],
        "must_not": [{"term": "batch"}],
        "filter": [{"term": "value"}],
    }}, k=1000)
    got = {r["doc_id"] for r in
           pexec.search_bool_full(built_index, plan).collect()}
    want = {d for d, ts in toks.items()
            if "merge" in ts and "value" in ts and "batch" not in ts}
    assert got == want

    plan2 = pplan.parse_dsl({"bool": {
        "should": [{"term": "merge"}, {"term": "sort"}, {"term": "window"}],
        "minimum_should_match": 2}}, k=1000)
    got2 = {r["doc_id"] for r in
            pexec.search_bool_full(built_index, plan2).collect()}
    want2 = {d for d, ts in toks.items()
             if sum(t in ts for t in ("merge", "sort", "window")) >= 2}
    assert got2 == want2


def test_bool_full_scores_sum_clauses(spark, built_index, oracle_index):
    """must+should scores must equal the brute-force BM25 sum of the
    scored clauses (filter contributes no score)."""
    from pysearch import exec as pexec

    plan = pplan.parse_dsl({"bool": {
        "must": [{"term": "merge"}],
        "should": [{"term": "sort"}],
        "filter": [{"term": "value"}],
    }}, k=10)
    hits = pexec.search_bool_full(built_index, plan).collect()
    assert hits
    expected: dict[int, float] = {}
    for term in ("merge", "sort"):
        for i, s in oracle_index.term_scores(term).items():
            did = int(oracle_index.doc_ids[i])
            expected[did] = expected.get(did, 0.0) + s
    for r in hits:
        assert abs(r["score"] - expected[r["doc_id"]]) < 1e-9

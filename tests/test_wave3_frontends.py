"""Unit tests for the wave-3 frontends: the x-pack SQL mini-parser, the
mustache template renderer, and the EQL as-of sequence semantics on a
hand-built frame (the oracle-parity of every registered key is covered
by test_driver_contract.test_all_driver_queries)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pysearch.frontends_x import _render_template, parse_xsql  # noqa: E402


def test_template_renders_params():
    out = _render_template("+{{a}} \"{{b}} {{c}}\"", {"a": "x", "b": "y",
                                                      "c": "z"})
    assert out == '+x "y z"'


def test_template_missing_param_raises():
    with pytest.raises(KeyError):
        _render_template("{{a}} {{missing}}", {"a": "x"})


def test_xsql_rejects_unsupported():
    with pytest.raises(ValueError):
        parse_xsql("DELETE FROM documents")
    with pytest.raises(ValueError):
        # bare column not in GROUP BY
        parse_xsql("SELECT lang, source FROM documents GROUP BY lang "
                   "ORDER BY lang LIMIT 5")
    with pytest.raises(ValueError):
        # MATCH() is bound to the indexed field
        parse_xsql("SELECT doc_id, SCORE() AS s FROM documents "
                   "WHERE MATCH(lang, 'en') ORDER BY SCORE() DESC LIMIT 5")


def test_xsql_group_by_translation(spark):
    """The relational shape drives DataFrame ops; cross-check against
    spark.sql on the same registered view (independent of DuckDB)."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        pytest.skip("testdata missing")
    q = ("SELECT lang, COUNT(*) AS n, ROUND(AVG(n_chars), 4) AS ac "
         "FROM documents WHERE n_chars >= 40 GROUP BY lang "
         "ORDER BY n DESC, lang ASC LIMIT 4")
    got = parse_xsql(q)(spark, sf).collect()
    spark.read.parquet(os.path.join(sf, "documents.parquet")) \
        .createOrReplaceTempView("documents")
    want = spark.sql(q).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_eql_sequence_is_asof_not_all_pairs(spark):
    """sequence [view][purchase]: a purchase pairs with the MOST RECENT
    preceding view only (SequenceMatcher semantics), and an intervening
    until-event kills the pair."""
    import datetime as dt

    import pysearch.eql as eql

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view(1) view(2) purchase(3): pairs with view 2, not 1
        (1, 1, t0 + dt.timedelta(minutes=1), "view", 0.0, "{}"),
        (2, 1, t0 + dt.timedelta(minutes=2), "view", 0.0, "{}"),
        (3, 1, t0 + dt.timedelta(minutes=3), "purchase", 0.0, "{}"),
        # user 2: view(4) error(5) purchase(6): until kills the pair
        (4, 2, t0 + dt.timedelta(minutes=1), "view", 0.0, "{}"),
        (5, 2, t0 + dt.timedelta(minutes=2), "error", 0.0, "{}"),
        (6, 2, t0 + dt.timedelta(minutes=3), "purchase", 0.0, "{}"),
        # user 3: view(7) ... purchase(8) outside maxspan (5h later)
        (7, 3, t0, "view", 0.0, "{}"),
        (8, 3, t0 + dt.timedelta(hours=5), "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, "
              "event_type string, value double, props string")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        seq = {(r.first_id, r.second_id)
               for r in eql.eql_sequence(spark, d).collect()}
        until = {(r.first_id, r.second_id)
                 for r in eql.eql_sequence_until(spark, d).collect()}
    assert seq == {(2, 3), (4, 6)}        # as-of: (1,3) absent; span: (7,8) absent
    assert until == {(2, 3)}              # error(5) kills (4,6)

"""Simulates the driver's CORRECTNESS gate: every __spark_entry__.queries()
entry at sf0.01 must match its oracle_sql() DuckDB result (row count,
column names, and order-insensitive values)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


# DuckDB result column types that the driver's value hash stringifies
# differently from the matching Spark type (HUGEINT/DECIMAL surface as
# floats): their presence is itself a failure — the oracle SQL must CAST.
_BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _tag(v):
    """Type-tagged canonical value. Mirrors the driver hash semantics:
    364 (BIGINT) and 364.0 (DOUBLE) must NOT compare equal — r01's
    pipe_cumsum failed in the driver while the old `==`-based mirror
    stayed green (VERDICT r01 'What's wrong' #2)."""
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        v = round(v, 9) + 0.0  # +0.0 folds -0.0 into 0.0
        return f"f:{v!r}"
    return f"{type(v).__name__}:{v!r}"


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            vals.append(_tag(v))
        out.append(tuple(vals))
    return sorted(out)


def _compare_one(spark, ddb, name, qfn, sql):
    sdf = qfn(spark, SF)
    cols = sorted(sdf.columns)
    srows = [r.asDict() for r in sdf.collect()]
    ores = ddb.sql(sql)
    ocols = sorted(ores.columns)
    for cname, ctype in zip(ores.columns, ores.types):
        ts = str(ctype)
        assert not any(bad in ts for bad in _BAD_ORACLE_TYPES), (
            f"{name}: oracle column {cname} has type {ts} — the driver "
            f"hashes it as float while Spark emits int; add an explicit "
            f"CAST in the oracle SQL")
    orows = [dict(zip(ores.columns, t)) for t in ores.fetchall()]
    assert cols == ocols, f"{name}: columns {cols} vs oracle {ocols}"
    assert len(srows) == len(orows), f"{name}: {len(srows)} rows vs {len(orows)}"
    assert _norm(srows, cols) == _norm(orows, cols), f"{name}: value mismatch"


def test_all_driver_queries(spark, ddb):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    failures = []
    for name, qfn in qs.items():
        if name not in sqls:
            continue
        try:
            _compare_one(spark, ddb, name, qfn, sqls[name])
        except AssertionError as e:
            failures.append(str(e))
    assert not failures, "\n".join(failures)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns

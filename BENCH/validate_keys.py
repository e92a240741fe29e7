"""Validate selected __spark_entry__ keys against their DuckDB oracles at
sf0.01 — the same comparison the driver's CORRECTNESS gate runs (and the
same helpers tests/test_driver_contract.py uses), for fast per-key
iteration without the full pytest suite.

Usage: python BENCH/validate_keys.py q_wildcard q_prefix [...]
       python BENCH/validate_keys.py --all        # every key (slow)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb  # noqa: E402

from test_driver_contract import SF, TABLES, _compare_one  # noqa: E402


def main(argv):
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pysearch.session import get_spark

    spark = get_spark(cores=8, app="validate-keys", shuffle_partitions=8)
    ddb = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            ddb.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as em

    qs, sqls = em.queries(), em.oracle_sql()
    keys = list(qs) if argv == ["--all"] else argv
    failures = []
    for name in keys:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failures.append(name)
            continue
        t0 = time.time()
        try:
            if name in sqls:
                _compare_one(spark, ddb, name, qs[name], sqls[name])
                print(f"{name}: OK ({time.time() - t0:.1f}s)")
            else:
                n = qs[name](spark, SF).count()
                print(f"{name}: rows-only, {n} rows ({time.time() - t0:.1f}s)")
        except Exception as e:
            print(f"{name}: FAIL — {e}")
            failures.append(name)
    print(f"\n{len(keys) - len(failures)}/{len(keys)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""Capture executed-plan evidence for PLANS.md — runs selected driver
keys at sf0.01 and prints the load-bearing plan facts the audit checks:
scan targets, partition filters, join strategies, cache hits, and
whether any corpus re-tokenize (a FileScan of documents.parquet with a
tokenizer DataFilter) appears as LIVE work.

Why a tree walk instead of grepping the plan string: Spark prints
`InMemoryTableScan` nodes with the full textual plan of the relation
they CACHED (at fresh indentation), so substring checks on
`executedPlan().toString()` report "FileScan documents.parquet" and
"regexp_replace" for plans that actually read the persisted postings
cache and never touch the corpus. In the physical-plan TREE, however,
InMemoryTableScan is a LEAF — the cached lineage is not a child — so
walking node objects yields exactly the live operators.

Usage: python BENCH/capture_plans.py q_span_multi q_pinned ...
"""

import sys

sys.path.insert(0, "/root/repo")

INTERESTING = ("Scan parquet", "FileScan", "InMemoryTableScan",
               "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "TakeOrderedAndProject",
               "MapInPandas", "FlatMapGroupsInPandas", "Exchange")


def _children(node):
    out = []
    seq = node.children()
    for i in range(seq.length()):
        out.append(seq.apply(i))
    # AQE wrapper nodes keep the real plan out of children()
    for meth in ("executedPlan", "finalPhysicalPlan", "plan"):
        if seq.length() == 0 and hasattr(node, meth):
            try:
                out.append(getattr(node, meth)())
                break
            except Exception:
                pass
    return out


def live_nodes(root):
    """All live physical operators: depth-first, never descending into
    an InMemoryTableScan (its cached lineage is dormant, not work)."""
    out, stack = [], [root]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        out.append((name, node.simpleString(250)))
        if name == "InMemoryTableScan":
            continue
        stack.extend(_children(node))
    return out


def main(argv):
    from pysearch.session import get_spark

    spark = get_spark(cores=8, app="capture-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    for name in argv:
        df = qs[name](spark, "/root/testdata/sf0.01")
        df.collect()  # make AQE final plans real
        nodes = live_nodes(df._jdf.queryExecution().executedPlan())
        scans = [s for n, s in nodes if n in ("Scan parquet", "FileScan")
                 or s.lstrip("*(0123456789) ").startswith("FileScan")]
        doc_scans = [s for s in scans if "documents" in s]
        tokenizing = [s for s in doc_scans if "regexp_replace" in s]
        print(f"\n===== {name} =====")
        print("live nodes:", len(nodes),
              "| cache hits:", sum(n == "InMemoryTableScan" for n, _ in nodes))
        print("LIVE documents scans:", len(doc_scans),
              "| of which re-tokenize:", len(tokenizing))
        for n, s in nodes:
            if any(f in n or f in s[:60] for f in INTERESTING):
                print("  ", s[:230])


if __name__ == "__main__":
    main(sys.argv[1:])

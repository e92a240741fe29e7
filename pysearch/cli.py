"""spark-submit entrypoints (north_star: "submitted via spark-submit
--py-files"). Ship the package as a zip and drive build / query / merge
from the command line:

    zip -r pysearch.zip pysearch
    spark-submit --py-files pysearch.zip cli_entry.py build \\
        --corpus /data/corpus.parquet --out /data/index/seg-000
    spark-submit --py-files pysearch.zip cli_entry.py query \\
        --index /data/index/seg-000 --text "parseHttpRequest" --k 10
    spark-submit --py-files pysearch.zip cli_entry.py merge \\
        --segments /data/index/seg-000 /data/index/seg-001 \\
        --out /data/index/seg-merged

(spark-submit takes an application FILE, not a -m module — cli_entry.py at
the repo root is that file; it just calls pysearch.cli.main().)

On a cluster the session comes from spark-submit's conf (master, executor
counts); get_spark() only fills local-mode defaults when none exists.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    return get_spark(cores=args.cores)


def cmd_build(args) -> None:
    from . import build as pbuild

    spark = _spark(args)
    if args.corpus.endswith(".parquet") or "/" in args.corpus:
        corpus = spark.read.parquet(args.corpus)
    else:
        corpus = spark.table(args.corpus)
    if "doc_id" not in corpus.columns:
        corpus = pbuild.with_doc_ids(corpus)
    idx = pbuild.build_index(
        spark, corpus, n_buckets=args.buckets,
        salt_threshold=args.salt_threshold, n_salts=args.salts)
    manifest = pbuild.write_index(idx, args.out, resume=not args.no_resume)
    cached = getattr(corpus, "_pysearch_cached", None)
    if cached is not None:  # doc_id assignment is committed to parquet now
        cached.unpersist()
    print(json.dumps(manifest))


def cmd_query(args) -> None:
    from . import build as pbuild
    from . import exec as pexec

    spark = _spark(args)
    idx = pbuild.load_index(spark, args.index)
    hits = pexec.search(idx, args.text, k=args.k, mode=args.mode)
    rows = [r.asDict() for r in (pexec.fetch(idx, hits).collect()
                                 if args.fetch else hits.collect())]
    print(json.dumps(rows, default=str))


def cmd_merge(args) -> None:
    from . import build as pbuild
    from . import merge as pmerge

    spark = _spark(args)
    idxs = [pbuild.load_index(spark, p) for p in args.segments]
    merged = pmerge.merge_indexes(spark, idxs)
    manifest = pbuild.write_index(merged, args.out, resume=False)
    print(json.dumps(manifest))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="pysearch")
    p.add_argument("--cores", type=int, default=None,
                   help="local[] cores when no cluster session exists")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="corpus parquet/table -> index segment")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--salt-threshold", type=int, default=4096)
    b.add_argument("--salts", type=int, default=8)
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="top-k BM25 search over a segment")
    q.add_argument("--index", required=True)
    q.add_argument("--text", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", choices=("or", "and"), default="or")
    q.add_argument("--fetch", action="store_true",
                   help="run the fetch phase (join winners to docs)")
    q.set_defaults(fn=cmd_query)

    m = sub.add_parser("merge", help="merge segments into one")
    m.add_argument("--segments", nargs="+", required=True)
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_merge)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])

"""Deterministic synthetic source-code corpus (FIXTURES.md §1 shape).

Generates corpus(repo, path, commit, lang, content) + doc_id rows fully
determined by doc_id (seeded per row — no RNG state shared across
partitions, so any partitioning/parallelism yields identical data).
Identifier vocabulary is Zipf-distributed (α≈1.1) over ~5k stems so hot
terms exist (exercises skew salting); idents mix camelCase and snake_case
(exercises the code-aware analyzer). Used for benchmarks and property
tests; the driver's documents.parquet stays the correctness corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np

_SEED = 42
_N_STEMS = 5000
_ZIPF_ALPHA = 1.1

_SYLLABLES = [
    "get", "set", "read", "write", "parse", "load", "store", "merge", "split",
    "hash", "index", "query", "scan", "sort", "flush", "batch", "chunk",
    "node", "tree", "list", "map", "key", "val", "buf", "str", "num", "ctx",
    "req", "res", "conn", "pool", "lock", "sync", "async", "task", "job",
    "file", "path", "dir", "meta", "stat", "count", "total", "part", "seg",
]

_KEYWORDS = ["def", "return", "class", "import", "from", "while", "for",
             "break", "continue", "try", "except", "raise", "yield", "lambda"]

_LANGS = [("py", "python"), ("java", "java"), ("go", "go"),
          ("rs", "rust"), ("md", "markdown")]


def _make_stems() -> list[str]:
    rng = np.random.default_rng(_SEED)
    stems = []
    for i in range(_N_STEMS):
        n = rng.integers(1, 3)
        parts = [(_SYLLABLES[int(rng.integers(0, len(_SYLLABLES)))]) for _ in range(n)]
        stems.append("".join(parts) + (str(int(rng.integers(0, 100))) if rng.random() < 0.15 else ""))
    return stems


_STEMS = _make_stems()
_ZIPF_CDF = np.cumsum(1.0 / np.arange(1, _N_STEMS + 1) ** _ZIPF_ALPHA)
_ZIPF_CDF /= _ZIPF_CDF[-1]


def _ident(rng) -> str:
    k = int(rng.integers(1, 4))
    stems = [_STEMS[int(np.searchsorted(_ZIPF_CDF, rng.random()))] for _ in range(k)]
    if rng.random() < 0.5:  # snake_case
        return "_".join(stems)
    return stems[0] + "".join(s.capitalize() for s in stems[1:])  # camelCase


def gen_doc(doc_id: int, min_lines: int = 10, max_lines: int = 60) -> dict:
    # intended uint64 wraparound for the seed mix — reduce in Python int
    # space (mod 2^64) so numpy never sees an overflowing scalar multiply
    seed = (doc_id * 0x9E3779B97F4A7C15 + _SEED) % (1 << 64)
    rng = np.random.default_rng(np.uint64(seed))
    n_lines = int(rng.integers(min_lines, max_lines + 1))
    lines = []
    for _ in range(n_lines):
        kw = _KEYWORDS[int(rng.integers(0, len(_KEYWORDS)))]
        a, b_, c = _ident(rng), _ident(rng), _ident(rng)
        form = rng.integers(0, 4)
        if form == 0:
            lines.append(f"{kw} {a}({b_}, {c}={int(rng.integers(0, 1000))}):")
        elif form == 1:
            lines.append(f"    {a} = {b_}.{c}({int(rng.integers(0, 100))})")
        elif form == 2:
            lines.append(f"    if {a} and not {b_}: return {c}")
        else:
            lines.append(f"    # {a} {b_} {c}")
    repo = f"org{doc_id % 7}/proj{doc_id % 23}"
    ext, lang = _LANGS[doc_id % len(_LANGS)]
    path = f"src/pkg{doc_id % 101}/m{doc_id}.{ext}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
    return {"doc_id": doc_id, "repo": repo, "path": path, "commit": commit,
            "lang": lang, "content": "\n".join(lines)}


def synthetic_corpus(spark, n_docs: int, n_partitions: int = 32,
                     min_lines: int = 10, max_lines: int = 60):
    """Distributed deterministic generation via mapInPandas."""
    base = spark.range(0, n_docs, numPartitions=n_partitions)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = [gen_doc(int(i), min_lines, max_lines) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    schema = ("doc_id long, repo string, path string, commit string, "
              "lang string, content string")
    return base.mapInPandas(gen, schema=schema)

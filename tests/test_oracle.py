"""Oracle sanity: hand-computed BM25 values (Lucene-8 form, SURVEY §8)."""

import math

import numpy as np

from pysearch import codec
from pysearch.oracle import BruteForceIndex


def test_bm25_hand_computed():
    # 3 docs; term "merge" in docs 0 (tf=2, dl=4) and 2 (tf=1, dl=2)
    docs = {
        10: "merge sort merge batch",
        11: "scan filter join",
        12: "merge window",
    }
    idx = BruteForceIndex(list(docs), list(docs.values()))
    n, df = 3, 2
    avgdl = (4 + 3 + 2) / 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    # dl < 24 -> quantization is identity
    s10 = idf * 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 4 / avgdl))
    s12 = idf * 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / avgdl))
    got = idx.search(["merge"], k=10)
    assert [d for d, _ in got] == [10, 12]
    assert np.isclose(got[0][1], s10, rtol=1e-12)
    assert np.isclose(got[1][1], s12, rtol=1e-12)


def test_no_k1_plus_1_numerator():
    # tf=1, dl=avgdl (all docs same length) -> weight = 1/(1+k1), NOT (k1+1)/(1+k1)
    idx = BruteForceIndex([1, 2], ["alpha beta", "gamma delta"])
    got = idx.search(["alpha"], k=1)
    idf = math.log(1 + (2 - 1 + 0.5) / 1.5)
    assert np.isclose(got[0][1], idf * 1 / (1 + 1.2), rtol=1e-12)


def test_and_or_modes_and_ties():
    docs = {
        1: "alpha beta",
        2: "alpha beta",   # exact duplicate -> tie, broken by doc_id asc
        3: "alpha gamma",
        4: "delta",
    }
    idx = BruteForceIndex(list(docs), list(docs.values()))
    both = idx.search(["alpha", "beta"], k=10, mode="and")
    assert [d for d, _ in both] == [1, 2]
    assert both[0][1] == both[1][1]
    any_ = idx.search(["alpha", "beta"], k=10, mode="or")
    assert [d for d, _ in any_] == [1, 2, 3]
    assert idx.search(["nosuchterm"], k=5) == []
    assert idx.search([], k=5) == []


def test_quantized_dl_used():
    # long doc: dl=40 quantizes to 40? (subnormal region extends to 24+8=32;
    # above that, 4-bit mantissa). Verify oracle scores with quantize_dl(dl).
    long_doc = " ".join(f"tok{i} filler" for i in range(40)) + " needle"
    idx = BruteForceIndex([1, 2], [long_doc, "needle short"])
    dl1 = len(long_doc.split()) + 40  # tokN -> tok N splits: just sanity > 32
    got = dict(idx.search(["needle"], k=2))
    dlq = float(codec.quantize_dl(np.array([idx.dl[0]]))[0])
    idf = math.log(1 + (2 - 2 + 0.5) / 2.5)
    expect = idf * 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * dlq / idx.avgdl))
    assert np.isclose(got[1], expect, rtol=1e-12)
    assert dlq != idx.dl[0]  # quantization actually kicked in

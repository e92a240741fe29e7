"""Unit tests: posting codec + SmallFloat norms (SURVEY §5.1)."""

import numpy as np
import pytest

from pysearch import codec


RNG = np.random.default_rng(42)


def test_varint_roundtrip_small():
    for vals in ([], [0], [1], [127], [128], [300], [0, 0, 7]):
        arr = np.array(vals, dtype=np.uint64)
        assert decoded_eq(arr)


def decoded_eq(arr):
    buf = codec.encode_varint(arr)
    out = codec.decode_varint(buf, len(arr))
    return np.array_equal(out, arr)


def test_varint_roundtrip_random():
    for _ in range(20):
        n = int(RNG.integers(1, 5000))
        # mix of magnitudes incl >32-bit
        arr = (RNG.integers(0, 2**62, size=n).astype(np.uint64)
               >> RNG.integers(0, 60, size=n).astype(np.uint64))
        assert decoded_eq(arr)


def test_varint_single_byte_density():
    arr = np.arange(128, dtype=np.uint64)
    assert len(codec.encode_varint(arr)) == 128


def test_gaps_roundtrip():
    for _ in range(10):
        n = int(RNG.integers(1, 2000))
        ids = np.sort(RNG.choice(10**9, size=n, replace=False)).astype(np.int64)
        first, buf = codec.encode_gaps(ids)
        out = codec.decode_gaps(first, buf)
        assert np.array_equal(out, ids)


def test_smallfloat_constants():
    # Lucene SmallFloat: MAX_INT4 = longToInt4(Integer.MAX_VALUE) = 231
    assert codec.MAX_INT4 == 231
    assert codec.NUM_FREE_VALUES == 24


def test_byte4_golden_values():
    # below NUM_FREE_VALUES: identity
    x = np.arange(24)
    assert np.array_equal(codec.int_to_byte4(x), x.astype(np.uint8))
    assert np.array_equal(codec.byte4_to_int(x), x)
    # known quantization points (x-24 in subnormal range up to 31 stays exact)
    exact = np.arange(0, 40)
    q = codec.quantize_dl(exact)
    assert np.array_equal(q[:32], exact[:32])
    # 4 significant bits above that
    assert codec.quantize_dl(np.array([1000]))[0] <= 1000
    assert codec.quantize_dl(np.array([2**30]))[0] <= 2**30


def test_byte4_monotonic_and_idempotent():
    x = np.unique(RNG.integers(0, 2**31 - 1, size=20000).astype(np.int64))
    x = np.sort(np.concatenate([x, np.arange(300)]))
    enc = codec.int_to_byte4(x)
    assert np.all(np.diff(enc.astype(np.int64)) >= 0)  # monotone
    dec = codec.byte4_to_int(enc)
    assert np.all(dec <= x)  # truncation, never rounds up
    # idempotent: quantize(quantize(x)) == quantize(x)
    assert np.array_equal(codec.quantize_dl(dec), dec)
    # representative is exactly representable: byte4(dec) == enc
    assert np.array_equal(codec.int_to_byte4(dec), enc)


def test_byte4_all_bytes_decode_strictly_increasing():
    allb = np.arange(256)
    dec = codec.byte4_to_int(allb)
    assert np.all(np.diff(dec) > 0)
    assert dec[0] == 0
    assert dec[255] == codec.byte4_to_int(np.array([255]))[0]


def test_duckdb_dlq_expr_parity():
    duckdb = pytest.importorskip("duckdb")
    xs = np.unique(np.concatenate([
        np.arange(0, 2048),
        2 ** np.arange(11, 31),
        2 ** np.arange(11, 31) - 1,
        2 ** np.arange(11, 31) + 1,
        RNG.integers(0, 2**31 - 1, size=5000),
    ])).astype(np.int64)
    expect = codec.quantize_dl(xs)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"dl": xs}))
    got = con.sql(
        f"SELECT {codec.duckdb_dlq_expr('dl')} AS q FROM t ORDER BY dl"
    ).fetchnumpy()["q"].astype(np.int64)
    assert np.array_equal(got, expect)


def test_encode_blocks_roundtrip_and_maxscore():
    n = 1000
    ids = np.sort(RNG.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = RNG.integers(1, 50, size=n).astype(np.int64)
    dl_bytes = codec.int_to_byte4(RNG.integers(1, 5000, size=n).astype(np.int64))
    idf, avgdl = 2.5, 120.0
    rows = codec.encode_blocks(ids, tfs, dl_bytes, idf, avgdl, 1.2, 0.75)
    assert sum(r["n_in_block"] for r in rows) == n
    assert len(rows) == int(np.ceil(n / codec.BLOCK_SIZE))
    got_ids, got_tfs, off = [], [], 0
    for r in rows:
        d, t, nb = codec.decode_block(
            r["first_doc_id"], r["docid_gaps"], r["tfs_enc"], r["norms_enc"])
        assert len(d) == r["n_in_block"]
        assert t.max() == r["block_max_tf"]
        assert np.array_equal(nb, dl_bytes[off:off + len(d)])
        scores = idf * codec.bm25_tf_weight(
            t, codec.byte4_to_int(nb), avgdl, 1.2, 0.75)
        assert np.isclose(scores.max(), r["block_max_score"])
        got_ids.append(d); got_tfs.append(t); off += len(d)
    assert np.array_equal(np.concatenate(got_ids), ids)
    assert np.array_equal(np.concatenate(got_tfs), tfs)

"""Posting-list codec + doc-length norm quantization (pure numpy, no Spark).

Models the reference's Lucene posting format semantics in numpy:
  - docID delta ("gap") encoding + varint byte packing
    [lucene dep] org.apache.lucene.codecs.lucene84.Lucene84PostingsWriter,
    ForUtil (we use varint for both block body and tail; block framing is
    128 docs with per-block max metadata, SURVEY §2.3 `postings_encode`)
  - SmallFloat 4-bit-mantissa doc-length quantization (norms)
    [lucene dep] org.apache.lucene.util.SmallFloat#intToByte4/#byte4ToInt
    (exact port — golden vectors in tests; SURVEY §8.3)

Everything is vectorized: the only Python loops are over byte-position
(<=10 iterations) — never over rows.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # docs per posting block (Lucene's ForUtil block size)

# ---------------------------------------------------------------------------
# varint
# ---------------------------------------------------------------------------


def varint_bytes_per_value(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value: 1 + #(2^(7k) thresholds crossed)."""
    v = np.asarray(values, dtype=np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nb


def encode_varint_array(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128 varint: returns (byte_array uint8, nb per value).
    The nb array lets callers slice the stream at value boundaries."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nb = varint_bytes_per_value(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(10):
        mask = nb > k
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = np.where(nb[mask] > k + 1, 0x80, 0).astype(np.uint8)
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out, nb


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-style varint encode of a non-negative int array (vectorized)."""
    out, _ = encode_varint_array(values)
    return out.tobytes()


def decode_varint(buf: bytes, n: int | None = None) -> np.ndarray:
    """Inverse of encode_varint -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(len(ends), dtype=np.uint64)
    for k in range(10):
        mask = starts + k <= ends
        if not mask.any():
            break
        out[mask] |= (b[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    if n is not None and len(out) != n:
        raise ValueError(f"decoded {len(out)} values, expected {n}")
    return out


def encode_gaps(doc_ids: np.ndarray) -> tuple[int, bytes]:
    """Sorted doc_ids -> (first_doc_id, varint(deltas)). deltas[0] is 0."""
    d = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.diff(d, prepend=d[0] if d.size else 0)
    return (int(d[0]) if d.size else 0, encode_varint(gaps.astype(np.uint64)))


def decode_gaps(first_doc_id: int, buf: bytes) -> np.ndarray:
    gaps = decode_varint(buf).astype(np.int64)
    if gaps.size == 0:
        return gaps
    gaps[0] = first_doc_id
    return np.cumsum(gaps)


# ---------------------------------------------------------------------------
# SmallFloat norms (exact port of Lucene SmallFloat int4/byte4 family)
# ---------------------------------------------------------------------------


def _long_to_int4(x: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat#longToInt4: keep 4 significant bits."""
    x = np.asarray(x, dtype=np.int64)
    if (x < 0).any():
        raise ValueError("longToInt4 requires non-negative input")
    # bit length via frexp (exact for x < 2^53; doc lengths are < 2^31)
    num_bits = np.frexp(x.astype(np.float64))[1]  # 0 -> 0, else floor(log2)+1
    shift = np.maximum(num_bits - 4, 0)
    encoded = ((x >> shift) & 0x07) | ((shift + 1) << 3)
    return np.where(num_bits < 4, x, encoded)


def _int4_to_long(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    bits = v & 0x07
    shift = (v >> 3) - 1
    normal = (bits | 0x08) << np.maximum(shift, 0)
    return np.where(shift == -1, bits, normal)


MAX_INT4 = int(_long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24, asserted in tests


def int_to_byte4(x: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat#intToByte4: int doc length -> 1 unsigned byte."""
    x = np.asarray(x, dtype=np.int64)
    if (x < 0).any():
        raise ValueError("intToByte4 requires non-negative input")
    enc = NUM_FREE_VALUES + _long_to_int4(np.maximum(x - NUM_FREE_VALUES, 0))
    return np.where(x < NUM_FREE_VALUES, x, enc).astype(np.uint8)


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat#byte4ToInt: quantized byte -> representative length."""
    v = np.asarray(b).astype(np.int64) & 0xFF
    dec = NUM_FREE_VALUES + _int4_to_long(np.maximum(v - NUM_FREE_VALUES, 0))
    return np.where(v < NUM_FREE_VALUES, v, dec)


def quantize_dl(dl: np.ndarray) -> np.ndarray:
    """dl -> the quantized length BM25 actually scores with (byte4 round trip)."""
    return byte4_to_int(int_to_byte4(dl))


def duckdb_dlq_expr(dl_col: str) -> str:
    """DuckDB SQL expression algebraically equal to quantize_dl(dl_col).

    For x = dl - 24 >= 8:  nb = floor(log2(x)) + 1, shift = nb - 4,
    quantized = 24 + ((x >> shift) << shift)   [top-4-bit truncation].
    Used by the driver oracle so DuckDB scores match engine scores exactly.
    """
    x = f"({dl_col} - {NUM_FREE_VALUES})"
    sh = f"(CAST(floor(log2({x})) AS INT) - 3)"
    return (
        f"(CASE WHEN {dl_col} < {NUM_FREE_VALUES + 8} THEN {dl_col} "
        f"ELSE {NUM_FREE_VALUES} + (({x} >> {sh}) << {sh}) END)"
    )


def spark_byte4_sql(dl_col: str) -> str:
    """Spark SQL expression equal to int_to_byte4(dl_col) (JVM-side, codegen)."""
    x = f"({dl_col} - {NUM_FREE_VALUES})"
    sh = f"(CAST(floor(log2({x})) AS INT) - 3)"
    return (
        f"(CASE WHEN {dl_col} < {NUM_FREE_VALUES + 8} THEN {dl_col} "
        f"ELSE {NUM_FREE_VALUES} + shiftleft({sh} + 1, 3) + (shiftright({x}, {sh}) & 7) END)"
    )


def spark_dlq_sql(dl_col: str) -> str:
    """Spark SQL expression equal to quantize_dl(dl_col) (JVM-side, codegen)."""
    x = f"({dl_col} - {NUM_FREE_VALUES})"
    sh = f"(CAST(floor(log2({x})) AS INT) - 3)"
    return (
        f"(CASE WHEN {dl_col} < {NUM_FREE_VALUES + 8} THEN {dl_col} "
        f"ELSE {NUM_FREE_VALUES} + shiftleft(shiftright({x}, {sh}), {sh}) END)"
    )


# ---------------------------------------------------------------------------
# Block framing: one posting row per <=128-doc block
# ---------------------------------------------------------------------------


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dl_bytes: np.ndarray,
    idf: float,
    avgdl: float,
    k1: float,
    b: float,
):
    """Split one term's postings into BLOCK_SIZE blocks (sorted by doc_id).

    Each block stores the Lucene-style (freq, norm) impact data — tf varints
    plus raw 1-byte/doc SmallFloat norms — so query-time scoring needs only
    the block + broadcast collection stats. Returns list of dict rows:
      block_id, n_in_block, first_doc_id, docid_gaps, tfs_enc, norms_enc,
      block_max_tf, block_max_score
    block_max_score is the exact max BM25 contribution within the block
    (impacts analog: [lucene dep] CompetitiveImpactAccumulator) — used by
    query-time block-max WAND/MAXSCORE pruning.
    """
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    dl_bytes = np.asarray(dl_bytes).astype(np.uint8)[order]
    dlq = byte4_to_int(dl_bytes)
    scores = bm25_tf_weight(tfs, dlq, avgdl, k1, b) * idf
    n = len(doc_ids)
    if n == 0:
        return []

    # --- fully vectorized across blocks (the per-block python loop was the
    # hot spot of the whole build: ~0.4 ms × n_postings/128 iterations) ---
    starts = np.arange(0, n, BLOCK_SIZE)
    ends = np.minimum(starts + BLOCK_SIZE, n)
    # gaps with a 0 reset at each block start (first_doc_id is stored
    # separately; decode_gaps re-seeds gaps[0] with it)
    gaps = np.diff(doc_ids, prepend=doc_ids[0])
    gaps[starts] = 0
    gap_stream, gap_nb = encode_varint_array(gaps.astype(np.uint64))
    tf_stream, tf_nb = encode_varint_array(tfs.astype(np.uint64))
    gap_off = np.concatenate(([0], np.cumsum(gap_nb)))
    tf_off = np.concatenate(([0], np.cumsum(tf_nb)))
    gap_b = gap_stream.tobytes()
    tf_b = tf_stream.tobytes()
    norm_b = dl_bytes.tobytes()
    max_tf = np.maximum.reduceat(tfs, starts)
    max_sc = np.maximum.reduceat(scores, starts)

    rows = []
    for blk in range(len(starts)):
        lo, hi = int(starts[blk]), int(ends[blk])
        rows.append(
            {
                "block_id": blk,
                "n_in_block": hi - lo,
                "first_doc_id": int(doc_ids[lo]),
                "docid_gaps": gap_b[gap_off[lo]:gap_off[hi]],
                "tfs_enc": tf_b[tf_off[lo]:tf_off[hi]],
                "norms_enc": norm_b[lo:hi],
                "block_max_tf": int(max_tf[blk]),
                "block_max_score": float(max_sc[blk]),
            }
        )
    return rows


def decode_blocks_concat(firsts, gaps_list, counts, tfs_list=None, norms_list=None):
    """Vectorized decode of MANY block rows at once: one varint pass over
    the concatenated gap (and tf) buffers instead of a Python loop per
    block row (the r01 hot path: 10^6 block rows for a hot term = 10^6
    Python iterations). `counts` = n_in_block per row.

    Returns (doc_ids, tfs, norms) concatenated in row order; tfs/norms are
    None when their buffers are not passed. Per-row cumsum reset uses the
    standard global-cumsum-minus-row-base trick — no loops."""
    counts = np.asarray(counts, dtype=np.int64)
    n_total = int(counts.sum())
    if n_total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, (z.copy() if tfs_list is not None else None), \
            (z.copy() if norms_list is not None else None)
    gaps = decode_varint(b"".join(bytes(g) for g in gaps_list), n_total).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    gaps[offs] = np.asarray(firsts, dtype=np.int64)
    cs = np.cumsum(gaps)
    base = cs[offs] - gaps[offs]
    doc_ids = cs - np.repeat(base, counts)
    tfs = None
    if tfs_list is not None:
        tfs = decode_varint(b"".join(bytes(t) for t in tfs_list), n_total).astype(np.int64)
    norms = None
    if norms_list is not None:
        norms = np.frombuffer(b"".join(bytes(nb) for nb in norms_list), dtype=np.uint8)
    return doc_ids, tfs, norms


def decode_block(first_doc_id: int, gaps: bytes, tfs_enc: bytes, norms_enc: bytes = b""):
    doc_ids = decode_gaps(first_doc_id, gaps)
    tfs = decode_varint(tfs_enc).astype(np.int64)
    norms = np.frombuffer(norms_enc, dtype=np.uint8)
    return doc_ids, tfs, norms


def bm25_tf_weight(tf, dlq, avgdl: float, k1: float, b: float):
    """Lucene-8 BM25 tf normalization: tf / (tf + k1*(1 - b + b*dlq/avgdl)).

    NO (k1+1) numerator (LUCENE-8563; SURVEY §8.1). float64 throughout.
    """
    tf = np.asarray(tf, dtype=np.float64)
    dlq = np.asarray(dlq, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dlq / avgdl))


def bm25_idf(df, n_docs: int):
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (SURVEY §8.2)."""
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

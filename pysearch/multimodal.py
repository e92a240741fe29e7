"""Multimodal-column plumbing for training-data pipelines (driver brief).

Images/audio/video are opaque BINARY payloads + typed metadata. The
container has no decode libs (PIL/av), so the image decode path ships
its own pure-numpy codecs (binary PPM/P6 and uncompressed 24-bit BMP —
encode + decode, round-trip-tested); r05 removed the former
NotImplementedError stub. Everything Spark-side is REAL and tested:
schema, binary handling, Arrow batch shape, mapInPandas signature,
partitioning. The driver testdata has no binary column, so payloads are
synthesized deterministically (text bytes for mm_meta/mm_decode_features,
real encoded image files for mm_decode_image), which lets every UDF path
be cross-checked against a SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}

MM_SCHEMA = "doc_id long, n_bytes int, head_hex string, payload_sha string"
FEAT_SCHEMA = "doc_id long, n_bytes int, sum_bytes long, max_byte int"


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


def payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload BINARY, meta STRUCT) — the canonical multimodal
    table shape: opaque bytes + typed metadata columns."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("int").alias("declared_size"),
            F.col("lang").alias("lang"),
        ).alias("meta"))


@_reg("mm_meta", """
SELECT doc_id,
       CAST(len(text) AS INT) AS n_bytes,
       hex(encode(substring(text, 1, 4))) AS head_hex,
       sha256(text) AS payload_sha
FROM documents ORDER BY doc_id""")
def mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-level metadata extraction from the binary payload — pure
    Catalyst (no decode): byte length, magic-bytes hex, content sha256.
    This is the 'cheap pass' a pipeline runs before any real decode."""
    p = payloads(spark, sf_dir)
    return (p.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.hex(F.encode(F.expr("substring(decode(payload, 'UTF-8'), 1, 4)"),
                       "UTF-8")).alias("head_hex"),
        F.sha2("payload", 256).alias("payload_sha"))
        .orderBy("doc_id"))


@_reg("mm_decode_features", """
WITH bytes AS (
  SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) AS b
  FROM documents, unnest(range(1, len(text) + 1)) AS u(i)
)
SELECT doc_id, CAST(count(*) AS INT) AS n_bytes,
       CAST(sum(b) AS BIGINT) AS sum_bytes, CAST(max(b) AS INT) AS max_byte
FROM bytes GROUP BY doc_id ORDER BY doc_id""")
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real multimodal pattern: mapInPandas over Arrow batches of
    (doc_id, payload BINARY) → per-item feature rows, vectorized with
    numpy inside the batch. Stands in for image feature extraction; the
    byte-level 'features' keep it oracle-checkable. Narrow (no shuffle):
    each partition decodes its own payloads."""
    p = payloads(spark, sf_dir).select("doc_id", "payload")

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                feats.append((int(doc_id), int(a.size),
                              int(a.sum()) if a.size else 0,
                              int(a.max()) if a.size else 0))
            yield pd.DataFrame(feats,
                               columns=["doc_id", "n_bytes", "sum_bytes",
                                        "max_byte"])

    return p.mapInPandas(kernel, schema=FEAT_SCHEMA).orderBy("doc_id")


# --- real image codecs (r05: the former NotImplementedError stub is gone) ---
#
# Pure-numpy PPM (binary P6) and BMP (uncompressed 24-bit BI_RGB)
# encoder/decoder pair — no PIL, no new deps. Both decode to the same
# logical image: top-down row-major uint8 array of shape (h, w, 3), RGB.

def encode_ppm(arr) -> bytes:
    """Binary PPM (P6) from an (h, w, 3) uint8 RGB array."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes):
    """Parse binary PPM (P6): whitespace/comment-tolerant ASCII header
    (magic, width, height, maxval), then the raw RGB raster."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # tokenize header: ints separated by whitespace, '#' starts a comment
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace byte after maxval, then the raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def encode_bmp(arr) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP from an (h, w, 3) uint8 RGB array:
    BITMAPFILEHEADER + BITMAPINFOHEADER, rows bottom-up, BGR channel
    order, each row zero-padded to a 4-byte boundary."""
    import struct

    import numpy as np

    h, w, _ = arr.shape
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    header = (struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                            2835, 2835, 0, 0))
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + rows.tobytes()


def decode_bmp(payload: bytes):
    """Parse uncompressed 24-bit BI_RGB BMP back to top-down RGB."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h, _planes, bpp, compression = struct.unpack_from(
        "<iiHHI", payload, 18)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} comp={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h,
                         offset=offset).reshape(h, row_size)
    arr = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return arr[::-1] if bottom_up else arr


def decode_image(payload: bytes):
    """Decode an image payload to an (h, w, 3) uint8 RGB numpy array by
    sniffing the magic bytes. PPM and BMP decode natively (above); other
    formats fall back to PIL when available, else raise ValueError."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        from PIL import Image
        import io

        import numpy as np

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise ValueError(
            f"unsupported image format (magic {payload[:2]!r}); native "
            "codecs cover PPM/P6 and BMP/BI_RGB, others need PIL")


# --- the mm_decode_image key: synth real binaries, decode, aggregate --------

#: deterministic per-doc image spec (both engines derive it identically):
#: dims from doc_id, pixel i = (doc_id*7 + i*13) mod 256, format
#: alternates PPM/BMP by doc_id parity so ONE key exercises BOTH codecs.
IMG_W_SQL = "doc_id % 13 + 4"
IMG_H_SQL = "doc_id % 9 + 3"


def image_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload BINARY): real encoded image files — PPM for even
    doc_id, BMP for odd — synthesized deterministically per doc (test
    scaffolding for the REAL decoders; the driver tables carry no binary
    media column). Narrow mapInPandas, numpy-vectorized per image."""
    d = tbl(spark, sf_dir, "documents").select("doc_id")

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = doc_id % 13 + 4, doc_id % 9 + 3
                i = np.arange(w * h * 3, dtype=np.int64)
                px = ((doc_id * 7 + i * 13) % 256).astype(np.uint8)
                arr = px.reshape(h, w, 3)
                payload = (encode_ppm(arr) if doc_id % 2 == 0
                           else encode_bmp(arr))
                out.append((doc_id, payload))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return d.mapInPandas(kernel, schema="doc_id long, payload binary")


@_reg("mm_decode_image", """
WITH dims AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
         doc_id % 13 + 4 AS w, doc_id % 9 + 3 AS h
  FROM documents)
SELECT doc_id, fmt, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h * 3 AS BIGINT) AS n_px,
       CAST((SELECT sum((doc_id * 7 + u.i * 13) % 256)
             FROM unnest(range(0, w * h * 3)) AS u(i)) AS BIGINT) AS sum_px
FROM dims ORDER BY doc_id""")
def mm_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image decode over a BINARY column: mapInPandas batches
    of real PPM/BMP files → magic-sniffed native numpy decode →
    (format, width, height, pixel count/sum). The engine parses the
    ACTUAL encoded bytes (headers, BMP row padding, bottom-up rows, BGR
    order); the oracle computes the expected stats in closed form from
    the generative spec — a true differential over the codec path.
    Narrow (no shuffle): each partition decodes its own payloads."""
    p = image_payloads(spark, sf_dir)

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                fmt = "ppm" if payload[:2] == b"P6" else "bmp"
                arr = decode_image(payload)
                h, w, _ = arr.shape
                out.append((int(doc_id), fmt, w, h, arr.size,
                            int(arr.astype("int64").sum())))
            yield pd.DataFrame(out, columns=["doc_id", "fmt", "width",
                                             "height", "n_px", "sum_px"])

    schema = ("doc_id long, fmt string, width int, height int, "
              "n_px bigint, sum_px bigint")
    return p.mapInPandas(kernel, schema=schema).orderBy("doc_id")

"""Multimodal-column plumbing for training-data pipelines (driver brief).

Images/audio/video are opaque BINARY payloads + typed metadata. The
container has no decode libs (PIL/av), so the decode kernel itself is
STUBBED (NotImplementedError behind an import-try, with a deterministic
fake used by tests) — but everything Spark-side is REAL and tested:
schema, binary handling, Arrow batch shape, mapInPandas signature,
partitioning. The driver testdata has no binary column, so payloads are
synthesized deterministically from documents.text (UTF-8 bytes), which
also lets the UDF path be cross-checked against a SQL oracle.
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


# --- the genuinely-stubbed decoders ----------------------------------------

def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL, which this container lacks.
    The Spark-side plumbing around it (payloads(), mapInPandas batch
    shape) is real and tested with fake_decode."""
    try:
        from PIL import Image  # noqa: F401
        import io
        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL; container has no decode libs — "
            "use fake_decode for plumbing tests") from e


def fake_decode(payload: bytes) -> dict:
    """Deterministic decode stand-in: pretends the payload is an image
    whose dimensions derive from the byte length."""
    n = len(payload)
    return {"width": n % 64 + 1, "height": n % 48 + 1, "mode": "L"}

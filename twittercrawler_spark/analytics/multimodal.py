"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extraction as Arrow-batched ``mapInPandas``.

The pattern a 100 TB multimodal training pipeline needs: media stays an opaque
``binary`` column with typed metadata beside it; decode/resize/frame-sample
run as vectorized pandas stages over Arrow batches (never per-row Python),
partitioned by content bucket. The image/audio codecs are NOT in this
container, so the decode step is stubbed behind ``decode_available()`` with
a clearly-marked deterministic fake — the Spark-side plumbing (schema,
Arrow batch shape, UDF signature, partitioning) is real and tested.

The binary payloads here are the documents' UTF-8 bytes (the only binary
content in the fixtures); the plumbing is content-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import t

QUERIES: dict = {}
ORACLES: dict = {}


def decode_available() -> bool:
    """True if a real media codec is importable (never in this sandbox)."""
    try:  # pragma: no cover - sandbox has no codecs
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _real_decode(blob: bytes) -> tuple[int, int, int]:  # pragma: no cover
    raise NotImplementedError(
        "media decode requires an image/audio codec not present in this "
        "environment; plumbing below uses the deterministic fake"
    )


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in features derived only from the bytes."""
    n = len(blob)
    h = 0
    for b in blob[:16]:
        h = (h * 31 + b) % 65536
    return (h % 640 + 1, (h // 640) % 480 + 1, n % 120 + 1)


DECODE_SCHEMA = "doc_id bigint, width int, height int, n_frames int, byte_len bigint"


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: binary column → typed feature columns.

    One Arrow batch in, one out; no per-row Python boundary crossings beyond
    the in-batch loop (the codec call itself is inherently per-item).
    """
    decode = _real_decode if decode_available() else _fake_decode
    for pdf in batches:
        feats = [decode(b) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "n_frames": [f[2] for f in feats],
                "byte_len": [len(b) for b in pdf["blob"]],
            }
        )


def q(name: str, sql: str | None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


# Typed-metadata projection over the binary column — pure JVM expressions,
# exact oracle parity (md5 over the same UTF-8 bytes in both engines).
@q(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_sig,
           CASE WHEN octet_length(encode(text)) < 200 THEN 'small'
                WHEN octet_length(encode(text)) < 400 THEN 'medium'
                ELSE 'large' END AS size_class
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").withColumn("blob", F.encode("text", "utf-8"))
    blen = F.length("blob").cast("bigint")
    return d.select(
        "doc_id",
        blen.alias("byte_len"),
        F.md5("text").alias("content_sig"),
        F.when(blen < 200, "small")
        .when(blen < 400, "medium")
        .otherwise("large")
        .alias("size_class"),
    )


# Decode stage — mapInPandas over the binary column. Deterministic fake
# features (no codec in sandbox) ⇒ reproducible, but not SQL-expressible:
# registered WITHOUT an oracle (driver records rows-only check).
def multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        t(spark, sf, "documents")
        .select("doc_id", F.encode("text", "utf-8").alias("blob"))
        .repartition(8, "doc_id")
    )
    return d.mapInPandas(decode_features, DECODE_SCHEMA)


QUERIES["multimodal_decode"] = multimodal_decode


# Frame sampling — every SAMPLE_STEP-th frame index of each payload becomes
# its own row with a per-frame content signature. The frame COUNT comes from
# the deterministic stand-in decode (byte-derived, so the oracle can compute
# it too); the explode + signature stay pure JVM codegen — sampling never
# needs Python, only the codec call does.
SAMPLE_STEP = 7


@q(
    "multimodal_framesample",
    f"""
    SELECT doc_id, CAST(idx AS BIGINT) AS frame_idx,
           md5(text || ':' || CAST(idx AS VARCHAR)) AS frame_sig
    FROM (
      SELECT doc_id, text,
             octet_length(encode(text)) % 120 + 1 AS n_frames
      FROM documents) d,
    unnest(generate_series(0, n_frames - 1, {SAMPLE_STEP})) AS g(idx)
    """,
)
def multimodal_framesample(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").withColumn("blob", F.encode("text", "utf-8"))
    nf = (F.length("blob").cast("bigint") % 120 + 1).alias("n_frames")
    return (
        d.select("doc_id", "text", nf)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1, F.lit(SAMPLE_STEP).cast("bigint"))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.md5(F.concat(F.col("text"), F.lit(":"), F.col("frame_idx").cast("string"))).alias(
                "frame_sig"
            ),
        )
    )

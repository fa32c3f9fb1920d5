"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container —
see `_decode_image`); everything Spark-side is real and tested: schema,
partition-preserving batch iteration, UDF signatures, and the
deterministic fake feature extractor used to exercise the plumbing.

Pattern at scale: binary payloads ride in their own column so Parquet
column pruning skips them unless the stage actually decodes; decode
stages run mapInPandas with small maxRecordsPerBatch (payloads are MBs,
not rows); metadata-only stages never touch the bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "mime string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, feat array<float>, feat_dim int, "
    "decode_error string"
)


def _decode_image(payload: bytes) -> "object":
    """REAL decode would use PIL/ffmpeg — not installed in this sandbox.

    Raises NotImplementedError by contract; extract_features catches it
    and falls back to the deterministic fake so the distributed plumbing
    is fully exercisable in tests.
    """
    raise NotImplementedError("image decoding requires PIL/libvips (not in sandbox)")


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in features: md5-seeded floats in [0,1)."""
    h = hashlib.md5(payload or b"").digest()
    out = []
    for i in range(dim):
        h = hashlib.md5(h + bytes([i])).digest()
        out.append(int.from_bytes(h[:4], "big") / 2**32)
    return out


def extract_features(media: DataFrame, dim: int = 8,
                     batch_rows: int = 64) -> DataFrame:
    """Binary payload -> feature vector, Arrow-batched.

    Tries the real decoder; on NotImplementedError records the error and
    emits the deterministic fake (keeps downstream shape identical to
    production). Small batches: payloads dominate memory, not row count.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for payload in pdf["payload"]:
                try:
                    _decode_image(bytes(payload) if payload is not None else b"")
                    raise AssertionError("unreachable in sandbox")
                except NotImplementedError as e:
                    feats.append(_fake_features(bytes(payload or b""), dim))
                    errs.append(str(e))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat": feats,
                "feat_dim": [dim] * len(pdf),
                "decode_error": errs,
            })

    src = media.repartition(max(media.sparkSession.sparkContext.defaultParallelism, 4))
    return src.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def gen_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-fake-{kind}",
                     64, 64, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: rows (media_id, frame_ts_ms) without
    decoding — pure sequence explode, JVM-side. The decode of each frame
    would be a second extract_features pass."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )

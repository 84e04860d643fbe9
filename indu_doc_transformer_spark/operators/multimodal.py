"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (image/audio codecs are not in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic md5-based feature vector
stands in. The Spark-side plumbing — schemas, Arrow batch shape,
``mapInPandas`` signature, partitioning — is real and tested; swapping
in PIL/ffmpeg later only changes the inner function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id bigint, kind string, feature array<float>, decode_ok boolean"
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real decode needs an image codec (not in this container).

    The deterministic fake derives FEATURE_DIM floats from md5(payload)
    so the distributed plumbing is fully testable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv; run with fake=True in this environment"
        )
    h = hashlib.md5(payload).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.md5(f"media:{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 8, 64, 16000 if kind == "audio" else None, 1000 + i),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pattern for 100 TB media: prune to (id, payload) before the
    kernel, repartition by id hash, small Arrow batches (payloads are
    large), per-row failures become decode_ok=False rows, never task
    failures."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(decode_image(bytes(payload), fake=fake))
                    ok.append(True)
                except NotImplementedError:
                    feats.append([0.0] * FEATURE_DIM)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decode_ok": ok,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Relational part of a resize: new dims computed column-side; the
    pixel work would live in the same decode kernel."""
    scale = F.least(
        F.lit(max_side) / F.col("meta.width"), F.lit(max_side) / F.col("meta.height")
    )
    return media.select(
        "media_id",
        "kind",
        F.ceil(F.col("meta.width") * scale).cast("int").alias("new_width"),
        F.ceil(F.col("meta.height") * scale).cast("int").alias("new_height"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame-sampling plan for video rows: one row per planned frame
    timestamp (explode of a sequence — the decode kernel consumes it)."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )

"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

``decode_image`` REALLY decodes 24-bit uncompressed BMP (pure Python —
no codec dependency) and yields deterministic pixel-statistics
features; a corrupt payload raises and becomes ``decode_ok=False``.
Audio/video decode stays STUBBED (ffmpeg is not in this container):
NotImplementedError unless ``fake=True``, in which case a
deterministic md5-based feature vector stands in. The Spark-side
plumbing — schemas, Arrow batch shape, ``mapInPandas`` signature,
partitioning — is identical for real and stubbed codecs.
"""

from __future__ import annotations

import hashlib
import struct
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


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (synthetic corpus + tests).
    ``pixel_fn(x, y) -> (r, g, b)``."""
    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b & 255, g & 255, r & 255))
        row += b"\x00" * (stride - len(row))
        rows += row
    return header + dib + bytes(rows)


def decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """Pure-Python 24-bit uncompressed BMP parser. Returns
    (width, height, [mean_r, mean_g, mean_b, mean_luma]) in 0..1.
    Raises ValueError on anything malformed."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise ValueError("unsupported DIB header")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    if width <= 0 or height == 0:
        raise ValueError("invalid dimensions")
    flipped = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if data_offset + stride * height > len(payload):
        raise ValueError("truncated pixel data")
    tot = [0, 0, 0]
    for y in range(height):
        base = data_offset + y * stride
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            tot[0] += r
            tot[1] += g
            tot[2] += b
    n = width * height * 255.0
    mr, mg, mb = tot[0] / n, tot[1] / n, tot[2] / n
    luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
    _ = planes, flipped
    return width, height, [mr, mg, mb, luma]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """FEATURE_DIM floats from a real BMP decode: (w/4096, h/4096,
    mean RGB, luma, aspect, fill). A non-BMP payload falls back to the
    deterministic md5 fake when ``fake=True`` (stand-in for other
    codecs), else raises."""
    try:
        w, h, rgb_luma = decode_bmp(bytes(payload))
        return [
            min(w / 4096.0, 1.0),
            min(h / 4096.0, 1.0),
            *rgb_luma,
            min(w / max(h, 1), 8.0) / 8.0,
            1.0,
        ]
    except ValueError:
        if bytes(payload)[:2] == b"BM":
            raise  # corrupt BMP: a real decode failure, not another codec
        if not fake:
            raise NotImplementedError(
                "non-BMP image decode requires PIL/opencv; run with fake=True"
            )
        h_ = hashlib.md5(payload).digest()
        return [h_[i] / 255.0 for i in range(FEATURE_DIM)]


def synth_media_df(spark, n: int = 64, corrupt_every: int = 0) -> DataFrame:
    """Deterministic media table: image rows carry REAL 24-bit BMP
    payloads (gradient pattern seeded by id); audio/video carry opaque
    bytes for the stub path. ``corrupt_every`` > 0 plants truncated
    BMPs at that interval to exercise decode_ok=False."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 8 + i % 8, 8
            payload = encode_bmp(
                w, h, lambda x, y, i=i: ((x * 31 + i) % 256, (y * 17 + i) % 256, i % 256)
            )
            if corrupt_every and i % corrupt_every == 0:
                payload = payload[: len(payload) // 2]  # truncated pixel data
            meta = (w, h, None, None)
        else:
            payload = hashlib.md5(f"media:{i}".encode()).digest() * 4
            meta = (None, None, 16000 if kind == "audio" else None, 1000 + i)
        rows.append((i, kind, bytearray(payload), meta))
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
                except (NotImplementedError, ValueError):
                    # stubbed codec or corrupt payload: a per-row
                    # failure row, never a task failure
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

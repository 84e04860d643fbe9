"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

``decode_image`` REALLY decodes 24-bit uncompressed BMP AND baseline
JPEG (pure-Python T.81 codec, kernels/jpeg.py — Huffman, dequant,
IDCT, 4:2:0/4:2:2/4:4:4, restart markers), and ``decode_audio``
REALLY decodes RIFF/WAVE 16-bit PCM (all pure Python — no codec
dependency), yielding deterministic pixel/waveform statistics
features; a corrupt payload raises and becomes ``decode_ok=False``.
Other compressed image/audio formats and all video decode stay
STUBBED (PIL/ffmpeg are not in this container): NotImplementedError
unless ``fake=True``, in which case a deterministic md5-based feature
vector stands in. The Spark-side plumbing — schemas, Arrow batch
shape, ``mapInPandas`` signature, partitioning — is identical for real
and stubbed codecs.
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


def _image_features(w: int, h: int, rgb_luma: list[float]) -> list[float]:
    return [
        min(w / 4096.0, 1.0),
        min(h / 4096.0, 1.0),
        *rgb_luma,
        min(w / max(h, 1), 8.0) / 8.0,
        1.0,
    ]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """FEATURE_DIM floats from a real decode — 24-bit BMP or baseline
    JPEG (pure-Python codec, kernels/jpeg.py): (w/4096, h/4096, mean
    RGB, luma, aspect, fill). A payload of any other format falls back
    to the deterministic md5 fake when ``fake=True`` (stand-in for
    codecs not in this container), else raises."""
    p = bytes(payload)
    if p[:2] == b"\xff\xd8":
        from ..kernels.jpeg import decode_jpeg_stats

        # corrupt/unsupported JPEG raises ValueError: a real decode
        # failure (decode_ok=False), not another codec
        w, h, rgb_luma = decode_jpeg_stats(p)
        return _image_features(w, h, rgb_luma)
    try:
        w, h, rgb_luma = decode_bmp(p)
        return _image_features(w, h, rgb_luma)
    except ValueError:
        if p[:2] == b"BM":
            raise  # corrupt BMP: a real decode failure, not another codec
        if not fake:
            raise NotImplementedError(
                "non-BMP/JPEG image decode requires PIL/opencv; run with fake=True"
            )
        h_ = hashlib.md5(payload).digest()
        return [h_[i] / 255.0 for i in range(FEATURE_DIM)]


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Minimal RIFF/WAVE 16-bit mono PCM writer (synthetic corpus +
    tests). ``samples`` are signed 16-bit ints."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, list[float]]:
    """Pure-Python RIFF/WAVE 16-bit mono PCM parser. Returns
    (sample_rate, n_samples, [rms, peak, zero_cross_rate, mean]) with
    amplitudes normalized to [-1, 1]. Raises ValueError on anything
    malformed or non-PCM."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if len(body) < sz:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            fmt_code, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={fmt_code} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if rate <= 0:
        raise ValueError("invalid sample rate")
    n = len(data) // 2
    if n == 0:
        raise ValueError("empty data chunk")
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    peak = max(abs(s) for s in samples) / 32768.0
    mean = sum(samples) / n / 32768.0
    rms = (sum(s * s for s in samples) / n) ** 0.5 / 32768.0
    zcr = sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    ) / max(n - 1, 1)
    return rate, n, [rms, peak, zcr, mean]


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """FEATURE_DIM floats from a real PCM WAV decode: (rate/48k,
    duration/60s, rms, peak, zcr, mean, samples/1e6, fill). A non-RIFF
    payload falls back to the deterministic md5 fake when ``fake=True``
    (stand-in for compressed codecs), else raises."""
    try:
        rate, n, stats = decode_wav(bytes(payload))
        return [
            min(rate / 48000.0, 1.0),
            min(n / rate / 60.0, 1.0),
            *stats,
            min(n / 1e6, 1.0),
            1.0,
        ]
    except ValueError:
        p = bytes(payload)
        if p[:4] == b"RIFF" and (len(p) < 12 or p[8:12] == b"WAVE"):
            # corrupt WAV — including a RIFF header truncated before
            # its form tag: a real decode failure, not another codec
            raise
        # a RIFF container whose form tag is NOT WAVE (e.g. RIFF/AVI)
        # is just another codec: fall through to the fake stand-in
        if not fake:
            raise NotImplementedError(
                "compressed audio decode requires ffmpeg; run with fake=True"
            )
        h_ = hashlib.md5(payload).digest()
        return [h_[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_video(payload: bytes, fake: bool = False) -> list[float]:
    """Video decode is honestly STUBBED (no codecs in this container):
    NotImplementedError unless ``fake=True`` (deterministic md5
    stand-in keeps the Spark plumbing real and testable)."""
    if not fake:
        raise NotImplementedError("video decode requires ffmpeg; run with fake=True")
    h_ = hashlib.md5(payload).digest()
    return [h_[i] / 255.0 for i in range(FEATURE_DIM)]


def synth_media_df(spark, n: int = 64, corrupt_every: int = 0) -> DataFrame:
    """Deterministic media table: image rows alternate REAL 24-bit BMP
    and REAL baseline-JPEG payloads (gradient pattern seeded by id;
    every 4th JPEG is 4:2:0-subsampled), audio rows carry REAL 16-bit
    PCM WAV payloads (sawtooth seeded by id); video carries opaque
    bytes for the stub path. ``corrupt_every`` > 0 plants truncated
    payloads at that interval to exercise decode_ok=False."""
    from ..kernels.jpeg import encode_jpeg

    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 8 + i % 8, 8
            pix = lambda x, y, i=i: ((x * 31 + i) % 256, (y * 17 + i) % 256, i % 256)
            if (i // 3) % 2:
                payload = encode_jpeg(
                    w, h, pix, quality=90, subsample=(i // 3) % 8 == 1
                )
            else:
                payload = encode_bmp(w, h, pix)
            if corrupt_every and i % corrupt_every == 0:
                payload = payload[: len(payload) // 2]  # truncated data
            meta = (w, h, None, None)
        elif kind == "audio":
            samples = [((j * (37 + i)) % 2048 - 1024) * 16 for j in range(160)]
            payload = encode_wav(16000, samples)
            meta = (None, None, 16000, 10)
        else:
            payload = hashlib.md5(f"media:{i}".encode()).digest() * 4
            meta = (None, None, None, 1000 + i)
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pattern for 100 TB media: prune to (id, payload) before the
    kernel, repartition by id hash, small Arrow batches (payloads are
    large), per-row failures become decode_ok=False rows, never task
    failures."""

    decoders = {"image": decode_image, "audio": decode_audio, "video": decode_video}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    dec = decoders.get(kind, decode_video)
                    feats.append(dec(bytes(payload), fake=fake))
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

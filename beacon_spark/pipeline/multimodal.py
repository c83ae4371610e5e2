"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star extension, BASELINE.json).

PNG decode is REAL — a from-spec pure-Python codec over stdlib zlib
(pipeline/pnglite.py: all five scanline filters, gray/RGB/palette/alpha,
8/16-bit), so ``decode_image``/``featurize`` produce actual pixel
statistics for the most common dataset image format. JPEG/audio/video
still gate behind ``DecoderUnavailable`` (those need native codecs), and
``featurize`` falls back to the deterministic fake for them — the Spark
plumbing (schema contract, Arrow batch shape through ``mapInPandas``,
byte-sized partitioning) is identical either way.

Schema contract for a multimodal asset column:

    asset:      binary          (opaque payload)
    asset_meta: struct<mime: string, width: int, height: int,
                       n_frames: int, sample_rate: int, duration_ms: long>

At 100 TB the payloads dominate: tasks must be sized by *bytes* not rows
(``spark.sql.files.maxPartitionBytes``), and transformations must never
collect payloads to the driver — everything below is executor-side
batch iteration.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by real decode paths: codec libraries are not in this
    container. The deterministic fake below keeps the plumbing testable."""


def sniff_meta(payload: bytes) -> dict:
    """Header sniffing on the raw bytes — real logic, no codec needed.
    PNG/JPEG/WAV magic numbers → mime + dimensions where the header
    carries them."""
    if payload is None:
        return dict.fromkeys(("mime", "width", "height", "n_frames", "sample_rate", "duration_ms"))
    meta = dict.fromkeys(("mime", "width", "height", "n_frames", "sample_rate", "duration_ms"))
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        meta["mime"] = "image/png"
        meta["width"], meta["height"] = struct.unpack(">II", payload[16:24])
        meta["n_frames"] = 1
    elif payload[:2] == b"\xff\xd8":
        meta["mime"] = "image/jpeg"
        meta["n_frames"] = 1
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        meta["mime"] = "audio/wav"
        if len(payload) >= 32:
            meta["sample_rate"] = struct.unpack("<I", payload[24:28])[0]
    else:
        meta["mime"] = "application/octet-stream"
    return meta


def extract_metadata(df: DataFrame, asset_col: str = "asset") -> DataFrame:
    """Append an ``asset_meta`` struct column via mapInPandas — Arrow
    batches in/out, payloads never leave the executors."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("asset_meta", ASSET_META_TYPE, True)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["asset_meta"] = [sniff_meta(p) for p in pdf[asset_col]]
            yield pdf

    return df.mapInPandas(_extract, out_schema)


def decode_image(payload: bytes):
    """PNG → numpy (h, w, channels) via the pure-Python codec; other
    formats need native codecs and raise ``DecoderUnavailable``."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from beacon_spark.pipeline.pnglite import decode_png

        return decode_png(payload)
    raise DecoderUnavailable(
        "only PNG decodes without native codecs (pnglite); "
        "JPEG/video need libjpeg/ffmpeg, absent in this container"
    )


def image_stat_features(payload: bytes, n_features: int = 8) -> list[float] | None:
    """Real per-image features from decoded pixels: height, width,
    channels, then per-channel mean/std (padded/truncated to
    ``n_features``). Returns None when the payload can't be decoded."""
    import numpy as np

    try:
        img = decode_image(payload)
    except (DecoderUnavailable, ValueError, NotImplementedError):
        return None
    h, w = img.shape[:2]
    nch = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h * w, nch).astype(np.float64)
    stats: list[float] = [float(h), float(w), float(nch)]
    for c in range(nch):
        stats.append(round(float(flat[:, c].mean()), 4))
        stats.append(round(float(flat[:, c].std()), 4))
    stats = stats[:n_features]
    stats += [0.0] * (n_features - len(stats))
    return stats


def resize_images(
    df: DataFrame, size: tuple[int, int], asset_col: str = "asset"
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode PNG, executor-side
    per Arrow batch; undecodable payloads pass through unchanged."""
    from beacon_spark.pipeline.pnglite import encode_png, resize_nearest

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()

            def one(p):
                try:
                    return encode_png(resize_nearest(decode_image(p), size))
                except (DecoderUnavailable, ValueError, NotImplementedError):
                    return p

            out[asset_col] = [one(p) for p in pdf[asset_col]]
            yield out

    return df.mapInPandas(_resize, df.schema)


def fake_image_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake feature extractor (stands in for a real
    embedding model): crc32-seeded, stable across runs/executors."""
    if payload is None:
        return [0.0] * n_features
    seed = zlib.crc32(payload)
    feats = []
    x = seed or 1
    for _ in range(n_features):
        x = (1103515245 * x + 12345) % (1 << 31)
        feats.append(round(x / float(1 << 31), 6))
    return feats


def featurize(df: DataFrame, asset_col: str = "asset", n_features: int = 8) -> DataFrame:
    """asset → array<double> features through mapInPandas (the exact shape
    a real model-inference UDF would use: iterate Arrow batches, keep the
    batch size bounded, emit a narrow result — payload column dropped on
    output so the shuffle that follows carries only features)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != asset_col]
        + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[asset_col]:
                # real pixel statistics when decodable (PNG), else the
                # deterministic fake keeps the column total
                real = image_stat_features(bytes(p), n_features) if p is not None else None
                feats.append(real if real is not None else fake_image_features(p, n_features))
            out = pdf.drop(columns=[asset_col])
            out["features"] = feats
            yield out

    return df.mapInPandas(_feat, out_schema)

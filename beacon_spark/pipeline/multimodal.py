"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star extension, BASELINE.json).

PNG decode is REAL — a from-spec pure-Python codec over stdlib zlib
(pipeline/pnglite.py: all five scanline filters, gray/RGB/palette/alpha,
8/16-bit), so ``decode_image``/``featurize`` produce actual pixel
statistics for the most common dataset image format. WAV decode is
also REAL (``decode_wav``: RIFF PCM 8/16/32-bit + IEEE float — struct
parsing + numpy, no codec). JPEG/compressed-audio/video still gate
behind ``DecoderUnavailable`` (those need native codecs), and
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
        # walk the chunk list for 'fmt ' — a fixed [24:28] read assumed
        # canonical chunk order and reported garbage sample rates for
        # files whose first chunk is JUNK/LIST (common from editors)
        off = 12
        while off + 8 <= len(payload):
            cid = payload[off:off + 4]
            (clen,) = struct.unpack("<I", payload[off + 4:off + 8])
            if cid == b"fmt " and off + 16 <= len(payload):
                meta["sample_rate"] = struct.unpack(
                    "<I", payload[off + 12:off + 16])[0]
                break
            off += 8 + clen + (clen & 1)  # chunks are word-aligned
    elif payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        meta["mime"] = "image/gif"
        meta["width"], meta["height"] = struct.unpack("<HH", payload[6:10])
        # frame count + total duration: block-structure walk (no LZW
        # work — image data sub-blocks are skipped by length)
        try:
            from beacon_spark.pipeline.giflite import scan_gif_meta

            n, dur = scan_gif_meta(payload)
            meta["n_frames"] = n
            meta["duration_ms"] = dur
        except Exception:
            meta["n_frames"] = None
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
                if p is None:
                    # a null asset passes through like any undecodable
                    # payload — decode_image(None) raised TypeError
                    # PAST the except clause and killed the whole job
                    return None
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


# ---------------------------------------------------------------- audio (WAV)


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM decode — pure struct parsing + numpy frombuffer, no
    codec library. Returns (samples: np.ndarray (n_frames, n_channels)
    normalized to [-1, 1] float64, sample_rate). Supports PCM 8/16/32-bit
    and IEEE float 32/64; compressed formats raise DecoderUnavailable."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _align, bits = fmt
    if audio_format == 1:  # integer PCM
        dt = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
        if dt is None:
            raise DecoderUnavailable(f"PCM {bits}-bit WAV not supported")
        raw = np.frombuffer(data, dtype=dt)
        if bits == 8:  # unsigned, offset binary
            x = (raw.astype(np.float64) - 128.0) / 128.0
        else:
            x = raw.astype(np.float64) / float(1 << (bits - 1))
    elif audio_format == 3:  # IEEE float
        dt = {32: np.float32, 64: np.float64}.get(bits)
        if dt is None:
            raise DecoderUnavailable(f"float {bits}-bit WAV not supported")
        x = np.frombuffer(data, dtype=dt).astype(np.float64)
    else:
        raise DecoderUnavailable(f"WAV audio format {audio_format} needs a codec")
    n = (len(x) // n_channels) * n_channels
    return x[:n].reshape(-1, n_channels), sample_rate


def audio_stat_features(payload: bytes) -> list[float] | None:
    """Real audio features from decoded samples: duration_s, sample_rate,
    n_channels, rms, peak, zero-crossing rate. None if undecodable."""
    import numpy as np

    try:
        samples, rate = decode_wav(bytes(payload))
    except (DecoderUnavailable, ValueError, struct.error):
        return None
    mono = samples.mean(axis=1)
    n = len(mono)
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n - 1, 1)
    return [
        round(n / float(rate), 4),
        float(rate),
        float(samples.shape[1]),
        round(float(np.sqrt((mono**2).mean())) if n else 0.0, 4),
        round(float(np.abs(mono).max()) if n else 0.0, 4),
        round(zc, 4),
    ]


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Fixture encoder: 16-bit PCM from float [-1, 1] (n, ch) array."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = (np.clip(arr, -1, 1) * 32767).astype("<i2").tobytes()
    n_ch = arr.shape[1]
    byte_rate = sample_rate * n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


# ---------------------------------------------------------------- video/animation


def sample_frames(
    df: DataFrame,
    n_samples: int = 4,
    asset_col: str = "asset",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Frame-sample multi-frame assets (GIF decodes for real via
    pipeline/giflite.py; true video containers need ffmpeg and raise
    ``DecoderUnavailable`` — skipped with a null frame row so the asset
    stays visible downstream).

    Each asset emits up to ``n_samples`` frames, evenly spaced across
    the sequence, re-encoded as single-frame PNG payloads:
    (id_cols..., frame_idx, frame_ms, width, height, frame_png).

    Scale shape: one mapInPandas pass, payloads stay executor-side, and
    the output rows carry the (smaller) per-frame PNGs — the exact
    pattern a real ffmpeg-backed sampler would use with the decode call
    swapped out."""
    import numpy as np

    from beacon_spark.pipeline.giflite import decode_gif
    from beacon_spark.pipeline.pnglite import encode_png

    id_cols = id_cols if id_cols is not None else [
        f.name for f in df.schema.fields if f.name != asset_col
    ]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("frame_ms", T.LongType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("frame_png", T.BinaryType(), True),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ids = tuple(r[c] for c in id_cols)
                p = r[asset_col]
                frames = None
                if p is not None and bytes(p[:6]) in (b"GIF87a", b"GIF89a"):
                    try:
                        frames = decode_gif(bytes(p))
                    except Exception:
                        frames = None
                if not frames:
                    rows.append(ids + (None, None, None, None, None))
                    continue
                k = min(n_samples, len(frames))
                picks = np.linspace(0, len(frames) - 1, k).round().astype(int)
                t = 0
                times = []
                for d, _f in frames:
                    times.append(t)
                    t += d
                for i in sorted(set(picks.tolist())):
                    delay_ms, canvas = frames[i]
                    rows.append(
                        ids
                        + (
                            int(i),
                            int(times[i]),
                            int(canvas.shape[1]),
                            int(canvas.shape[0]),
                            encode_png(canvas),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=id_cols
                + ["frame_idx", "frame_ms", "width", "height", "frame_png"],
            )

    return df.mapInPandas(_sample, out_schema)

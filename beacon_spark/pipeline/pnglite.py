"""Pure-Python PNG codec (decode + fixture encode) — no PIL needed.

Makes the multimodal decode path REAL for the most common image format:
PNG is zlib-deflate (in the stdlib) + per-scanline filters, so a full
from-spec decoder is possible without native codecs. Supports the
critical chunks, bit depth 8/16, color types 0/2/3/4/6 (gray, RGB,
palette, gray+alpha, RGBA), all five scanline filters, and Adam7
interlace (each of the 7 passes is an independently-filtered sub-image
scattered back on the pass grid). Bit depths < 8 raise loudly.

Decode output is a numpy (height, width, channels) uint8/uint16 array —
the input shape for feature extraction / resize in multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "resize_nearest"]

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


# Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, pos: int, height: int, stride: int, bpp: int):
    """Undo per-scanline filters for one (sub-)image → ((height, stride)
    uint8 array, next offset into raw)."""
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 1:  # Sub: recurrence == per-byte-lane cumsum mod 256
            line = (
                line.reshape(-1, bpp).astype(np.int64).cumsum(axis=0) & 0xFF
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prior).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(left) + int(prior[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else np.uint8(0)
                ul = prior[i - bpp] if i >= bpp else np.uint8(0)
                line[i] = (
                    int(line[i])
                    + int(_paeth(np.uint8(left), prior[i], np.uint8(ul)))
                ) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prior = out[y]
    return out, pos


def decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {bit_depth} not supported")
    nch = _CHANNELS.get(color_type)
    if nch is None:
        raise ValueError(f"bad PNG color type {color_type}")

    bpp = nch * (bit_depth // 8)  # filter unit, bytes
    stride = width * bpp
    # bound decode work by the DECLARED dimensions before any allocation:
    # at corpus scale one hostile asset must become a per-asset error
    # (the pipeline wrappers null it out), never an executor OOM —
    # a ~50 KB zlib bomb otherwise inflates ~1000x, and a forged IHDR
    # can claim 2^31 x 2^31 pixels
    expected = height * (stride + 1) + 8 * height  # + interlace slack
    if expected > (1 << 29):
        raise ValueError(
            f"PNG dimensions {width}x{height}x{nch} exceed the decoder's "
            f"512 MiB budget")
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected)
    if dec.unconsumed_tail:
        raise ValueError(
            "PNG IDAT inflates past its declared dimensions "
            "(decompression bomb)")
    raw += dec.flush()
    if interlace:
        out = np.zeros((height, stride), dtype=np.uint8)
        out_px = out.reshape(height, width, bpp)
        pos = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (width - xs + xstep - 1) // xstep
            ph = (height - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue  # empty pass: no scanlines at all (spec §8.2)
            sub, pos = _unfilter(raw, pos, ph, pw * bpp, bpp)
            rows = ys + np.arange(ph) * ystep
            cols = xs + np.arange(pw) * xstep
            out_px[np.ix_(rows, cols)] = sub.reshape(ph, pw, bpp)
    else:
        out, _ = _unfilter(raw, 0, height, stride, bpp)

    if bit_depth == 16:
        arr = out.reshape(height, width, nch, 2)
        img = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
    else:
        img = out.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        img = palette[img[..., 0]]
    return img


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Fixture encoder: 8-bit gray/RGB/RGBA, filter 0 rows; optional
    Adam7 interlacing (each pass emitted as its own filtered sub-image,
    in pass order)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    raw = bytearray()
    if interlace:
        for xs, ys, xstep, ystep in _ADAM7:
            sub = img[ys::ystep, xs::xstep]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for y in range(sub.shape[0]):
                raw.append(0)
                raw += sub[y].tobytes()
    else:
        for y in range(h):
            raw.append(0)
            raw += img[y].tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (height, width) — numpy indexing only."""
    h, w = img.shape[:2]
    nh, nw = size
    ys = (np.arange(nh) * h // nh).clip(0, h - 1)
    xs = (np.arange(nw) * w // nw).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]

"""Pure-Python GIF codec (decode + fixture encode) — no PIL needed.

Completes the multimodal decode story for animated/multi-frame assets:
GIF is palette + LZW (variable-width, LSB-first bit packing) + block
structure, all implementable from the GIF89a spec without native
codecs. Supports: 87a/89a headers, global/local color tables,
interlace, graphic control extensions (frame delay, transparency,
disposal methods 0-3), multi-frame compositing.

``decode_gif`` returns the composited frame sequence —
[(delay_ms, (H, W, 3) uint8 RGB array), ...] — which is what
frame-sampling consumes (pipeline/multimodal.py:sample_frames).

The fixture encoder writes valid multi-frame GIFs (its LZW emits
literal codes while mirroring the decoder's dictionary growth, so the
variable code width stays in sync — simple, always correct).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif", "scan_gif_meta"]


def _lzw_decode(data: bytes, min_code: int,
                max_out: int | None = None) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, clear/EOI codes,
    variable width min_code+1 .. 12. ``max_out`` stops decoding once
    the frame's declared pixel count is produced — LZW output grows
    ~O(n^2) in the input, so an unbounded decode let one hostile frame
    materialize hundreds of MB before the post-hoc truncation."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("gif: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("gif: LZW code out of range")
            out += entry
            prev = entry
            if max_out is not None and len(out) >= max_out:
                return bytes(out[:max_out])
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(pixels: bytes, min_code: int) -> bytes:
    """Literal-code LZW encoder that mirrors the decoder's dictionary
    growth so code widths stay in sync (fixture grade — no compression,
    always valid)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    width = min_code + 1
    emit(clear, width)
    size = clear + 2
    first = True
    for px in pixels:
        if size == 4096:
            emit(clear, width)
            width = min_code + 1
            size = clear + 2
            first = True
        emit(px, width)
        if first:
            first = False
        else:
            size += 1  # decoder appends one entry per non-first code
            if size == (1 << width) and width < 12:
                width += 1
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    row = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = idx[row]
            row += 1
    return out


def decode_gif(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """→ [(delay_ms, (H, W, 3) uint8 RGB frame), ...] — frames
    composited per their disposal methods onto the logical screen."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    W, H, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    prev_canvas = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            subs = []
            while payload[pos]:
                ln = payload[pos]
                subs.append(payload[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # block terminator
            if label == 0xF9 and subs:
                gc = subs[0]
                flags = gc[0]
                delay_ms = struct.unpack_from("<H", gc, 1)[0] * 10
                transparent = gc[3] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("gif: image without a color table")
        min_code = payload[pos]
        pos += 1
        comp = bytearray()
        while payload[pos]:
            ln = payload[pos]
            comp += payload[pos + 1: pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        if w * h > (1 << 28):
            raise ValueError(
                f"gif frame {w}x{h} exceeds the decoder's budget")
        idx = np.frombuffer(
            _lzw_decode(bytes(comp), min_code, max_out=w * h)[: w * h],
            np.uint8,
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if disposal == 3:
            prev_canvas = canvas.copy()
        region = canvas[top: top + h, left: left + w]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore to background (black here)
            canvas[top: top + h, left: left + w] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        delay_ms, transparent, disposal = 0, None, 0
    return frames


def encode_gif(
    frames: list[np.ndarray], delays_ms: list[int] | None = None
) -> bytes:
    """Fixture encoder: RGB frames → multi-frame GIF89a. The palette is
    built from the distinct colors of ALL frames (≤256)."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0
    )
    if len(colors) > 256:
        raise ValueError("fixture gif encoder: ≤256 distinct colors")
    # palette size must be a power of two ≥ 2
    n = 2
    while n < len(colors):
        n *= 2
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    gct_bits = max(n.bit_length() - 1, 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += pal.tobytes()
    delays = delays_ms or [100] * len(frames)
    min_code = max(gct_bits, 2)
    for f, d in zip(frames, delays):
        out += bytes([0x21, 0xF9, 4, 0, d // 10 & 0xFF, d // 10 >> 8, 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3)], dtype=np.uint8
        )
        out.append(min_code)
        comp = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(comp), 255):
            chunk = comp[i: i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def scan_gif_meta(payload: bytes) -> tuple[int, int]:
    """(n_frames, total duration_ms) by walking the block structure only
    — no LZW work; the metadata twin of :func:`decode_gif`."""
    pos = 13
    packed = payload[10]
    if packed & 0x80:
        pos += (2 << (packed & 0x07)) * 3
    frames = 0
    dur = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            label = payload[pos]
            pos += 1
            first = True
            while payload[pos]:
                if label == 0xF9 and first:
                    dur += struct.unpack_from("<H", payload, pos + 2)[0] * 10
                    first = False
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            ip = payload[pos + 8]
            pos += 9
            if ip & 0x80:
                pos += (2 << (ip & 0x07)) * 3
            pos += 1  # lzw min code size
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            frames += 1
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    return frames, dur

"""Pure-Python Blosc1 frame codec (decode + encode), no c-blosc needed.

Blosc is the de-facto default compressor for real-world zarr stores
(numcodecs ``Blosc(cname='lz4', shuffle=SHUFFLE)`` for v2; the v3
``blosc`` codec shares the same on-disk frame). The container format is
published in the c-blosc README_HEADER docs:

  16-byte header:
    0  version        (format version, 2)
    1  versionlz      (codec format version)
    2  flags          bit0 byte-shuffle, bit1 pure-memcpy,
                      bit2 bit-shuffle, bits 5-7 codec id
    3  typesize       (uint8)
    4  nbytes         (uint32 LE, uncompressed size)
    8  blocksize      (uint32 LE)
    12 cbytes         (uint32 LE, total frame size)
  then, unless memcpy: uint32 LE per-block offsets (from frame start),
  each block a sequence of streams prefixed with int32 LE compressed
  size; a stream whose size equals its uncompressed size is stored raw.
  Byte-shuffle is applied per block over whole elements, leftovers
  verbatim.

Inner codecs delegate to pyarrow (lz4 block, zstd, snappy) and zlib —
all baked into this environment; blosclz (c-blosc's own LZ) has no
Python/Arrow implementation and raises a clear error. Splits are decoded
by trial (nsplits in {1, typesize}): every stream decode is
strict-length, so a wrong split count fails loudly and the other one is
tried — no dependence on c-blosc's version-specific split heuristic.

Reference parity: beacon-arrow-zarr reads blosc stores via the zarr
crates (beacon-db/beacon-file-formats/beacon-arrow-zarr/src/lib.rs:1-10).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

BLOSC_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_CODEC_IDS = {v: k for k, v in BLOSC_CODECS.items()}

_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPY = 0x2
_FLAG_BITSHUFFLE = 0x4


def _inner_decompress(cname: str, data: bytes, out_size: int) -> bytes:
    if cname == "zlib":
        out = zlib.decompress(data)
    elif cname in ("lz4", "lz4hc"):
        import pyarrow as pa

        out = pa.Codec("lz4_raw").decompress(data, out_size).to_pybytes()
    elif cname == "zstd":
        import pyarrow as pa

        out = pa.Codec("zstd").decompress(data, out_size).to_pybytes()
    elif cname == "snappy":
        import pyarrow as pa

        out = pa.Codec("snappy").decompress(data, out_size).to_pybytes()
    else:
        raise ValueError(f"blosc inner codec {cname!r} has no pure-Python decoder")
    if len(out) != out_size:
        raise ValueError(f"blosc stream decoded to {len(out)} bytes, want {out_size}")
    return out


def _inner_compress(cname: str, data: bytes) -> bytes:
    if cname == "zlib":
        return zlib.compress(data)
    import pyarrow as pa

    arrow_name = {"lz4": "lz4_raw", "zstd": "zstd", "snappy": "snappy"}[cname]
    return pa.Codec(arrow_name).compress(data).to_pybytes()


def _unshuffle(block: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(block) < typesize:
        return block
    nel = len(block) // typesize
    body = np.frombuffer(block[: nel * typesize], dtype="u1")
    out = body.reshape(typesize, nel).T.reshape(-1).tobytes()
    return out + block[nel * typesize:]


def _shuffle(block: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(block) < typesize:
        return block
    nel = len(block) // typesize
    body = np.frombuffer(block[: nel * typesize], dtype="u1")
    out = body.reshape(nel, typesize).T.reshape(-1).tobytes()
    return out + block[nel * typesize:]


def _decode_block(buf: bytes, off: int, out_size: int, typesize: int, cname: str) -> bytes:
    candidates = [1]
    if typesize > 1 and out_size % typesize == 0:
        candidates.append(typesize)
    last_err: Exception | None = None
    for nsplits in candidates:
        neblock = out_size // nsplits
        pos, parts = off, []
        try:
            for _ in range(nsplits):
                (cb,) = struct.unpack_from("<i", buf, pos)
                pos += 4
                if cb < 0 or pos + cb > len(buf):
                    raise ValueError("stream size out of bounds")
                raw = buf[pos: pos + cb]
                pos += cb
                parts.append(raw if cb == neblock else _inner_decompress(cname, raw, neblock))
            return b"".join(parts)
        except (ValueError, OSError) as e:  # wrong split guess -> strict decode fails
            last_err = e
    raise ValueError(f"blosc block decode failed: {last_err}")


def blosc_decode(frame: bytes) -> bytes:
    """Decode one blosc frame to its uncompressed bytes."""
    if len(frame) < 16:
        raise ValueError("blosc frame shorter than 16-byte header")
    flags, typesize = frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    if cbytes > len(frame):
        raise ValueError("blosc header cbytes exceeds buffer")
    if flags & _FLAG_MEMCPY:
        return bytes(frame[16: 16 + nbytes])
    if flags & _FLAG_BITSHUFFLE:
        raise ValueError("blosc bit-shuffle needs the 'blosc' package (not installed)")
    cname = BLOSC_CODECS.get((flags >> 5) & 0x7)
    if cname is None or cname == "blosclz":
        raise ValueError(
            f"blosc inner codec {cname or (flags >> 5) & 0x7!r} needs the 'blosc' package"
        )
    if nbytes == 0:
        return b""
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}I", frame, 16)
    out = bytearray()
    for i, off in enumerate(bstarts):
        expected = min(blocksize, nbytes - i * blocksize)
        block = _decode_block(frame, off, expected, typesize, cname)
        if flags & _FLAG_SHUFFLE:
            block = _unshuffle(block, typesize)
        out += block
    return bytes(out)


def blosc_encode(
    data: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    shuffle: bool = True,
    blocksize: int | None = None,
) -> bytes:
    """Encode bytes as a blosc frame (used by the zarr fixture writer and
    round-trip tests; real stores are written by c-blosc but share this
    exact layout). Streams that don't compress are stored raw, as the
    reference implementation does."""
    if cname not in _CODEC_IDS or cname == "blosclz":
        raise ValueError(f"unsupported blosc inner codec {cname!r}")
    nbytes = len(data)
    if blocksize is None:
        blocksize = min(max(nbytes, 1), 1 << 18)
    if typesize > 1:
        blocksize = max(blocksize - blocksize % typesize, typesize)
    flags = (_CODEC_IDS[cname] << 5) | (_FLAG_SHUFFLE if shuffle and typesize > 1 else 0)
    nblocks = max(1, -(-nbytes // blocksize))
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, flags, typesize & 0xFF
    blocks: list[bytes] = []
    offsets: list[int] = []
    pos = 16 + 4 * nblocks
    for i in range(nblocks):
        chunk = data[i * blocksize: min((i + 1) * blocksize, nbytes)]
        if flags & _FLAG_SHUFFLE:
            chunk = _shuffle(chunk, typesize)
        comp = _inner_compress(cname, chunk)
        stream = chunk if len(comp) >= len(chunk) else comp
        blocks.append(struct.pack("<i", len(stream)) + stream)
        offsets.append(pos)
        pos += len(blocks[-1])
    body = struct.pack(f"<{nblocks}I", *offsets) + b"".join(blocks)
    struct.pack_into("<III", header, 4, nbytes, blocksize, 16 + len(body))
    return bytes(header) + body

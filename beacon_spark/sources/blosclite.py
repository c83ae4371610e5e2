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

Inner codecs delegate to pyarrow (lz4 block, zstd, snappy) and zlib;
blosclz (c-blosc's own FastLZ-derived LZ) is decoded by the pure-Python
``_blosclz_decompress`` below. Splits are decoded by trial (nsplits in
{1, typesize}): every stream decode is strict-length, so a wrong split
count fails loudly and the other one is tried — no dependence on
c-blosc's version-specific split heuristic.

Bit-shuffle (flags bit2) is the bitshuffle-library transform: per block,
the [n_elements, typesize*8] bit matrix is transposed to bit-plane-major
order — planes ordered (byte index, then bit index LSB-first), each
plane packing element 8m+t at bit t. numpy unpackbits/packbits with
``bitorder='little'`` express exactly that. Like c-blosc's shuffle.c,
only the leading multiple-of-8-elements prefix of each block is
shuffled; the remainder is copied verbatim.

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


_BLZ_MAX_DIST = 8191


def _blosclz_decompress(data: bytes, out_size: int) -> bytes:
    """blosclz (c-blosc's FastLZ level-1 derivative, blosclz.c) decode.

    Stream grammar: first control byte is masked to a literal run. Then
    per op: ctrl < 32 → literal run of ctrl+1 bytes; else a match with
    3-bit length field ((ctrl>>5)-1, saturating value 6 extended by
    add-255-loop bytes), distance ((ctrl&31)<<8) + next byte + 1, copied
    length len+3. code==255 with ofs==31<<8 escapes to a 16-bit far
    distance (+MAX_DIST). Distance-1 overlap = RLE. Strict: any
    out-of-bounds read/write or length mismatch raises."""
    ip, n = 0, len(data)
    out = bytearray()
    if n == 0:
        return b""
    ctrl = data[ip] & 31
    ip += 1
    is_literal = True  # first op is always a literal run
    while True:
        if not is_literal and ctrl >= 32:
            length = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if length == 6:  # 7 - 1: saturated 3-bit field
                while True:
                    if ip >= n:
                        raise ValueError("blosclz: truncated length extension")
                    code = data[ip]
                    ip += 1
                    length += code
                    if code != 255:
                        break
            if ip >= n:
                raise ValueError("blosclz: truncated match distance")
            code = data[ip]
            ip += 1
            length += 3
            ref = len(out) - ofs - code
            if code == 255 and ofs == (31 << 8):
                if ip + 1 >= n:
                    raise ValueError("blosclz: truncated far distance")
                ofs = (data[ip] << 8) + data[ip + 1]
                ip += 2
                ref = len(out) - ofs - _BLZ_MAX_DIST
            ref -= 1
            if ref < 0:
                raise ValueError("blosclz: match before output start")
            if ref >= len(out):
                # a forward reference is malformed; the overlap loop
                # below would IndexError, which the split-trial caller
                # does not treat as a failed decode attempt
                raise ValueError("blosclz: match past output end")
            if ref + length <= len(out):
                out += bytes(out[ref: ref + length])
            else:  # overlapping copy (incl. distance-1 RLE)
                for _ in range(length):
                    out.append(out[ref])
                    ref += 1
        else:
            run = ctrl + 1
            if ip + run > n:
                raise ValueError("blosclz: truncated literal run")
            out += data[ip: ip + run]
            ip += run
        if ip >= n:
            break
        ctrl = data[ip]
        ip += 1
        is_literal = False
    if len(out) != out_size:
        raise ValueError(f"blosclz decoded {len(out)} bytes, want {out_size}")
    return bytes(out)


def _inner_decompress(cname: str, data: bytes, out_size: int) -> bytes:
    if cname == "blosclz":
        out = _blosclz_decompress(data, out_size)
    elif cname == "zlib":
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


def _blosclz_compress(data: bytes) -> bytes:
    """Greedy blosclz encoder (fixture/roundtrip grade): 3-byte-hash
    match finder, near distances only (≤ 7936 so the far-distance escape
    can never fire accidentally), literal runs of ≤ 32. Every emitted op
    is valid per the decoder's grammar."""
    out = bytearray()
    n = len(data)
    lit_start = 0
    table: dict[bytes, int] = {}

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            run = min(32, end - j)
            out.append(run - 1)
            out.extend(data[j: j + run])
            j += run

    i = 0
    while i + 3 <= n:
        key = data[i: i + 3]
        cand = table.get(key)
        table[key] = i
        if cand is not None and 1 <= i - cand <= 7936 and i > 0:
            L = 3
            max_l = n - i
            while L < max_l and data[cand + L] == data[i + L]:
                L += 1
            dist = i - cand
            flush_literals(i)
            ofs = dist - 1
            high, low = ofs >> 8, ofs & 255
            if L <= 8:
                out.append(((L - 2) << 5) | high)
            else:
                out.append((7 << 5) | high)
                rem = L - 9
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)
            out.append(low)
            lit_start = i + L
            i += L
            continue
        i += 1
    flush_literals(n)
    return bytes(out)


def _inner_compress(cname: str, data: bytes) -> bytes:
    if cname == "blosclz":
        return _blosclz_compress(data)
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


def _bitshuffle_block(block: bytes, typesize: int) -> bytes:
    """bitshuffle transform (shuffle.c ``bitshuffle``): transpose the
    [n_elements, typesize*8] bit matrix of the leading multiple-of-8-
    elements prefix to bit-plane-major; the remainder is verbatim."""
    nel = len(block) // typesize
    n8 = nel - nel % 8
    trimmed = n8 * typesize
    if trimmed == 0:
        return block
    arr = np.frombuffer(block[:trimmed], dtype="u1").reshape(n8, typesize)
    bits = np.unpackbits(arr, axis=1, bitorder="little")  # [n8, s*8]
    out = np.packbits(bits.T, axis=1, bitorder="little")  # [s*8, n8/8]
    return out.tobytes() + block[trimmed:]


def _bitunshuffle_block(block: bytes, typesize: int) -> bytes:
    nel = len(block) // typesize
    n8 = nel - nel % 8
    trimmed = n8 * typesize
    if trimmed == 0:
        return block
    planes = np.frombuffer(block[:trimmed], dtype="u1").reshape(
        typesize * 8, n8 // 8
    )
    bits = np.unpackbits(planes, axis=1, bitorder="little")  # [s*8, n8]
    arr = np.packbits(bits.T, axis=1, bitorder="little")  # [n8, s]
    return arr.tobytes() + block[trimmed:]


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
        except (ValueError, OSError, IndexError, struct.error) as e:
            # wrong split guess -> strict decode fails; Index/struct
            # errors from walking garbage offsets count as failures of
            # THIS trial, not a crash of the whole decode
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
        if len(frame) < 16 + nbytes:
            raise ValueError("blosc memcpy frame shorter than nbytes")
        return bytes(frame[16: 16 + nbytes])
    cname = BLOSC_CODECS.get((flags >> 5) & 0x7)
    if cname is None:
        raise ValueError(f"unknown blosc inner codec id {(flags >> 5) & 0x7}")
    if nbytes == 0:
        return b""
    if blocksize == 0:
        raise ValueError("blosc header blocksize is 0 with nonzero nbytes")
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}I", frame, 16)
    out = bytearray()
    for i, off in enumerate(bstarts):
        expected = min(blocksize, nbytes - i * blocksize)
        block = _decode_block(frame, off, expected, typesize, cname)
        if flags & _FLAG_BITSHUFFLE:
            block = _bitunshuffle_block(block, typesize)
        elif flags & _FLAG_SHUFFLE:
            block = _unshuffle(block, typesize)
        out += block
    return bytes(out)


def blosc_encode(
    data: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    shuffle: bool | str = True,
    blocksize: int | None = None,
) -> bytes:
    """Encode bytes as a blosc frame (used by the zarr fixture writer and
    round-trip tests; real stores are written by c-blosc but share this
    exact layout). ``shuffle``: True/"byte" = byte-shuffle, "bit" =
    bitshuffle, False = none. Streams that don't compress are stored
    raw, as the reference implementation does."""
    if cname not in _CODEC_IDS:
        raise ValueError(f"unsupported blosc inner codec {cname!r}")
    if not 0 < typesize <= 255:
        # c-blosc caps typesize at 255 (wider elements store with
        # typesize 1, no shuffle); `typesize & 0xFF` below would
        # otherwise silently wrap 256 -> 0 in the header
        typesize, shuffle = 1, False
    nbytes = len(data)
    if blocksize is None:
        blocksize = min(max(nbytes, 1), 1 << 18)
    if typesize > 1:
        blocksize = max(blocksize - blocksize % typesize, typesize)
    if shuffle == "bit":
        # full-block bit-transposes need whole groups of 8 elements
        blocksize = max(
            blocksize - blocksize % (typesize * 8), typesize * 8
        )
        shuffle_flag = _FLAG_BITSHUFFLE
    elif shuffle and typesize > 1:
        shuffle_flag = _FLAG_SHUFFLE
    else:
        shuffle_flag = 0
    flags = (_CODEC_IDS[cname] << 5) | shuffle_flag
    nblocks = max(1, -(-nbytes // blocksize))
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, flags, typesize & 0xFF
    blocks: list[bytes] = []
    offsets: list[int] = []
    pos = 16 + 4 * nblocks
    for i in range(nblocks):
        chunk = data[i * blocksize: min((i + 1) * blocksize, nbytes)]
        if flags & _FLAG_BITSHUFFLE:
            chunk = _bitshuffle_block(chunk, typesize)
        elif flags & _FLAG_SHUFFLE:
            chunk = _shuffle(chunk, typesize)
        comp = _inner_compress(cname, chunk)
        stream = chunk if len(comp) >= len(chunk) else comp
        blocks.append(struct.pack("<i", len(stream)) + stream)
        offsets.append(pos)
        pos += len(blocks[-1])
    body = struct.pack(f"<{nblocks}I", *offsets) + b"".join(blocks)
    struct.pack_into("<III", header, 4, nbytes, blocksize, 16 + len(body))
    return bytes(header) + body

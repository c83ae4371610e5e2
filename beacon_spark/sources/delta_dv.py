"""Delta Lake deletion vectors — pure-Python decode (+ fixture encode).

Per the public Delta protocol (PROTOCOL.md "Deletion Vectors"):

  - an ``add`` action may carry a ``deletionVector`` descriptor
    ``{storageType, pathOrInlineDv, offset?, sizeInBytes, cardinality}``
  - storageType ``u``: the vector lives in a file
    ``<table>/<randomPrefix?>deletion_vector_<uuid>.bin`` where
    ``pathOrInlineDv`` is ``<prefix><z85(uuid bytes)>`` (uuid = last 20
    chars); ``p``: absolute path; ``i``: ``pathOrInlineDv`` is the
    z85-encoded vector itself.
  - on-disk format: file starts with a version byte (1); the blob at
    ``offset`` is ``[size: i32 BE][data][crc32(data): u32 BE]`` where
    ``data`` = ``[magic 1681511377: u32 LE][RoaringBitmapArray]``.
  - RoaringBitmapArray, **portable** serialization (PROTOCOL.md points
    at the 64-bit extension of the RoaringFormatSpec — this is what
    delta-spark and delta-rs read/write): ``[numBitmaps: i64 LE]`` then
    per bitmap ``[key: u32 LE][standard 32-bit roaring serialization]``,
    where ``key`` is the high 32 bits of the row indexes in that bitmap.
    Keys are sorted and only non-empty bitmaps are stored.  (The keyless
    sequential layout this module previously wrote is delta-spark's
    "native" in-memory format, not the on-disk one — a byte-level
    fixture in tests/test_delta.py pins the portable layout.)

The 32-bit Roaring "portable" wire format (RoaringFormatSpec): cookie
12346 (no runs, container count follows) or 12347 (runs, count packed in
the cookie high bits + a run-flag bitset), then per-container 2-byte key
and cardinality-1, an optional offset table, and container payloads
(sorted u16 array / 8 KiB bitset / run pairs).
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "z85_decode",
    "z85_encode",
    "roaring_bitmap_array_decode",
    "roaring_bitmap_array_encode",
    "decode_dv_descriptor",
    "read_dv_blob",
    "write_dv_file",
]

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------------- 32-bit roaring

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347


def _roaring32_decode(buf: bytes, off: int) -> tuple[list[int], int]:
    """One standard-serialization 32-bit roaring bitmap → (values, end)."""
    (cookie16,) = struct.unpack_from("<H", buf, off)
    if cookie16 == _SERIAL_COOKIE:
        (packed,) = struct.unpack_from("<I", buf, off)
        n = (packed >> 16) + 1
        off += 4
        nbytes_flags = (n + 7) // 8
        run_flags = buf[off : off + nbytes_flags]
        off += nbytes_flags
        has_offsets = n >= 4
    else:
        (cookie,) = struct.unpack_from("<I", buf, off)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"bad roaring cookie {cookie}")
        (n,) = struct.unpack_from("<I", buf, off + 4)
        off += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True

    keys_cards = struct.unpack_from("<" + "HH" * n, buf, off)
    off += 4 * n
    if has_offsets:
        off += 4 * n  # skip the offset table; containers are sequential

    values: list[int] = []
    for i in range(n):
        key, card_m1 = keys_cards[2 * i], keys_cards[2 * i + 1]
        card = card_m1 + 1
        base = key << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + wi * 64 + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, off)
            off += 2 * card
            values.extend(base + v for v in vals)
    return values, off


def _roaring32_encode(values: list[int]) -> bytes:
    """Standard serialization, array containers only (fixture grade —
    cardinality ≤ 4096 per 16-bit key block)."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    for k in keys:
        if len(containers[k]) > 4096:
            raise ValueError("fixture roaring encoder: array containers only")
    out = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset table
    pos = len(out) + 4 * len(keys)
    for k in keys:
        out += struct.pack("<I", pos)
        pos += 2 * len(containers[k])
    for k in keys:
        out += struct.pack(f"<{len(containers[k])}H", *containers[k])
    return bytes(out)


_DV_MAGIC = 1681511377


def roaring_bitmap_array_decode(data: bytes) -> list[int]:
    """Delta ``data`` blob (magic + portable 64-bit RoaringBitmapArray)
    → sorted row indexes."""
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    off = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", data, off)
        off += 4
        vals, off = _roaring32_decode(data, off)
        out.extend((key << 32) | v for v in vals)
    return sorted(out)


def roaring_bitmap_array_encode(indexes: list[int]) -> bytes:
    groups: dict[int, list[int]] = {}
    for v in indexes:
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    keys = sorted(groups)  # portable: sorted, non-empty bitmaps only
    out = bytearray(struct.pack("<Iq", _DV_MAGIC, len(keys)))
    for k in keys:
        out += struct.pack("<I", k)
        out += _roaring32_encode(groups[k])
    return bytes(out)


# ------------------------------------------------------- descriptor I/O


def read_dv_blob(desc: dict, table_location: str) -> bytes:
    """DeletionVectorDescriptor → the verified ``data`` blob (magic +
    portable RoaringBitmapArray), NOT the expanded index list — callers
    that ship the vector to executors keep it compact (a million deleted
    rows is a few hundred KB of roaring, not a million-tuple Python
    list)."""
    from beacon_spark.sources import bytesource as _bs

    st = desc["storageType"]
    if st == "i":
        return z85_decode(desc["pathOrInlineDv"])[: desc["sizeInBytes"]]
    if st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, uid_part = enc[:-20], enc[-20:]
        uid = z85_decode(uid_part)
        name = f"deletion_vector_{_uuid_str(uid)}.bin"
        path = _bs.join(table_location, prefix, name) if prefix else _bs.join(
            table_location, name
        )
    elif st == "p":
        path = desc["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown deletion vector storageType {st!r}")
    # DVs are small relative to data files; the ranged read fetches only
    # [offset, offset+size+8) when the store supports it
    buf = _bs.open_buffer(path)
    off = desc.get("offset", 1)
    (size,) = _bs.unpack_from(">i", buf, off)
    data = _bs.read_range(buf, off + 4, size)
    (crc,) = _bs.unpack_from(">I", buf, off + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"deletion vector checksum mismatch in {path}")
    return data


def decode_dv_descriptor(desc: dict, table_location: str) -> list[int]:
    """DeletionVectorDescriptor → sorted deleted row indexes."""
    return roaring_bitmap_array_decode(read_dv_blob(desc, table_location))


def _uuid_str(b: bytes) -> str:
    import uuid

    return str(uuid.UUID(bytes=b))


def write_dv_file(
    table_location: str, indexes: list[int]
) -> tuple[dict, str]:
    """Fixture writer: serialize ``indexes`` as an on-disk DV (storage
    type ``u``), returning (descriptor, file path)."""
    import os
    import uuid as _uuid

    uid = _uuid.uuid4()
    data = roaring_bitmap_array_encode(indexes)
    blob = struct.pack(">i", len(data)) + data + struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )
    path = os.path.join(table_location, f"deletion_vector_{uid}.bin")
    with open(path, "wb") as f:
        f.write(b"\x01" + blob)
    desc = {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(uid.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(indexes),
    }
    return desc, path

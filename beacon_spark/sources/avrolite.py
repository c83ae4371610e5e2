"""Minimal Apache Avro object-container codec (read + write), pure Python.

Exists to decode Iceberg manifest-list / manifest files (sources/iceberg.py)
without an avro dependency. Generic: the decoder is driven entirely by the
writer schema embedded in the file header, so it reads containers produced
by any engine (Spark, Trino, Flink) — records, primitives, unions, arrays,
maps, fixed, enums, and logical types pass through as raw values.

Codecs: ``null`` and ``deflate`` (zlib raw) — the two Iceberg writes by
default. Snappy is unsupported and raises.

This is a driver-side metadata path only (manifests are small); data files
themselves are parquet and go through Spark's vectorized reader.
"""

from __future__ import annotations

import io
import json
import struct

from beacon_spark.sources import bytesource as _bs
import zlib

__all__ = ["read_avro", "write_avro"]

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decode


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def zlong(self) -> int:
        shift = 0
        acc = 0
        while True:
            (b,) = self.read(1)
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def decode(self, schema):
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union: zigzag branch index
            return self.decode(schema[self.zlong()])
        else:
            t = schema["type"]

        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) == b"\x01"
        if t in ("int", "long"):
            return self.zlong()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.zlong())
        if t == "string":
            return self.read(self.zlong()).decode("utf-8")
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            return schema["symbols"][self.zlong()]
        if t == "record":
            return {f["name"]: self.decode(f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = self.zlong()
                if n == 0:
                    break
                if n < 0:
                    self.zlong()  # block byte size — skip
                    n = -n
                for _ in range(n):
                    out.append(self.decode(schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.zlong()
                if n == 0:
                    break
                if n < 0:
                    self.zlong()
                    n = -n
                for _ in range(n):
                    k = self.read(self.zlong()).decode("utf-8")
                    out[k] = self.decode(schema["values"])
            return out
        raise ValueError(f"unsupported avro type: {t!r}")


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """→ (file metadata dict with parsed 'avro.schema', list of records)."""
    buf = _bs.read_bytes(path)  # manifests are metadata-sized; one GET
    r = _Reader(buf)
    if r.read(4) != _MAGIC:
        raise ValueError(f"not an avro container: {path}")
    meta_r = _Reader(buf[r.pos :])
    meta = meta_r.decode({"type": "map", "values": "bytes"})
    r.pos += meta_r.pos
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    records: list[dict] = []
    while not r.at_end():
        count = r.zlong()
        size = r.zlong()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            # spec: snappy blocks carry a big-endian CRC32 of the
            # UNCOMPRESSED data in their last 4 bytes; raw snappy leads
            # with the uncompressed length as a varint (pyarrow needs it)
            import struct as _struct

            import pyarrow as _pa

            crc = _struct.unpack(">I", block[-4:])[0]
            comp = block[:-4]
            usize = shift = i = 0
            while True:
                byte = comp[i]
                usize |= (byte & 0x7F) << shift
                i += 1
                if not byte & 0x80:
                    break
                shift += 7
            block = _pa.Codec("snappy").decompress(comp, usize).to_pybytes()
            if zlib.crc32(block) & 0xFFFFFFFF != crc:
                raise ValueError(f"avro snappy block crc mismatch in {path}")
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
        br = _Reader(block)
        for _ in range(count):
            records.append(br.decode(schema))
    return {"schema": schema, "codec": codec}, records


# ---------------------------------------------------------------- encode


class _Writer:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def zlong(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.write(bytes([b | 0x80]))
            else:
                self.write(bytes([b]))
                break

    def encode(self, schema, value) -> None:
        if isinstance(schema, list):
            # union: pick first branch matching the value's nullness
            for i, branch in enumerate(schema):
                bt = branch if isinstance(branch, str) else branch["type"]
                if (value is None) == (bt == "null"):
                    self.zlong(i)
                    self.encode(branch, value)
                    return
            raise ValueError(f"no union branch for {value!r} in {schema}")
        t = schema if isinstance(schema, str) else schema["type"]
        if t == "null":
            return
        if t == "boolean":
            self.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            self.zlong(int(value))
        elif t == "float":
            self.write(struct.pack("<f", value))
        elif t == "double":
            self.write(struct.pack("<d", value))
        elif t == "bytes":
            self.zlong(len(value))
            self.write(bytes(value))
        elif t == "string":
            b = value.encode("utf-8")
            self.zlong(len(b))
            self.write(b)
        elif t == "fixed":
            self.write(bytes(value))
        elif t == "enum":
            self.zlong(schema["symbols"].index(value))
        elif t == "record":
            for f in schema["fields"]:
                self.encode(f["type"], value[f["name"]])
        elif t == "array":
            if value:
                self.zlong(len(value))
                for item in value:
                    self.encode(schema["items"], item)
            self.zlong(0)
        elif t == "map":
            if value:
                self.zlong(len(value))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    self.zlong(len(kb))
                    self.write(kb)
                    self.encode(schema["values"], v)
            self.zlong(0)
        else:
            raise ValueError(f"unsupported avro type: {t!r}")


def write_avro(
    path: str, schema: dict, records: list[dict], codec: str = "deflate"
) -> None:
    sync = b"\x00" * 8 + b"beaconav"  # any 16 bytes
    head = _Writer()
    head.write(_MAGIC)
    head.encode(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        },
    )
    head.write(sync)
    body = _Writer()
    for rec in records:
        body.encode(schema, rec)
    block = body.out.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    elif codec == "snappy":
        import struct as _struct

        import pyarrow as _pa

        crc = _struct.pack(">I", zlib.crc32(block) & 0xFFFFFFFF)
        block = _pa.Codec("snappy").compress(block).to_pybytes() + crc
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    tail = _Writer()
    tail.zlong(len(records))
    tail.zlong(len(block))
    with open(path, "wb") as f:
        f.write(head.out.getvalue())
        if records:
            f.write(tail.out.getvalue())
            f.write(block)
            f.write(sync)

"""Pure-Python Zarr v2/v3 directory-store reader (no zarr package).

Zarr is an open spec: JSON metadata + flat binary chunk files. This
reader covers the subset a data lake actually serves from disk:

  - v3 stores: root ``zarr.json`` group, per-array ``zarr.json``
    (regular chunk grid, default chunk-key encoding), codec chains
    ``bytes [+ gzip|zlib]``, ``dimension_names``;
  - v2 stores: ``.zgroup``/``.zarray``/``.zattrs``, C order,
    ``compressor: null | zlib | gzip``, dims via ``_ARRAY_DIMENSIONS``;
  - edge chunks are stored full-size and sliced (per spec).

Reference parity: `beacon-arrow-zarr/src/lib.rs` (Zarr v3 stores over
object_store). Blosc/zstd-compressed stores need the real `zarr` package
and raise a clear error naming the codec.
"""

from __future__ import annotations

import gzip
import itertools
import json
import os
import zlib

import numpy as np

_V3_DTYPES = {
    "bool": np.dtype("bool"),
    "int8": np.dtype("i1"), "int16": np.dtype("i2"),
    "int32": np.dtype("i4"), "int64": np.dtype("i8"),
    "uint8": np.dtype("u1"), "uint16": np.dtype("u2"),
    "uint32": np.dtype("u4"), "uint64": np.dtype("u8"),
    "float16": np.dtype("f2"), "float32": np.dtype("f4"),
    "float64": np.dtype("f8"),
}


def _decompress(data: bytes, codecs: list[dict]) -> tuple[bytes, str]:
    """Apply the decode side of a v3 codec chain; returns (bytes, endian)."""
    endian = "little"
    for codec in reversed(codecs):
        name = codec.get("name")
        if name in ("gzip",):
            data = gzip.decompress(data)
        elif name in ("zlib",):
            data = zlib.decompress(data)
        elif name == "bytes":
            endian = codec.get("configuration", {}).get("endian", "little")
        elif name == "crc32c":
            data = data[:-4]  # checksum suffix
        else:
            raise ValueError(
                f"zarr codec {name!r} needs the 'zarr' package (not installed)"
            )
    return data, endian


def _read_array_v3(adir: str, meta: dict) -> tuple[tuple[str, ...], np.ndarray, dict]:
    shape = tuple(meta["shape"])
    dt = _V3_DTYPES[meta["data_type"]]
    chunk_shape = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
    sep = meta.get("chunk_key_encoding", {}).get("configuration", {}).get(
        "separator", "/"
    )
    key_name = meta.get("chunk_key_encoding", {}).get("name", "default")
    codecs = meta.get("codecs", [{"name": "bytes"}])
    fill = meta.get("fill_value", 0)

    out = np.full(shape, fill, dt)
    grid = [max(1, -(-s // c)) for s, c in zip(shape, chunk_shape)] or [1]
    for idx in itertools.product(*(range(g) for g in grid)):
        if key_name == "v2":
            key = sep.join(str(i) for i in idx) or "0"
        else:
            key = "c" + (sep + sep.join(str(i) for i in idx) if shape else "")
        p = os.path.join(adir, *key.split("/")) if sep == "/" else os.path.join(adir, key)
        if not os.path.exists(p):
            continue  # missing chunk = fill value (per spec)
        with open(p, "rb") as f:
            raw = f.read()
        raw, endian = _decompress(raw, codecs)
        cdt = dt.newbyteorder(">" if endian == "big" else "<")
        chunk = np.frombuffer(raw, cdt).reshape(chunk_shape)
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunk_shape, shape)
        )
        trim = tuple(slice(0, sl.stop - sl.start) for sl in slices)
        out[slices] = chunk[trim]
    dims = tuple(meta.get("dimension_names") or [f"dim_{i}" for i in range(len(shape))])
    return dims, out, meta.get("attributes", {})


def _read_array_v2(adir: str, meta: dict, attrs: dict) -> tuple[tuple[str, ...], np.ndarray, dict]:
    shape = tuple(meta["shape"])
    chunk_shape = tuple(meta["chunks"])
    dt = np.dtype(meta["dtype"])
    comp = meta.get("compressor")
    fill = meta.get("fill_value", 0)
    if meta.get("order", "C") != "C":
        raise ValueError("zarr v2 F-order arrays need the 'zarr' package")

    out = np.full(shape, 0 if fill is None else fill, dt)
    grid = [max(1, -(-s // c)) for s, c in zip(shape, chunk_shape)] or [1]
    for idx in itertools.product(*(range(g) for g in grid)):
        key = ".".join(str(i) for i in idx) or "0"
        p = os.path.join(adir, key)
        if not os.path.exists(p):
            continue
        with open(p, "rb") as f:
            raw = f.read()
        if comp:
            cid = comp.get("id")
            if cid == "zlib":
                raw = zlib.decompress(raw)
            elif cid == "gzip":
                raw = gzip.decompress(raw)
            else:
                raise ValueError(
                    f"zarr v2 compressor {cid!r} needs the 'zarr' package"
                )
        chunk = np.frombuffer(raw, dt).reshape(chunk_shape)
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunk_shape, shape)
        )
        trim = tuple(slice(0, sl.stop - sl.start) for sl in slices)
        out[slices] = chunk[trim]
    dims = tuple(
        attrs.get("_ARRAY_DIMENSIONS") or [f"dim_{i}" for i in range(len(shape))]
    )
    a = {k: v for k, v in attrs.items() if k != "_ARRAY_DIMENSIONS"}
    return dims, out, a


def read_zarr_store(path: str) -> tuple[dict, dict, dict, dict]:
    """Open a zarr v2/v3 directory store → (dims, variables, var_attrs,
    global_attrs) in GridDataset's shapes."""
    v3_root = os.path.join(path, "zarr.json")
    v2_group = os.path.join(path, ".zgroup")
    dims: dict[str, int] = {}
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]] = {}
    var_attrs: dict[str, dict] = {}
    global_attrs: dict = {}

    if os.path.exists(v3_root):
        with open(v3_root) as f:
            root = json.load(f)
        if root.get("node_type") == "array":
            dnames, arr, attrs = _read_array_v3(path, root)
            name = os.path.basename(path.rstrip("/")).removesuffix(".zarr")
            variables[name] = (dnames, arr)
            var_attrs[name] = attrs
        else:
            global_attrs = root.get("attributes", {})
            for entry in sorted(os.listdir(path)):
                adir = os.path.join(path, entry)
                ameta = os.path.join(adir, "zarr.json")
                if not os.path.isfile(ameta):
                    continue
                with open(ameta) as f:
                    meta = json.load(f)
                if meta.get("node_type") != "array":
                    continue
                dnames, arr, attrs = _read_array_v3(adir, meta)
                variables[entry] = (dnames, arr)
                var_attrs[entry] = attrs
    elif os.path.exists(v2_group) or os.path.exists(os.path.join(path, ".zarray")):
        gattrs_p = os.path.join(path, ".zattrs")
        if os.path.exists(gattrs_p):
            with open(gattrs_p) as f:
                global_attrs = json.load(f)
        for entry in sorted(os.listdir(path)):
            adir = os.path.join(path, entry)
            zarray = os.path.join(adir, ".zarray")
            if not os.path.isfile(zarray):
                continue
            with open(zarray) as f:
                meta = json.load(f)
            attrs = {}
            zattrs = os.path.join(adir, ".zattrs")
            if os.path.exists(zattrs):
                with open(zattrs) as f:
                    attrs = json.load(f)
            dnames, arr, a = _read_array_v2(adir, meta, attrs)
            variables[entry] = (dnames, arr)
            var_attrs[entry] = a
    else:
        raise ValueError(f"{path}: not a zarr v2/v3 directory store")

    for name, (dnames, arr) in variables.items():
        for d, s in zip(dnames, arr.shape):
            dims[d] = s
    return dims, variables, var_attrs, global_attrs

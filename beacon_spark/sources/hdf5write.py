"""Pure-Python minimal HDF5 writer — enough of the public HDF5 File
Format Specification (v3, hdfgroup.org) to produce spec-correct files
for the roundtrip gate on the pure-Python reader (hdf5lite.py):

  - superblock v0;
  - old-style root group (local heap + v1 B-tree + one SNOD);
  - v1 object headers; dataspace v1; datatype classes fixed-point /
    IEEE float / fixed string / compound (v1 members);
  - data layout v3: contiguous, or chunked with a v1 B-tree chunk
    index (edge chunks stored full-size, zero-padded, per spec);
  - filter pipeline v1: shuffle, deflate, fletcher32 (checksum over
    the post-compression bytes, little-endian trailer — the layout
    hdf5lite verifies);
  - attribute messages v1 (numeric scalars/1-D arrays, fixed strings).

The reader was validated against real libhdf5-written files
(tests/test_hdf5.py), so a writer→reader roundtrip is not a
matching-pair tautology: the reader side of every structure is pinned
by independent fixtures. Parity motivation: the reference reads HDF5
via beacon-arrow-hdf5 (src/lib.rs:1-10) but has no writer either —
this writer exists purely to let the driver's DuckDB oracle grade
read_hdf5 on data derived from the shared tables.

Not written (reader-side features covered by real fixtures instead):
superblock v2/v3, v2 object headers, dense links/attributes, v4
layouts, vlen types, dimension-scale (netCDF4) conventions.
"""

from __future__ import annotations

import contextlib
import itertools
import os
import struct
import zlib

import numpy as np

from beacon_spark.sources.hdf5lite import MAGIC, UNDEF, _fletcher32


class Hdf5WriteError(ValueError):
    pass


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _le(dt: np.dtype) -> np.dtype:
    """Little-endian twin of a (possibly structured) dtype."""
    dt = np.dtype(dt)
    if dt.names:
        return np.dtype({
            "names": list(dt.names),
            "formats": [_le(dt.fields[n][0]) for n in dt.names],
            "offsets": [dt.fields[n][1] for n in dt.names],
            "itemsize": dt.itemsize,
        })
    return dt.newbyteorder("<") if dt.byteorder == ">" else dt


# ---------------------------------------------------------- datatypes


_FLOAT_PROPS = {
    # size -> (sign-pos, precision, exp-loc, exp-size, man-loc, man-size, bias)
    2: (15, 16, 10, 5, 0, 10, 15),
    4: (31, 32, 23, 8, 0, 23, 127),
    8: (63, 64, 52, 11, 0, 52, 1023),
}


def encode_datatype(dt: np.dtype) -> bytes:
    """Datatype message body for a little-endian numpy dtype."""
    dt = np.dtype(dt)
    if dt.names:  # compound, v1 member encoding
        n = len(dt.names)
        out = bytearray(
            struct.pack("<BBBBI", 0x16, n & 0xFF, (n >> 8) & 0xFF, 0,
                        dt.itemsize))
        for name in dt.names:
            mdt, off = dt.fields[name][:2]
            out += _pad8(name.encode("utf-8") + b"\x00")
            out += struct.pack("<I", off)
            out += struct.pack("<B3x", 0)       # dimensionality + reserved
            out += b"\x00" * 24                 # perm + reserved + dim sizes
            out += encode_datatype(mdt)
        return bytes(out)
    if dt.kind in "iu":
        bits0 = 0x08 if dt.kind == "i" else 0x00  # signed, little-endian
        return struct.pack("<BBBBIHH", 0x10, bits0, 0, 0, dt.itemsize,
                           0, dt.itemsize * 8)
    if dt.kind == "f":
        if dt.itemsize not in _FLOAT_PROPS:
            raise Hdf5WriteError(f"float size {dt.itemsize}")
        sgn, prec, eloc, esz, mloc, msz, bias = _FLOAT_PROPS[dt.itemsize]
        return struct.pack("<BBBBIHHBBBBI", 0x11, 0x20, sgn, 0,
                           dt.itemsize, 0, prec, eloc, esz, mloc, msz, bias)
    if dt.kind == "S":
        # null-terminated ASCII fixed string
        return struct.pack("<BBBBI", 0x13, 0, 0, 0, dt.itemsize)
    raise Hdf5WriteError(f"unsupported dtype {dt}")


def _dataspace(shape: tuple[int, ...]) -> bytes:
    return (struct.pack("<BB6x", 1, len(shape))
            + b"".join(struct.pack("<Q", s) for s in shape))


def _attr_msg(name: str, value) -> bytes:
    """Attribute message v1."""
    if isinstance(value, str):
        data = value.encode("utf-8")
        arr = np.frombuffer(data or b"\x00", dtype=f"S{max(len(data), 1)}")
        shape: tuple[int, ...] = ()
    else:
        arr = np.ascontiguousarray(value)
        shape = arr.shape if arr.ndim else ()
        if arr.ndim > 1:
            raise Hdf5WriteError("attribute rank > 1")
        if arr.dtype.byteorder == ">" or any(
                dt.byteorder == ">" for dt, _ in
                (arr.dtype.fields or {}).values()):
            # mirror the dataset path: encode_datatype always declares
            # little-endian, so BE attribute bytes under it would
            # roundtrip silently corrupted ([5,6] as >i4 reads back as
            # [83886080, 100663296])
            arr = arr.astype(_le(arr.dtype))
    if not name or "\x00" in name:
        raise Hdf5WriteError(f"invalid attribute name {name!r}")
    name_b = name.encode("utf-8") + b"\x00"
    dt_b = encode_datatype(arr.dtype)
    ds_b = _dataspace(shape)
    return (struct.pack("<BBHHH", 1, 0, len(name_b), len(dt_b), len(ds_b))
            + _pad8(name_b) + _pad8(dt_b) + _pad8(ds_b) + arr.tobytes())


# -------------------------------------------------------------- filters


_FILTER_IDS = {"deflate": 1, "shuffle": 2, "fletcher32": 3}


def _filter_pipeline_msg(filters: list[tuple], itemsize: int) -> bytes:
    out = bytearray(struct.pack("<BB6x", 1, len(filters)))
    for f in filters:
        kind = f[0]
        fid = _FILTER_IDS.get(kind)
        if fid is None:
            raise Hdf5WriteError(f"unknown filter {kind!r}")
        if kind == "deflate":
            cvals: tuple[int, ...] = (f[1] if len(f) > 1 else 6,)
        elif kind == "shuffle":
            cvals = (itemsize,)
        else:
            cvals = ()
        out += struct.pack("<HHHH", fid, 0, 0, len(cvals))
        out += b"".join(struct.pack("<I", v) for v in cvals)
        if len(cvals) % 2:
            out += b"\x00" * 4
    return bytes(out)


def _apply_write_filters(data: bytes, filters: list[tuple],
                         itemsize: int) -> bytes:
    """Pipeline order = application order on write (spec); the reader
    undoes them in reverse."""
    for f in filters:
        kind = f[0]
        if kind == "shuffle" and itemsize > 1:
            nel = len(data) // itemsize
            arr = np.frombuffer(data[: nel * itemsize], "u1")
            data = (arr.reshape(nel, itemsize).T.reshape(-1).tobytes()
                    + data[nel * itemsize:])
        elif kind == "deflate":
            data = zlib.compress(data, f[1] if len(f) > 1 else 6)
        elif kind == "fletcher32":
            data = data + struct.pack("<I", _fletcher32(data))
    return data


# ------------------------------------------------------------- headers


def _v1_header(msgs: list[tuple[int, bytes]]) -> bytes:
    blob = bytearray()
    for mtype, body in msgs:
        body_p = _pad8(body)
        blob += struct.pack("<HHB3x", mtype, len(body_p), 0) + body_p
    return (struct.pack("<BBHII4x", 1, 0, len(msgs), 1, len(blob))
            + bytes(blob))


def _vlen_str_datatype() -> bytes:
    """Variable-length STRING datatype message (class 9, type=string):
    16-byte heap descriptors (<IQI> size, gcol addr, gcol index) over a
    1-byte character base — the encoding netCDF-4's NC_STRING uses and
    hdf5lite.parse_datatype recognizes as is_vlen_str."""
    return (struct.pack("<BBBBI", 0x19, 0x01, 0, 0, 16)
            + struct.pack("<BBBBI", 0x13, 0, 0, 0, 1))


def _vlen_descriptors(builder: "_Builder", payloads: list[bytes]) -> bytes:
    """Write ``payloads`` into global heap collection(s) (chunked at
    60k objects — heap indexes are u16) and return the packed 16-byte
    descriptor stream referencing them."""
    descs = bytearray()
    i = 0
    while i < len(payloads):
        group = payloads[i:i + 60_000]
        gaddr = builder.alloc(_gcol_block(group))
        for j, p in enumerate(group, start=1):
            descs += struct.pack("<IQI", len(p), gaddr, j)
        i += len(group)
    return bytes(descs)


# ---------------------------------------------------------- the writer


class _Builder:
    """Incremental single-file builder: datasets append in call order,
    the root group + superblock land in :meth:`finish`. Exists so the
    netCDF-4 layer can write dimension datasets FIRST (their object
    header addresses feed the DIMENSION_LIST object references of the
    data variables written after).

    Two backings: in-memory (default — one bytearray dumped at finish)
    or FILE-BACKED (``path=`` given): every ``alloc`` appends straight
    to disk, so a streamed export's chunk data never accumulates on the
    driver (the reference streams COPY TO through a temp file,
    beacon-core/src/runtime.rs:192-246). The 96-byte superblock slot is
    reserved up front and patched at finish in both modes."""

    def __init__(self, path: str | None = None) -> None:
        self.ds_addrs: dict[str, int] = {}
        if path is None:
            self.buf: bytearray | None = bytearray(96)
            self._f = None
        else:
            self.buf = None
            self._f = open(path, "w+b")
            self._f.write(b"\x00" * 96)
            self._end = 96

    def alloc(self, data: bytes) -> int:
        if self._f is not None:
            pad = -self._end % 8
            if pad:
                self._f.write(b"\x00" * pad)
                self._end += pad
            addr = self._end
            self._f.write(data)
            self._end += len(data)
            return addr
        while len(self.buf) % 8:
            self.buf.append(0)
        addr = len(self.buf)
        self.buf.extend(data)
        return addr

    def _chunk_btree(self, chunks, dims: tuple[int, ...]) -> int:
        """Multi-level v1 B-tree chunk index (node type 1), max 64
        entries per node. A v0 superblock carries no indexed-storage K,
        so libhdf5 assumes its default K=32 and REJECTS any chunk-btree
        node with more than 2K=64 children ("number of children exceeds
        maximum") — a single flat leaf made every >64-chunk file
        unreadable by h5py/netCDF-C/ncdump (ADVICE r14 high). Entries
        are stacked into internal levels as deep as needed, so exports
        of any size index correctly. Sibling pointers stay UNDEF:
        read paths (libhdf5 H5B__find / H5B__iterate_helper) descend
        from the root and never follow them; they only matter for
        in-place inserts, which a write-once file never does.

        ``chunks`` = ordered ``(offsets_tuple, chunk_addr, stored_size)``;
        ``dims`` = dataset dims (the past-the-end max key, spec)."""
        k2 = 64
        def key(size: int, mask: int, offs) -> bytes:
            # size, filter mask, one offset per dim + the elem-size dim
            return (struct.pack("<II", size, mask)
                    + b"".join(struct.pack("<Q", o) for o in offs)
                    + struct.pack("<Q", 0))
        maxkey = key(0, 0, dims)
        entries = [(key(csize, 0, offs), caddr)
                   for offs, caddr, csize in chunks]
        level = 0
        while True:
            groups = ([entries[i: i + k2]
                       for i in range(0, len(entries), k2)] or [[]])
            nodes = []
            for gi, g in enumerate(groups):
                # trailing key = first key of the right sibling's
                # subtree; past-the-end for the rightmost node (spec)
                nxt = groups[gi + 1][0][0] if gi + 1 < len(groups) else maxkey
                node = bytearray(b"TREE" + bytes([1, level])
                                 + struct.pack("<HQQ", len(g), UNDEF, UNDEF))
                for k, child in g:
                    node += k + struct.pack("<Q", child)
                node += nxt
                nodes.append((g[0][0] if g else maxkey,
                              self.alloc(bytes(node))))
            if len(nodes) == 1:
                return nodes[0][1]
            entries = nodes
            level += 1

    def dataset(
        self,
        name: str,
        arr: np.ndarray,
        cshape: tuple[int, ...] | None = None,
        flts: list[tuple] | None = None,
        attrs: dict | None = None,
        raw_attr_msgs: tuple[bytes, ...] = (),
    ) -> int:
        if not name or "/" in name or "\x00" in name:
            # link names are NUL-terminated heap strings and '/' is the
            # path separator — either would corrupt the group walk
            raise Hdf5WriteError(f"invalid dataset name {name!r}")
        arr = np.ascontiguousarray(arr)
        if arr.dtype.byteorder == ">" or any(
                dt.byteorder == ">" for dt, _ in
                (arr.dtype.fields or {}).values()):
            # the datatype message is encoded little-endian; writing
            # big-endian bytes under it would be silent corruption
            arr = arr.astype(_le(arr.dtype))
        itemsize = arr.dtype.itemsize
        flts = flts or []
        msgs: list[tuple[int, bytes]] = [
            (0x01, _dataspace(tuple(arr.shape))),
            (0x03, encode_datatype(arr.dtype)),
            (0x05, bytes([2, 1, 0, 0])),  # fill v2: undefined
        ]
        if flts and cshape is None:
            raise Hdf5WriteError(f"{name}: filters require a chunked layout")
        if cshape is None:
            addr = self.alloc(arr.tobytes())
            msgs.append((0x08, struct.pack("<BBQQ", 3, 1, addr,
                                           arr.nbytes)))
        else:
            if len(cshape) != arr.ndim:
                raise Hdf5WriteError(f"{name}: chunk rank mismatch")
            if any(c < 1 for c in cshape):
                raise Hdf5WriteError(f"{name}: chunk dims must be >= 1")
            grid = [-(-s // c) for s, c in zip(arr.shape, cshape)]
            chunks: list[tuple[tuple[int, ...], int, int]] = []
            for idx in itertools.product(*(range(g) for g in grid)):
                offs = tuple(i * c for i, c in zip(idx, cshape))
                # edge chunks are stored FULL-SIZE, zero-padded (spec)
                chunk = np.zeros(cshape, arr.dtype)
                sel = tuple(
                    slice(0, min(o + c, s) - o)
                    for o, c, s in zip(offs, cshape, arr.shape))
                src = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(offs, cshape, arr.shape))
                chunk[sel] = arr[src]
                raw = _apply_write_filters(chunk.tobytes(), flts, itemsize)
                chunks.append((offs, self.alloc(raw), len(raw)))
            btree_addr = self._chunk_btree(chunks, arr.shape)
            lay = (struct.pack("<BBBQ", 3, 2, arr.ndim + 1, btree_addr)
                   + b"".join(struct.pack("<I", c) for c in cshape)
                   + struct.pack("<I", itemsize))
            msgs.append((0x08, lay))
            if flts:
                msgs.append((0x0B, _filter_pipeline_msg(flts, itemsize)))
        for aname, aval in (attrs or {}).items():
            msgs.append((0x0C, _attr_msg(aname, aval)))
        for raw in raw_attr_msgs:
            msgs.append((0x0C, raw))
        addr = self.alloc(_v1_header(msgs))
        self.ds_addrs[name] = addr
        return addr

    def dataset_placeholder(
        self,
        name: str,
        dtype: np.dtype,
        shape: tuple[int, ...],
        attrs: dict | None = None,
    ) -> int:
        """Dataset whose data is NEVER allocated: contiguous layout at
        the UNDEF address (spec: "data not yet allocated"; libhdf5 does
        the same lazy allocation). Readers serve the fill value. This is
        how a streamed export writes a billion-element pure-dimension
        carrier in 0 bytes instead of materializing 4 GB of zeros."""
        dtype = _le(np.dtype(dtype))
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
        msgs: list[tuple[int, bytes]] = [
            (0x01, _dataspace(tuple(shape))),
            (0x03, encode_datatype(dtype)),
            (0x05, bytes([2, 1, 0, 0])),  # fill v2: undefined
            (0x08, struct.pack("<BBQQ", 3, 1, UNDEF, nbytes)),
        ]
        for aname, aval in (attrs or {}).items():
            msgs.append((0x0C, _attr_msg(aname, aval)))
        addr = self.alloc(_v1_header(msgs))
        self.ds_addrs[name] = addr
        return addr

    def dataset_vlen_str(
        self,
        name: str,
        arr: np.ndarray,
        attrs: dict | None = None,
        raw_attr_msgs: tuple[bytes, ...] = (),
    ) -> int:
        """Variable-length UTF-8 string dataset: values live in global
        heap collections, the dataset data is the 16-byte descriptor
        stream (contiguous layout). This is netCDF-4's NC_STRING — the
        DIVERGENCES #6 residual the fixed-width `S` encoding left
        open."""
        if not name or "/" in name or "\x00" in name:
            raise Hdf5WriteError(f"invalid dataset name {name!r}")
        arr = np.asarray(arr)
        payloads = [("" if s is None else str(s)).encode("utf-8")
                    for s in arr.ravel()]
        descs = _vlen_descriptors(self, payloads)
        data_addr = self.alloc(descs)
        msgs: list[tuple[int, bytes]] = [
            (0x01, _dataspace(tuple(arr.shape))),
            (0x03, _vlen_str_datatype()),
            (0x05, bytes([2, 1, 0, 0])),
            (0x08, struct.pack("<BBQQ", 3, 1, data_addr, len(descs))),
        ]
        for aname, aval in (attrs or {}).items():
            msgs.append((0x0C, _attr_msg(aname, aval)))
        for raw in raw_attr_msgs:
            msgs.append((0x0C, raw))
        addr = self.alloc(_v1_header(msgs))
        self.ds_addrs[name] = addr
        return addr

    def begin_stream_dataset(
        self,
        name: str,
        dtype: np.dtype,
        nrows: int,
        chunk_rows: int = 1 << 16,
        flts: list[tuple] | None = None,
        attrs: dict | None = None,
        raw_attr_msgs: tuple[bytes, ...] = (),
        dtype_msg: bytes | None = None,
        shape: tuple[int, ...] | None = None,
    ) -> dict:
        """Open a chunked dataset to be fed incrementally via
        :meth:`stream_values` — chunk data flows to the backing as each
        chunk fills, so peak memory is ONE chunk buffer, never the
        column. The v1-btree chunk index and object header are emitted
        by :meth:`end_stream_dataset` (their addresses only exist once
        all chunks have landed).

        Default shape is 1-D ``(nrows,)``. An explicit N-D ``shape``
        (the streamed re-gridded NetCDF-4 export) streams the grid's
        FLAT C-order values; chunking is along the first dimension only
        — chunk shape ``(chunk_rows, *shape[1:])`` — so a streamed
        prefix is always a whole number of dim-0 slabs."""
        if not name or "/" in name or "\x00" in name:
            raise Hdf5WriteError(f"invalid dataset name {name!r}")
        dtype = _le(np.dtype(dtype))
        shape = tuple(int(s) for s in (shape or (nrows,)))
        row_width = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
        if int(nrows) != int(np.prod(shape, dtype=np.int64)):
            raise Hdf5WriteError(
                f"{name}: nrows {nrows} != prod(shape {shape})")
        # the multi-level chunk btree (_chunk_btree) indexes any chunk
        # count — no cap-driven widening needed; clamp so one chunk
        # buffer stays bounded when trailing dims are wide
        chunk_rows = max(int(chunk_rows), 1)
        if row_width > 1:
            chunk_rows = max(1, min(chunk_rows,
                                    -(-(1 << 16) // row_width)))
        return {
            "name": name, "dtype": dtype, "nrows": int(nrows),
            "shape": shape, "row_width": row_width,
            "chunk_rows": chunk_rows, "flts": list(flts or []),
            "attrs": dict(attrs or {}), "raw": tuple(raw_attr_msgs),
            "dtype_msg": dtype_msg,
            "pend": np.empty(0, dtype), "written": 0,
            "chunks": [],  # (elem_offset, addr, stored_size)
        }

    def stream_values(self, st: dict, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        if arr.dtype != st["dtype"]:
            arr = arr.astype(st["dtype"])
        if arr.ndim != 1:
            raise Hdf5WriteError(f"{st['name']}: stream values must be 1-D")
        pend = np.concatenate([st["pend"], arr]) if len(st["pend"]) else arr
        itemsize = st["dtype"].itemsize
        ce = st["chunk_rows"] * st["row_width"]  # elements per chunk
        while len(pend) >= ce:
            chunk, pend = pend[:ce], pend[ce:]
            raw = _apply_write_filters(
                np.ascontiguousarray(chunk).tobytes(), st["flts"], itemsize)
            st["chunks"].append((st["written"], self.alloc(raw), len(raw)))
            st["written"] += ce
        st["pend"] = pend

    def end_stream_dataset(self, st: dict) -> int:
        name, dtype = st["name"], st["dtype"]
        cr, itemsize = st["chunk_rows"], dtype.itemsize
        ce = cr * st["row_width"]
        pend = st["pend"]
        if len(pend):
            # final edge chunk: stored FULL-SIZE, zero-padded (spec)
            chunk = np.zeros(ce, dtype)
            chunk[: len(pend)] = pend
            raw = _apply_write_filters(chunk.tobytes(), st["flts"], itemsize)
            st["chunks"].append((st["written"], self.alloc(raw), len(raw)))
            st["written"] += len(pend)
        if st["written"] != st["nrows"]:
            raise Hdf5WriteError(
                f"{name}: streamed {st['written']} values, declared "
                f"{st['nrows']}")
        nd_pad = (0,) * (len(st["shape"]) - 1)
        btree_addr = self._chunk_btree(
            [((off // max(st["row_width"], 1),) + nd_pad, caddr, csize)
             for off, caddr, csize in st["chunks"]],
            st["shape"])
        cshape = (cr,) + st["shape"][1:]
        msgs: list[tuple[int, bytes]] = [
            (0x01, _dataspace(st["shape"])),
            (0x03, st["dtype_msg"] or encode_datatype(dtype)),
            (0x05, bytes([2, 1, 0, 0])),
            (0x08, struct.pack("<BBBQ", 3, 2, len(cshape) + 1, btree_addr)
             + b"".join(struct.pack("<I", c) for c in cshape)
             + struct.pack("<I", itemsize)),
        ]
        if st["flts"]:
            msgs.append((0x0B, _filter_pipeline_msg(st["flts"], itemsize)))
        for aname, aval in st["attrs"].items():
            msgs.append((0x0C, _attr_msg(aname, aval)))
        for raw in st["raw"]:
            msgs.append((0x0C, raw))
        addr = self.alloc(_v1_header(msgs))
        self.ds_addrs[name] = addr
        return addr

    #: Group Leaf Node K declared in the superblock. libhdf5 validates
    #: every symbol-table node against the DECLARED K (`nsyms > 2K` →
    #: "too many symbols") — the old default-matching K=4 capped a
    #: readable root group at 8 datasets, so a 10-column flat netcdf4
    #: export was unreadable by h5py/netCDF-C (same failure class as
    #: the r14 chunk-btree fix; caught by inspection while closing it).
    #: 512 → one SNOD legally holds 1024 symbols (41 KB node).
    GROUP_LEAF_K = 512

    def finish(self, path: str, global_attrs: dict | None = None) -> None:
        # ---- root group: local heap + v1 B-tree + one SNOD -----------
        names = sorted(self.ds_addrs)
        if len(names) > 2 * self.GROUP_LEAF_K:
            raise Hdf5WriteError(
                f"too many datasets for a single SNOD "
                f"({len(names)} > {2 * self.GROUP_LEAF_K})")
        heap = bytearray(8)  # offset 0 reserved (empty name)
        name_off: dict[str, int] = {}
        for n in names:
            name_off[n] = len(heap)
            heap += _pad8(n.encode("utf-8") + b"\x00")
        heap_data_addr = self.alloc(bytes(heap))
        heap_addr = self.alloc(
            b"HEAP" + bytes([0, 0, 0, 0])
            + struct.pack("<QQQ", len(heap), 1, heap_data_addr))
        snod = bytearray(b"SNOD" + bytes([1, 0])
                         + struct.pack("<H", len(names)))
        for n in names:
            snod += struct.pack("<QQII16x", name_off[n],
                                self.ds_addrs[n], 0, 0)
        snod_addr = self.alloc(bytes(snod))
        btree_addr = self.alloc(
            b"TREE" + bytes([0, 0]) + struct.pack("<HQQ", 1, UNDEF, UNDEF)
            + struct.pack("<QQQ", 0, snod_addr,
                          name_off[names[-1]] if names else 0))
        root_msgs: list[tuple[int, bytes]] = [
            (0x11, struct.pack("<QQ", btree_addr, heap_addr))]
        for aname, aval in (global_attrs or {}).items():
            root_msgs.append((0x0C, _attr_msg(aname, aval)))
        root_addr = self.alloc(_v1_header(root_msgs))

        # ---- superblock v0 ------------------------------------------
        if self._f is not None:
            pad = -self._end % 8
            if pad:
                self._f.write(b"\x00" * pad)
                self._end += pad
            eof = self._end
        else:
            buf = self.buf
            while len(buf) % 8:
                buf.append(0)
            eof = len(buf)
        sb = bytearray(MAGIC)
        sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])       # versions + sizes
        # group leaf/internal K + flags — leaf K must cover the SNOD's
        # actual symbol count (libhdf5 validates nsyms ≤ 2K on decode)
        sb += struct.pack("<HHI", self.GROUP_LEAF_K, 16, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        sb += struct.pack("<QQII16x", 0, root_addr, 0, 0)  # root STE
        assert len(sb) == 96
        if self._f is not None:
            self._f.seek(0)
            self._f.write(sb)
            self._f.close()
            return
        buf[:96] = sb
        with open(path, "wb") as f:
            f.write(buf)


def write_hdf5(
    path: str,
    variables: dict[str, np.ndarray],
    global_attrs: dict | None = None,
    var_attrs: dict[str, dict] | None = None,
    chunk_shapes: dict[str, tuple[int, ...]] | None = None,
    filters: dict[str, list[tuple]] | None = None,
) -> None:
    """Write `variables` (name → numpy array; numeric, fixed-string, or
    structured/compound dtype) as root-level datasets of a valid HDF5
    file. A name in `chunk_shapes` gets a chunked v1-B-tree layout
    (else contiguous); its `filters` entry is an ordered list drawn
    from ("shuffle",), ("deflate", level), ("fletcher32",)."""
    b = _Builder()
    for name, arr in variables.items():
        b.dataset(name, np.asarray(arr),
                  cshape=(chunk_shapes or {}).get(name),
                  flts=(filters or {}).get(name),
                  attrs=(var_attrs or {}).get(name))
    b.finish(path, global_attrs)


# ----------------------------------------------------- netCDF-4 flavor


_PURE_DIM_SENTINEL = "This is a netCDF dimension but not a netCDF variable"


def _gcol_block(payloads: list[bytes]) -> bytes:
    """Global heap collection holding `payloads` at indexes 1..n."""
    body = bytearray(b"GCOL" + bytes([1, 0, 0, 0]) + b"\x00" * 8)
    for i, p in enumerate(payloads, start=1):
        body += struct.pack("<HH4xQ", i, 1, len(p)) + _pad8(p)
    body += struct.pack("<HH4xQ", 0, 0, 0)  # terminator
    struct.pack_into("<Q", body, 8, len(body))
    return bytes(body)


def _dimension_list_attr(entries: list[tuple[int, int]]) -> bytes:
    """DIMENSION_LIST attribute message body: a 1-D array (one element
    per dataset dimension) of vlen(object reference), each vlen holding
    ONE reference — the dimension-scale dataset's object header
    address, resolved via the global heap (netcdf.hdf5 convention; the
    reader side is hdf5lite.read_hdf5_grid)."""
    name_b = b"DIMENSION_LIST\x00"
    dt_b = (struct.pack("<BBBBI", 0x19, 0x00, 0, 0, 16)   # vlen sequence
            + struct.pack("<BBBBI", 0x17, 0, 0, 0, 8))    # of object ref
    ds_b = _dataspace((len(entries),))
    data = b"".join(struct.pack("<IQI", 1, gaddr, gidx)
                    for gaddr, gidx in entries)
    return (struct.pack("<BBHHH", 1, 0, len(name_b), len(dt_b), len(ds_b))
            + _pad8(name_b) + _pad8(dt_b) + _pad8(ds_b) + data)


def write_netcdf4(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
    var_attrs: dict[str, dict] | None = None,
    global_attrs: dict | None = None,
    chunk_shapes: dict[str, tuple[int, ...]] | None = None,
    filters: dict[str, list[tuple]] | None = None,
    vlen_strings: bool = False,
) -> None:
    """NetCDF-4-convention HDF5 file: `dims` name dimension sizes;
    `variables` maps name → (dim names, array). A variable named like a
    dim is its coordinate variable; dims without one get a pure-dim
    carrier dataset (the netCDF-c sentinel NAME). Every dataset carries
    CLASS/NAME (scales) or DIMENSION_LIST (data variables) per the
    netcdf.hdf5 convention, so NetCDF-4 readers — including our own
    read_netcdf/read_hdf5 path — recover the named grid.

    Unicode string arrays are written as fixed-width UTF-8 `S` strings
    by default (vectorized read-back), or as TRUE variable-length
    strings — netCDF-4's NC_STRING, values on the global heap — with
    ``vlen_strings=True`` (closes DIVERGENCES #6's last residual; reads
    resolve per-element heap lookups, so fixed-width stays the default
    for large exports)."""
    var_attrs = dict(var_attrs or {})
    b = _Builder()

    def _is_str(arr) -> bool:
        return np.asarray(arr).dtype.kind in ("U", "O")

    def _as_bytes(arr: np.ndarray) -> np.ndarray:
        arr = np.asarray(arr)
        if arr.dtype.kind == "U":
            enc = np.char.encode(arr, "utf-8")
            width = max(1, enc.dtype.itemsize)
            return enc.astype(f"S{width}")
        if arr.dtype == object:
            return _as_bytes(arr.astype("U"))
        return arr

    # 1) dimension-scale datasets first — their addresses seed the refs
    for dname, size in dims.items():
        if dname in variables:
            ddims, coord = variables[dname]
            if tuple(ddims) != (dname,):
                raise Hdf5WriteError(
                    f"coordinate variable {dname!r} must span ({dname},)")
            vlen_coord = vlen_strings and _is_str(coord)
            coord = np.asarray(coord) if vlen_coord else _as_bytes(coord)
            if coord.shape != (size,):
                raise Hdf5WriteError(
                    f"coordinate {dname!r}: shape {coord.shape} != ({size},)")
            name_attr = dname
        else:
            vlen_coord = False
            coord = np.zeros(size, np.float32)
            name_attr = f"{_PURE_DIM_SENTINEL}.{size:>10}"
        # user attrs first, conventions LAST: a caller-supplied CLASS/
        # NAME must not clobber the dimension-scale convention (it would
        # silently break named-grid readback); reject an explicit
        # conflict loudly rather than ignoring it
        user = dict(var_attrs.get(dname) or {})
        for k in ("CLASS", "NAME", "REFERENCE_LIST"):
            if k in user:
                raise Hdf5WriteError(
                    f"coordinate {dname!r}: attribute {k!r} is reserved "
                    "by the netCDF-4 dimension-scale convention")
        attrs = dict(user)
        attrs["CLASS"] = "DIMENSION_SCALE"
        attrs["NAME"] = name_attr
        if vlen_coord:
            b.dataset_vlen_str(dname, coord, attrs=attrs)
        else:
            b.dataset(dname, coord, cshape=(chunk_shapes or {}).get(dname),
                      flts=(filters or {}).get(dname), attrs=attrs)

    # 2) one global-heap object per (variable, dim) reference
    data_vars = [(n, v) for n, v in variables.items() if n not in dims]
    payloads: list[bytes] = []
    idx_of: dict[tuple[str, int], int] = {}
    for name, (vdims, _arr) in data_vars:
        for k, d in enumerate(vdims):
            if d not in dims:
                raise Hdf5WriteError(f"{name}: unknown dimension {d!r}")
            idx_of[(name, k)] = len(payloads) + 1
            payloads.append(struct.pack("<Q", b.ds_addrs[d]))
    gaddr = b.alloc(_gcol_block(payloads)) if payloads else 0

    # 3) data variables with their DIMENSION_LIST
    for name, (vdims, arr) in data_vars:
        vlen_var = vlen_strings and _is_str(arr)
        arr = np.asarray(arr) if vlen_var else _as_bytes(arr)
        want = tuple(dims[d] for d in vdims)
        if arr.shape != want:
            raise Hdf5WriteError(
                f"{name}: shape {arr.shape} != dims {vdims} = {want}")
        dl = _dimension_list_attr(
            [(gaddr, idx_of[(name, k)]) for k in range(len(vdims))])
        if vlen_var:
            if (chunk_shapes or {}).get(name) or (filters or {}).get(name):
                raise Hdf5WriteError(
                    f"{name}: vlen-string data lives on the global heap; "
                    "chunking/filters apply only to the descriptors and "
                    "are not supported")
            b.dataset_vlen_str(name, arr, attrs=var_attrs.get(name),
                               raw_attr_msgs=(dl,) if vdims else ())
        else:
            b.dataset(name, arr, cshape=(chunk_shapes or {}).get(name),
                      flts=(filters or {}).get(name),
                      attrs=var_attrs.get(name),
                      raw_attr_msgs=(dl,) if vdims else ())
    b.finish(path, global_attrs)


class Nc4StreamWriter:
    """Streamed FLAT NetCDF-4 writer: one record dimension (``obs``),
    each column a 1-D chunked dataset fed batch-by-batch — the HDF5
    container is file-backed (chunks land on disk as they arrive), so
    peak driver memory is one chunk buffer per variable, never the
    result. This is the COPY TO stream the reference runs for every
    output format (beacon-core/src/runtime.rs:192-246), re-expressed
    for the HDF5 container; the materialized ``write_netcdf4`` remains
    for the re-gridded (dimension_columns) shape, whose unit of work is
    one dense grid anyway.

    Contract (mirrors netcdf3.FlatStreamWriter): declare every column
    up front (``specs``: name → numpy dtype, strings pre-sized as
    ``S<w>``), then call :meth:`write_values` variable-by-variable —
    each variable's batches contiguous, in ``specs`` order, ``obs``
    first if it is a column — and :meth:`close`. Variables never
    written stream as all-fill (zero-row results included).
    """

    def __init__(
        self,
        path: str,
        nrows: int,
        specs: dict[str, np.dtype],
        var_attrs: dict[str, dict] | None = None,
        global_attrs: dict | None = None,
        chunk_rows: int = 1 << 16,
        filters: dict[str, list[tuple]] | None = None,
    ) -> None:
        self._b = _Builder(path)
        self._path = path
        self._nrows = int(nrows)
        self._specs = {n: _le(np.dtype(dt)) for n, dt in specs.items()}
        self._attrs = {n: dict(a or {}) for n, a in (var_attrs or {}).items()}
        self._global = dict(global_attrs or {})
        self._chunk_rows = chunk_rows
        self._filters = dict(filters or {})
        self._done: set[str] = set()
        self._cur: str | None = None
        self._cur_st: dict | None = None
        self._gaddr: int | None = None
        self._idx_of: dict[str, int] = {
            n: i + 1 for i, n in enumerate(n for n in self._specs
                                           if n != "obs")}
        if "obs" not in self._specs:
            # anonymous record dimension: 0-byte placeholder carrier
            # (contiguous layout at UNDEF — data never allocated)
            self._b.dataset_placeholder(
                "obs", np.float32, (self._nrows,),
                attrs={"CLASS": "DIMENSION_SCALE",
                       "NAME": f"{_PURE_DIM_SENTINEL}.{self._nrows:>10}"})

    def _ensure_gcol(self) -> int:
        """The global heap holds one object-reference payload per data
        variable, each the ``obs`` dim dataset's header address — which
        exists only after obs lands (placeholder in __init__, or the
        streamed coordinate's end_stream_dataset)."""
        if self._gaddr is None:
            if "obs" not in self._b.ds_addrs:
                raise Hdf5WriteError(
                    "the 'obs' coordinate column must be streamed first "
                    "(its dataset address seeds every DIMENSION_LIST)")
            payloads = [struct.pack("<Q", self._b.ds_addrs["obs"])
                        for _ in self._idx_of]
            self._gaddr = (self._b.alloc(_gcol_block(payloads))
                           if payloads else 0)
        return self._gaddr

    def _begin(self, name: str) -> None:
        if name not in self._specs:
            raise Hdf5WriteError(f"undeclared variable {name!r}")
        if name in self._done:
            raise Hdf5WriteError(
                f"{name}: variables must stream contiguously, in order")
        attrs = dict(self._attrs.get(name) or {})
        if name == "obs":
            # a result column literally named obs IS the coordinate
            attrs["CLASS"] = "DIMENSION_SCALE"
            attrs["NAME"] = "obs"
            raw: tuple[bytes, ...] = ()
        else:
            dl = _dimension_list_attr(
                [(self._ensure_gcol(), self._idx_of[name])])
            raw = (dl,)
        self._cur = name
        self._cur_st = self._b.begin_stream_dataset(
            name, self._specs[name], self._nrows,
            chunk_rows=self._chunk_rows,
            flts=self._filters.get(name), attrs=attrs, raw_attr_msgs=raw)

    def _finish_cur(self) -> None:
        if self._cur is not None:
            self._b.end_stream_dataset(self._cur_st)
            self._done.add(self._cur)
            self._cur = self._cur_st = None

    def write_values(self, name: str, values: np.ndarray) -> None:
        if name != self._cur:
            self._finish_cur()
            self._begin(name)
        self._b.stream_values(self._cur_st, values)

    def close(self) -> None:
        self._finish_cur()
        for name in self._specs:
            if name not in self._done:
                if self._nrows:
                    raise Hdf5WriteError(
                        f"{name}: no values streamed for a {self._nrows}"
                        "-row dimension")
                self._begin(name)
                self._finish_cur()
        self._b.finish(self._path, self._global)

    def abort(self) -> None:
        """Close AND REMOVE the backing file without finalizing (error
        paths) — a truncated file left behind could be mistaken for a
        complete export."""
        f = self._b._f
        if f is not None and not f.closed:
            f.close()
        with contextlib.suppress(OSError):
            os.unlink(self._path)


class GridNc4StreamWriter:
    """Streamed RE-GRIDDED NetCDF-4 writer (r14 — lifts the last
    driver-materialization cap; the reference streams every COPY TO,
    beacon-core/src/runtime.rs:192-246, learning dim values while
    streaming via UniqueValuesExec,
    beacon-datafusion-ext/src/unique_values.rs:1-13).

    Coordinate variables are small by definition and are written
    materialized up front — their dataset addresses seed every data
    variable's DIMENSION_LIST. Each DATA variable is an N-D grid over
    ALL dims, fed as flat C-order values via :meth:`write_values`
    (contiguous per variable, in ``specs`` order) and spilled
    chunk-by-chunk through the file-backed builder, so the writer's own
    peak memory is one chunk buffer. The value semantics mirror the
    materialized ``write_netcdf4`` regrid shape exactly: numeric grids
    NaN-filled float64, strings fixed-width ``S`` UTF-8.
    """

    def __init__(
        self,
        path: str,
        dims: dict[str, int],
        coord_data: dict[str, np.ndarray | None],
        specs: dict[str, np.dtype],
        var_attrs: dict[str, dict] | None = None,
        global_attrs: dict | None = None,
        chunk_rows: int = 1 << 16,
        filters: dict[str, list[tuple]] | None = None,
    ) -> None:
        self._b = _Builder(path)
        self._path = path
        self._dims = {n: int(s) for n, s in dims.items()}
        self._shape = tuple(self._dims.values())
        self._cells = int(np.prod(self._shape, dtype=np.int64)) \
            if self._shape else 0
        self._specs = {n: _le(np.dtype(dt)) for n, dt in specs.items()}
        self._attrs = {n: dict(a or {}) for n, a in (var_attrs or {}).items()}
        self._global = dict(global_attrs or {})
        self._chunk_rows = chunk_rows
        self._filters = dict(filters or {})
        self._done: set[str] = set()
        self._cur: str | None = None
        self._cur_st: dict | None = None

        # 1) dimension-scale datasets (same conventions + reserved-attr
        # guard as write_netcdf4)
        for dname, size in self._dims.items():
            arr = coord_data.get(dname)
            user = dict(self._attrs.get(dname) or {})
            for k in ("CLASS", "NAME", "REFERENCE_LIST"):
                if k in user:
                    raise Hdf5WriteError(
                        f"coordinate {dname!r}: attribute {k!r} is "
                        "reserved by the netCDF-4 dimension-scale "
                        "convention")
            attrs = dict(user)
            attrs["CLASS"] = "DIMENSION_SCALE"
            if arr is None:
                attrs["NAME"] = f"{_PURE_DIM_SENTINEL}.{size:>10}"
                self._b.dataset(dname, np.zeros(size, np.float32),
                                attrs=attrs)
                continue
            arr = np.asarray(arr)
            if arr.shape[0] != size:
                raise Hdf5WriteError(
                    f"coordinate {dname!r}: {arr.shape[0]} values for a "
                    f"{size}-long dimension")
            attrs["NAME"] = dname
            self._b.dataset(dname, arr, attrs=attrs)

        # 2) one global-heap object-reference payload per (var, dim)
        payloads: list[bytes] = []
        self._idx_of: dict[tuple[str, int], int] = {}
        for name in self._specs:
            for k, d in enumerate(self._dims):
                self._idx_of[(name, k)] = len(payloads) + 1
                payloads.append(struct.pack("<Q", self._b.ds_addrs[d]))
        self._gaddr = self._b.alloc(_gcol_block(payloads)) if payloads else 0

    def _begin(self, name: str) -> None:
        if name not in self._specs:
            raise Hdf5WriteError(f"undeclared variable {name!r}")
        if name in self._done:
            raise Hdf5WriteError(
                f"{name}: variables must stream contiguously, in order")
        dl = _dimension_list_attr(
            [(self._gaddr, self._idx_of[(name, k)])
             for k in range(len(self._dims))])
        self._cur = name
        self._cur_st = self._b.begin_stream_dataset(
            name, self._specs[name], self._cells,
            chunk_rows=self._chunk_rows, flts=self._filters.get(name),
            attrs=self._attrs.get(name),
            raw_attr_msgs=(dl,) if self._dims else (),
            shape=self._shape)

    def _finish_cur(self) -> None:
        if self._cur is not None:
            self._b.end_stream_dataset(self._cur_st)
            self._done.add(self._cur)
            self._cur = self._cur_st = None

    def write_values(self, name: str, values: np.ndarray) -> None:
        """Flat C-order grid values for ``name`` (any batch sizes, in
        order); variables contiguous, in ``specs`` order."""
        if name != self._cur:
            self._finish_cur()
            self._begin(name)
        self._b.stream_values(self._cur_st, np.asarray(values).ravel())

    def close(self) -> None:
        self._finish_cur()
        for name in self._specs:
            if name not in self._done:
                if self._cells:
                    raise Hdf5WriteError(
                        f"{name}: no values streamed for a "
                        f"{self._cells}-cell grid")
                self._begin(name)
                self._finish_cur()
        self._b.finish(self._path, self._global)

    def abort(self) -> None:
        """Close AND REMOVE the backing file without finalizing (error
        paths) — a truncated file left behind could be mistaken for a
        complete export."""
        f = self._b._f
        if f is not None and not f.closed:
            f.close()
        with contextlib.suppress(OSError):
            os.unlink(self._path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:
            self.abort()

"""Pure-Python NetCDF3 "classic" reader/writer (no external libraries).

The container has no netCDF4/h5py/xarray, but NetCDF3 classic (CDF-1 /
CDF-2) is a simple, fully published binary format (the NetCDF "Classic
Format Spec"): a big-endian header (dims, global attrs, variables with
their attrs and data offsets) followed by contiguous big-endian array
data, 4-byte aligned, with an optional UNLIMITED record dimension whose
variables interleave per record.

This backs the reference's `read_netcdf` surface
(`beacon-arrow-netcdf/src/lib.rs` — which similarly ships its own pure
reader, oxcdf, next to the netcdf-c binding) and the `netcdf`/`ndnetcdf`
OUTPUT formats (`beacon-core/src/query/output.rs:102-112`) without any
native dependency. NetCDF4 (HDF5-based) files are out of scope here and
raise a clear error pointing at the optional netCDF4 package.
"""

from __future__ import annotations

import struct

import numpy as np

from beacon_spark.sources import bytesource as _bs

_MAGIC = b"CDF"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy dtype, size)
_TYPES = {
    1: np.dtype(">i1"),  # NC_BYTE
    2: np.dtype("S1"),   # NC_CHAR
    3: np.dtype(">i2"),  # NC_SHORT
    4: np.dtype(">i4"),  # NC_INT
    5: np.dtype(">f4"),  # NC_FLOAT
    6: np.dtype(">f8"),  # NC_DOUBLE
}
_NC_TYPE_OF = {
    "int8": 1, "bool": 1,
    "int16": 3, "int32": 4,
    "float32": 5, "float64": 6,
}


def _pad4(n: int) -> int:
    return (4 - (n % 4)) % 4


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.o = 0

    def u4(self) -> int:
        (v,) = _bs.unpack_from(">I", self.b, self.o)
        self.o += 4
        return v

    def i4(self) -> int:
        (v,) = _bs.unpack_from(">i", self.b, self.o)
        self.o += 4
        return v

    def i8(self) -> int:
        (v,) = _bs.unpack_from(">q", self.b, self.o)
        self.o += 8
        return v

    def name(self) -> str:
        n = self.u4()
        # "replace", not strict: a malformed name must surface as a
        # mangled column, not a crash that hides the rest of the file
        s = self.b[self.o : self.o + n].decode("utf-8", "replace")
        self.o += n + _pad4(n)
        return s

    def values(self, nc_type: int, count: int):
        dt = _TYPES[nc_type]
        nbytes = dt.itemsize * count
        arr = _bs.frombuffer(self.b, dt, count, self.o)
        self.o += nbytes + _pad4(nbytes)
        if nc_type == 2:
            return arr.tobytes().decode("utf-8", "replace")
        vals = arr.tolist()
        return vals[0] if count == 1 else vals


class _Nc3Var:
    """Lazy handle over one NetCDF3 variable: slicing issues ranged reads
    for the covering leading-axis window only (mmap pages locally, one
    object-store range GET remotely).  Open therefore touches the header
    only; a Spark task flattening rows [lo, hi) reads ∝ its slice.

    ``char`` (NC_CHAR) variables decode lazily too: the trailing
    string-length axis collapses per the CF convention, so the *logical*
    shape excludes it while reads still fetch the raw bytes."""

    def __init__(self, buf, begin: int, nc_type: int, raw_shape: tuple[int, ...],
                 stride: int | None = None):
        self.buf, self.begin, self.nc_type = buf, begin, nc_type
        self.raw_shape = raw_shape          # includes char-length axis
        self.dtype = _TYPES[nc_type]
        # record variables interleave per record: stride = bytes between
        # consecutive records (= recsize when >1 record var)
        self.inner = int(np.prod(raw_shape[1:])) if len(raw_shape) > 1 else 1
        self.stride = stride if stride is not None else self.inner * self.dtype.itemsize
        self.char = nc_type == 2 and len(raw_shape) >= 2
        self.shape = raw_shape[:-1] if self.char else raw_shape
        self.ndim = len(self.shape)

    def __len__(self) -> int:
        return self.shape[0] if self.shape else 1

    def _read_lead(self, lo: int, hi: int) -> np.ndarray:
        """Rows [lo, hi) of the leading axis as one contiguous/strided
        ranged read, reshaped to (hi-lo, *raw_shape[1:])."""
        per_rec = self.inner * self.dtype.itemsize
        if not self.raw_shape:
            raw = _bs.read_range(self.buf, self.begin, self.dtype.itemsize)
            return np.frombuffer(raw, self.dtype, 1)
        if hi <= lo:
            return np.empty((0,) + self.raw_shape[1:], self.dtype)
        if self.stride == per_rec:  # contiguous (non-record) layout
            raw = _bs.read_range(self.buf, self.begin + lo * per_rec,
                                 (hi - lo) * per_rec)
            return np.frombuffer(raw, self.dtype, (hi - lo) * self.inner).reshape(
                (hi - lo,) + self.raw_shape[1:])
        # interleaved records: one read of the covering window, then
        # per-record extraction from the local bytes
        win_lo = self.begin + lo * self.stride
        raw = _bs.read_range(self.buf, win_lo,
                             (hi - lo - 1) * self.stride + per_rec)
        out = np.empty((hi - lo, self.inner), self.dtype)
        for r in range(hi - lo):
            out[r] = np.frombuffer(raw, self.dtype, self.inner, r * self.stride)
        return out.reshape((hi - lo,) + self.raw_shape[1:])

    def _decode_char(self, arr: np.ndarray) -> np.ndarray:
        if self.char:
            s = arr.view(f"S{self.raw_shape[-1]}")[..., 0]
            return np.char.decode(s, "utf-8", "replace")
        if self.nc_type == 2:
            return np.char.decode(arr.view("S1"), "utf-8", "replace")
        return arr

    def __getitem__(self, idx) -> np.ndarray:
        if not isinstance(idx, tuple):
            idx = (idx,)
        if not self.shape:
            return self._decode_char(self._read_lead(0, 1).reshape(()))
        lead = idx[0] if idx else slice(None)
        if isinstance(lead, slice):
            lo, hi, step = lead.indices(self.shape[0])
            if step < 0:
                # read the ascending covering window once, then apply the
                # exact reversed selection locally — lead.indices gives
                # (start, stop, step) walking DOWN from lo past hi
                win_lo, win_hi = hi + 1, lo + 1
                arr = self._decode_char(self._read_lead(win_lo, win_hi))
                return arr[(slice(lo - win_lo, None, step),) + idx[1:]]
        else:
            if lead < 0:
                lead += self.shape[0]
            if not 0 <= lead < self.shape[0]:
                raise IndexError(lead)
            lo, hi, step = lead, lead + 1, 1
        arr = self._decode_char(self._read_lead(lo, hi))
        rest = idx[1:]
        if isinstance(lead, slice):
            sel = (slice(None, None, step),) + rest
        else:
            sel = (0,) + rest
        return arr[sel]

    def __array__(self, dtype=None, copy=None):
        full = self[(slice(None),) * max(1, self.ndim)] if self.shape else self[()]
        full = np.asarray(full)
        return full.astype(dtype) if dtype is not None else full


def read_netcdf3(path: str) -> tuple[dict, dict, dict, dict]:
    """Parse a CDF-1/CDF-2 file → (dims, variables, var_attrs, global_attrs)
    in GridDataset's shapes: dims name→size, variables name→(dim_names,
    lazy var)."""
    # byte-source abstraction (bytesource.py): local path → mmap (variables
    # become OS-paged views — a Spark task flattening rows [lo, hi) faults
    # in only its pages), URI → block-cached object-store range reads; the
    # header itself is tiny either way
    buf = _bs.open_buffer(path)
    if buf[:3] != _MAGIC or buf[3] not in (1, 2):
        if buf[:3] == _MAGIC and buf[3] == 5:
            raise ValueError(
                f"{path}: CDF-5 (64-bit data) NetCDF — only CDF-1/CDF-2 "
                f"classic is supported without the optional netCDF4 package"
            )
        raise ValueError(
            f"{path}: not a NetCDF3 classic file (NetCDF4/HDF5 needs the "
            f"optional netCDF4 package)"
        )
    version = buf[3]
    r = _Reader(buf)
    r.o = 4
    numrecs = r.u4()  # 0xFFFFFFFF = STREAMING; treated as computed below

    def _check_tag(tag: int, n: int, expected: int, what: str) -> None:
        """The spec allows exactly two shapes per list: ABSENT
        (ZERO ZERO) or (expected_tag, count). Anything else is a
        corrupt header — silently reading it as 'no {what}' would
        serve an EMPTY dataset from a damaged file."""
        if tag == expected:
            return
        if tag == 0 and n == 0:
            return
        raise ValueError(
            f"{path}: corrupt NetCDF3 header — expected {what} list tag, "
            f"got tag={tag:#x} count={n}")

    dims: list[tuple[str, int]] = []
    tag, n = r.u4(), r.u4()
    _check_tag(tag, n, _NC_DIMENSION, "dimension")
    if tag == _NC_DIMENSION:
        for _ in range(n):
            dims.append((r.name(), r.u4()))

    def read_attrs() -> dict:
        tag, n = r.u4(), r.u4()
        _check_tag(tag, n, _NC_ATTRIBUTE, "attribute")
        out = {}
        if tag == _NC_ATTRIBUTE:
            for _ in range(n):
                nm = r.name()
                t = r.u4()
                cnt = r.u4()
                out[nm] = r.values(t, cnt)
        return out

    global_attrs = read_attrs()

    tag, nvars = r.u4(), r.u4()
    _check_tag(tag, nvars, _NC_VARIABLE, "variable")
    var_meta = []
    if tag == _NC_VARIABLE:
        for _ in range(nvars):
            nm = r.name()
            ndims = r.u4()
            dimids = [r.u4() for _ in range(ndims)]
            attrs = read_attrs()
            nc_type = r.u4()
            vsize = r.u4()
            begin = r.i8() if version == 2 else r.u4()
            var_meta.append((nm, dimids, attrs, nc_type, vsize, begin))

    rec_dim = next((i for i, (_, sz) in enumerate(dims) if sz == 0), None)
    rec_vars = [m for m in var_meta if rec_dim is not None and rec_dim in m[1]]

    def _unpadded_rec_bytes(m) -> int:
        """Per-record byte size of a record variable WITHOUT the 4-byte
        rounding the header's vsize carries. The classic spec's special
        case: with exactly ONE record variable of type byte/char/short,
        records are packed UNPADDED on disk (netcdf-c NC_begins), so the
        padded vsize must not be used as the stride."""
        nm, dimids, _a, nc_type, _v, _b = m
        inner = 1
        for i in dimids:
            if i != rec_dim:
                inner *= dims[i][1]
        return inner * _TYPES[nc_type].itemsize

    # actual record stride: sum of padded vsizes when variables
    # interleave; the UNPADDED single-variable size in the special case
    if len(rec_vars) == 1:
        recsize = _unpadded_rec_bytes(rec_vars[0])
    else:
        recsize = sum(m[4] for m in rec_vars)
    if rec_dim is not None and numrecs == 0xFFFFFFFF:
        if rec_vars:
            first = min(m[5] for m in rec_vars)
            numrecs = (len(buf) - first) // recsize if recsize else 0
        else:
            # STREAMING sentinel with no record variables: nothing was
            # ever appended — the record dim is empty, not 2^32-1 long
            numrecs = 0

    dim_sizes = {
        name: (numrecs if sz == 0 else sz) for name, sz in dims
    }
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]] = {}
    var_attrs: dict[str, dict] = {}

    for nm, dimids, attrs, nc_type, vsize, begin in var_meta:
        dnames = tuple(dims[i][0] for i in dimids)
        raw_shape = tuple(dim_sizes[d] for d in dnames)
        is_rec = rec_dim is not None and rec_dim in dimids
        stride = recsize if is_rec else None
        arr = _Nc3Var(buf, begin, nc_type, raw_shape, stride)
        if arr.char:
            dnames = dnames[:-1]  # char length axis collapses (CF)
        # big-endian data stays UNSWAPPED and UNREAD here: _Nc3Var reads
        # per requested slice; GridDataset.flatten converts to native
        # endianness at Arrow emission — open() is O(header) always
        variables[nm] = (dnames, arr)
        var_attrs[nm] = attrs

    return dim_sizes, variables, var_attrs, global_attrs


# ---------------------------------------------------------------- writer


def _check_vsize(name: str, vsize: int) -> None:
    """The classic header's vsize is a 32-bit field: one variable is
    capped at 4 GiB (CDF-2 widens OFFSETS, not vsize). Fail with an
    actionable message instead of struct.error deep in the header
    write."""
    if vsize + _pad4(vsize) > 0xFFFFFFFF:
        raise ValueError(
            f"variable {name!r} holds {vsize} bytes — over the NetCDF3 "
            "classic 4 GiB per-variable limit; export as parquet/arrow "
            "or split the result"
        )


def _nc_type_for(arr: np.ndarray) -> tuple[int, np.ndarray]:
    kind = arr.dtype
    if kind.kind in ("U", "S", "O"):
        return 2, arr  # handled specially
    name = kind.name
    if name in _NC_TYPE_OF:
        t = _NC_TYPE_OF[name]
    elif name == "uint8":
        # NC_BYTE is SIGNED: a straight uint8 cast wraps 200 -> -56
        # (silent value corruption). Keep byte when every value fits,
        # else widen to short — value-exact either way.
        if arr.size and int(arr.max()) > 127:
            t, arr = 3, arr.astype(np.int16)
        else:
            t, arr = 1, arr.astype(np.int8)
    elif kind.kind in ("i", "u"):
        # NetCDF3 classic has no 64-bit integer type. Narrow to int32
        # only when every value FITS — clipping silently corrupted any
        # value beyond ±2^31 (an orderkey at SF100 crosses it); wider
        # values write as float64 (exact to 2^53, the value-safe choice)
        if arr.size and (
            arr.min() < -(2**31) or arr.max() > 2**31 - 1
        ):
            t, arr = 6, arr.astype(np.float64)
        else:
            t, arr = 4, arr.astype(np.int32)
    else:
        t, arr = 6, arr.astype(np.float64)
    return t, arr


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def raw(self, b: bytes):
        self.parts.append(b)

    def u4(self, v: int):
        self.parts.append(struct.pack(">I", v))

    def name(self, s: str):
        b = s.encode("utf-8")
        self.u4(len(b))
        self.raw(b + b"\x00" * _pad4(len(b)))

    def attr_values(self, v):
        if isinstance(v, str):
            b = v.encode("utf-8")
            self.u4(2)
            self.u4(len(b))
            self.raw(b + b"\x00" * _pad4(len(b)))
            return
        arr = np.atleast_1d(np.asarray(v))
        t, arr = _nc_type_for(arr)
        dt = _TYPES[t]
        self.u4(t)
        self.u4(arr.size)
        b = np.ascontiguousarray(arr, dt).tobytes()
        self.raw(b + b"\x00" * _pad4(len(b)))

    def attrs(self, attrs: dict):
        if not attrs:
            self.u4(0)
            self.u4(0)
            return
        self.u4(_NC_ATTRIBUTE)
        self.u4(len(attrs))
        for k, v in attrs.items():
            self.name(k)
            self.attr_values(v)

    def size(self) -> int:
        return sum(len(p) for p in self.parts)


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
    var_attrs: dict[str, dict] | None = None,
    global_attrs: dict | None = None,
) -> None:
    """Write a CDF-2 (64-bit-offset) classic file; all dims fixed-size.
    int64 narrows to int32 (classic has no 64-bit int) — callers that
    need exact 64-bit values should cast to double or split the column."""
    var_attrs = var_attrs or {}
    dim_names = list(dims)
    dim_index = {d: i for i, d in enumerate(dim_names)}

    prepared = []
    for nm, (dnames, arr) in variables.items():
        arr = np.asarray(arr)
        if arr.dtype.kind in ("U", "S", "O"):
            a = np.char.encode(arr.astype("U"), "utf-8")
            width = max(1, int(a.dtype.itemsize))
            strdim = f"_strlen_{nm}"
            dims = {**dims, strdim: width}
            dim_names.append(strdim)
            dim_index[strdim] = len(dim_names) - 1
            bytes_arr = np.frombuffer(
                a.astype(f"S{width}").tobytes(), "S1"
            ).reshape(*arr.shape, width)
            prepared.append((nm, (*dnames, strdim), 2, bytes_arr))
        else:
            t, a = _nc_type_for(arr)
            prepared.append((nm, dnames, t, np.ascontiguousarray(a, _TYPES[t])))

    w = _Writer()
    w.raw(_MAGIC + bytes([2]))
    w.u4(0)  # numrecs (no record dim)
    w.u4(_NC_DIMENSION)
    w.u4(len(dim_names))
    for d in dim_names:
        w.name(d)
        w.u4(int(dims[d]))
    w.attrs(global_attrs or {})
    w.u4(_NC_VARIABLE)
    w.u4(len(prepared))

    # first pass with dummy offsets to size the header
    def var_header(writer, nm, dnames, t, data, begin):
        writer.name(nm)
        writer.u4(len(dnames))
        for d in dnames:
            writer.u4(dim_index[d])
        writer.attrs(var_attrs.get(nm, {}))
        writer.u4(t)
        vsize = data.size * _TYPES[t].itemsize
        _check_vsize(nm, vsize)
        writer.u4(vsize + _pad4(vsize))
        writer.raw(struct.pack(">q", begin))

    probe = _Writer()
    for nm, dnames, t, data in prepared:
        var_header(probe, nm, dnames, t, data, 0)
    header_size = w.size() + probe.size()

    begins = []
    off = header_size
    for nm, dnames, t, data in prepared:
        begins.append(off)
        vsize = data.size * _TYPES[t].itemsize
        off += vsize + _pad4(vsize)

    for (nm, dnames, t, data), begin in zip(prepared, begins):
        var_header(w, nm, dnames, t, data, begin)
    for nm, dnames, t, data in prepared:
        b = data.tobytes()
        w.raw(b + b"\x00" * _pad4(len(b)))

    with open(path, "wb") as f:
        for p in w.parts:
            f.write(p)


class GridStreamWriter:
    """Streaming CDF-2 writer over ARBITRARY named dimensions (the nd
    re-grid output, and the base class of ``FlatStreamWriter``): the
    dim sizes and every variable's dim tuple are known up front, so the
    full header is written first and each variable's values then stream
    in declaration order, chunk by chunk — the file layout is
    byte-identical to ``write_netcdf3``'s, but the caller holds at most
    one variable's values at a time instead of the whole table + every
    grid (the reference learns dims while streaming the same way:
    output.rs:106-112 + unique_values.rs:1-13).

    ``columns``: ``[(name, dim_names_tuple, nc_type,
    char_width_or_None), ...]`` — char variables get a per-variable
    ``_strlen_<name>`` dim appended, matching ``write_netcdf3``. Call
    ``write_values(name, np_chunk)`` with chunks IN ORDER per variable,
    all of variable *i* before any of variable *i+1*; char chunks must
    be ``S1`` arrays shaped ``(rows, width)``.
    """

    def __init__(self, path, dims, columns, var_attrs=None,
                 global_attrs=None):
        dims = {d: int(n) for d, n in dims.items()}
        dim_names = list(dims)
        prepared = []  # (name, dnames, nc_type, total_value_count)
        for name, dnames, t, width in columns:
            nvals = 1
            for d in dnames:
                nvals *= dims[d]
            if t == 2:
                strdim = f"_strlen_{name}"
                dims[strdim] = int(width)
                dim_names.append(strdim)
                dnames = (*dnames, strdim)
                nvals *= int(width)
            prepared.append((name, tuple(dnames), t, nvals))
        dim_index = {d: i for i, d in enumerate(dim_names)}

        w = _Writer()
        w.raw(_MAGIC + bytes([2]))
        w.u4(0)  # numrecs (all dims fixed — obs is sized, not unlimited)
        w.u4(_NC_DIMENSION)
        w.u4(len(dim_names))
        for d in dim_names:
            w.name(d)
            w.u4(int(dims[d]))
        w.attrs(global_attrs or {})
        w.u4(_NC_VARIABLE)
        w.u4(len(prepared))

        def var_header(writer, nm, dnames, t, nvals, begin):
            writer.name(nm)
            writer.u4(len(dnames))
            for d in dnames:
                writer.u4(dim_index[d])
            writer.attrs((var_attrs or {}).get(nm, {}))
            writer.u4(t)
            vsize = nvals * _TYPES[t].itemsize
            _check_vsize(nm, vsize)
            writer.u4(vsize + _pad4(vsize))
            writer.raw(struct.pack(">q", begin))

        probe = _Writer()
        for nm, dn, t, nv in prepared:
            var_header(probe, nm, dn, t, nv, 0)
        off = w.size() + probe.size()
        begins = []
        for nm, dn, t, nv in prepared:
            begins.append(off)
            vsize = nv * _TYPES[t].itemsize
            off += vsize + _pad4(vsize)
        for (nm, dn, t, nv), begin in zip(prepared, begins):
            var_header(w, nm, dn, t, nv, begin)

        self._path = path
        self._f = open(path, "wb")
        for p in w.parts:
            self._f.write(p)
        self._order = [(nm, t, nv) for nm, _dn, t, nv in prepared]
        self._idx = 0
        self._written = 0

    def write_values(self, name: str, arr: np.ndarray) -> None:
        nm, t, nv = self._order[self._idx]
        if name != nm:
            raise ValueError(
                f"out-of-order write: expected {nm!r}, got {name!r}"
            )
        arr = np.ascontiguousarray(arr, _TYPES[t])
        if self._written + arr.size > nv:
            raise ValueError(f"variable {nm!r} overflows its declared size")
        self._f.write(arr.tobytes())
        self._written += arr.size
        if self._written == nv:
            vsize = nv * _TYPES[t].itemsize
            self._f.write(b"\x00" * _pad4(vsize))
            self._idx += 1
            self._written = 0

    def close(self) -> None:
        if self._written:
            raise ValueError(
                f"variable {self._order[self._idx][0]!r} incomplete at close"
            )
        for nm, _t, nv in self._order[self._idx:]:
            if nv:  # zero-count vars (nrows == 0) legitimately skip writes
                raise ValueError(f"variable {nm!r} never written")
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            # a clean exit must run close()'s completeness validation —
            # an under-written variable would otherwise yield a silently
            # truncated file
            self.close()
        else:
            # don't mask the in-flight error — and don't leave a
            # truncated file a consumer could mistake for a complete
            # export
            self._f.close()
            import contextlib
            import os
            with contextlib.suppress(OSError):
                os.unlink(self._path)
        return False


class FlatStreamWriter(GridStreamWriter):
    """Streaming CDF-2 writer for FLAT (record-oriented) output: the
    one-``obs``-dimension special case of ``GridStreamWriter`` (every
    variable 1-D over a row count known up front; strings get a
    per-variable ``_strlen`` dim). ``columns``:
    ``[(name, nc_type, char_width_or_None), ...]``."""

    def __init__(self, path, nrows: int, columns, var_attrs=None,
                 global_attrs=None):
        super().__init__(
            path,
            {"obs": int(nrows)},
            [(name, ("obs",), t, width) for name, t, width in columns],
            var_attrs,
            global_attrs,
        )

"""nd sources: N-dimensional array sets (NetCDF / Zarr / HDF5) → rows.

Implements the reference's arrays-to-tables mapping
(``docs/docs/2.0.0-rc2/arrays-to-tables.md``):

  - the variable with the largest data volume defines the **grid**; row
    count = product of the grid dimension sizes;
  - full-grid variables map element-for-element; lower-rank variables
    broadcast (cycle) along the shared dimensions; scalars become constant
    columns; variables outside the grid are dropped;
  - every attribute becomes a constant column ``"<var>.<attr>"``; global
    attributes become ``".<attr>"``;
  - CF decoding (``cf-decoding.md``): ``units: "<u> since <epoch>"`` →
    timestamps, ``scale_factor``/``add_offset`` → float64,
    ``_FillValue`` → NULL; ``missing_value``/``valid_min``/``valid_max``
    deliberately ignored (pinned reference behavior).

Architecture for scale: the pure-numpy core (`GridDataset.flatten`) is
**stride arithmetic, zero copy until materialization**, and accepts a row
range, so a Spark task materializes only its slice. The Spark reader
plans one task per (file, row-chunk) and streams Arrow batches through
``mapInArrow`` — no driver-side data, parallelism = files × chunks.

The container lacks netCDF/zarr libraries; file-opening is gated behind
import-try (``open_netcdf``/``open_zarr`` raise a clear error), while the
flattening/CF core is fully functional and unit-tested on synthetic arrays.
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

_EPOCH_RE = re.compile(
    r"^\s*(?P<unit>\w+)\s+since\s+(?P<epoch>.+?)\s*$", re.IGNORECASE
)
_UNIT_NS = {
    "days": 86_400_000_000_000, "day": 86_400_000_000_000, "d": 86_400_000_000_000,
    "hours": 3_600_000_000_000, "hour": 3_600_000_000_000, "h": 3_600_000_000_000,
    "minutes": 60_000_000_000, "minute": 60_000_000_000, "min": 60_000_000_000,
    "seconds": 1_000_000_000, "second": 1_000_000_000, "s": 1_000_000_000, "sec": 1_000_000_000,
    "milliseconds": 1_000_000, "millisecond": 1_000_000, "ms": 1_000_000,
    "microseconds": 1_000, "microsecond": 1_000, "us": 1_000,
    "nanoseconds": 1, "nanosecond": 1, "ns": 1,
}


def _parse_cf_epoch(units: str) -> tuple[int, int] | None:
    """CF time units → (ns_per_unit, epoch_ns), or None if not a time."""
    m = _EPOCH_RE.match(units or "")
    if not m:
        return None
    unit = m.group("unit").lower()
    if unit not in _UNIT_NS:
        return None
    epoch_str = m.group("epoch").strip()
    for fmt in (None,):  # fromisoformat handles most CF epochs
        try:
            epoch = _dt.datetime.fromisoformat(epoch_str.replace("Z", "+00:00"))
            break
        except ValueError:
            return None
    if epoch.tzinfo is not None:
        epoch = epoch.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    epoch_ns = int((epoch - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000_000)
    return _UNIT_NS[unit], epoch_ns


def decode_cf(values: np.ndarray, attrs: dict) -> tuple[np.ndarray, pa.DataType | None]:
    """Apply CF decoding to a raw variable (cf-decoding.md). Returns the
    decoded ndarray and an optional Arrow type override (timestamps)."""
    out = values
    mask = None
    fill = attrs.get("_FillValue")
    if fill is not None:
        mask = out == fill

    scale = attrs.get("scale_factor")
    offset = attrs.get("add_offset")
    if scale is not None or offset is not None:
        out = out.astype(np.float64)
        if scale is not None:
            out = out * float(scale)
        if offset is not None:
            out = out + float(offset)

    time_spec = _parse_cf_epoch(str(attrs.get("units", "")))
    if time_spec is not None and np.issubdtype(out.dtype, np.number):
        per_unit, epoch_ns = time_spec
        ns = (out.astype(np.float64) * per_unit + epoch_ns).astype("int64")
        if mask is not None:
            ns = np.where(mask, np.int64(0), ns)
        arr = ns.view("datetime64[ns]")
        if mask is not None:
            arr = np.ma.masked_array(arr, mask=mask)
        return arr, pa.timestamp("us")

    if mask is not None:
        # _FillValue becomes SQL NULL for every type, floats included
        # (cf-decoding.md:112-125 — NaN stays NaN, fill becomes NULL)
        out = np.ma.masked_array(out, mask=mask)
    return out, None


@dataclass
class GridDataset:
    """An in-memory nd array set: named dims, variables over those dims,
    per-variable + global attributes. The file-format readers produce this;
    everything downstream (grid selection, broadcast, CF decode) is shared.
    """

    dims: dict[str, int]
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]]
    var_attrs: dict[str, dict] = field(default_factory=dict)
    global_attrs: dict = field(default_factory=dict)

    def grid(self, dimensions: list[str] | None = None) -> tuple[str, ...]:
        """The grid = dims of the largest-volume variable
        (arrays-to-tables.md: 'The rule'). An explicit ``dimensions``
        argument overrides the choice (table-functions.md read_netcdf).
        A ragged (CF contiguous) dataset always grids on its sample
        dimension — one row per observation."""
        if dimensions:
            return tuple(dimensions)
        ragged = self.ragged_spec()
        if ragged is not None:
            return (ragged[0],)
        best: tuple[str, ...] = ()
        best_vol = -1
        for dims, arr in self.variables.values():
            vol = int(np.prod([self.dims[d] for d in dims])) if dims else 0
            if vol > best_vol:
                best_vol, best = vol, dims
        return best

    def ragged_spec(self) -> tuple[str, str, np.ndarray] | None:
        """CF contiguous ragged arrays (beacon-nd-array/src/dataset/
        any.rs:10-23,42-50): a row-count variable carries attribute
        ``sample_dimension: "<obs_dim>"``; its own dimension is the
        instance (profile) dimension. Returns
        ``(sample_dim, instance_dim, counts)`` or None."""
        for name, attrs in self.var_attrs.items():
            sd = attrs.get("sample_dimension")
            if sd is None or name not in self.variables:
                continue
            sd = str(sd)
            dims_of, arr = self.variables[name]
            if sd in self.dims and len(dims_of) == 1 and dims_of[0] != sd:
                return sd, dims_of[0], np.asarray(arr).astype(np.int64).reshape(-1)
        return None

    def row_count(self, dimensions: list[str] | None = None) -> int:
        return int(np.prod([self.dims[d] for d in self.grid(dimensions)] or [1]))

    def flatten(
        self,
        dimensions: list[str] | None = None,
        columns: list[str] | None = None,
        row_range: tuple[int, int] | None = None,
        cf_decode: bool = True,
        attribute_columns: bool = True,
    ) -> pa.Table:
        """Broadcast every variable onto the grid and emit rows
        [row_range[0], row_range[1]) as one Arrow table.

        Broadcasting is numpy stride-tricks (``np.broadcast_to``) — a
        lower-rank variable is *viewed*, not copied, onto the grid; only
        the requested row slice is materialized. Work is therefore
        O(slice), not O(grid), which is what makes per-chunk Spark tasks
        cheap (the reference gets the same effect from its
        NdProjectionPushdown rule, ``nd/optimizer.rs:42-127``).
        """
        grid = self.grid(dimensions)
        shape = tuple(self.dims[d] for d in grid)
        n_rows = int(np.prod(shape)) if shape else 1
        lo, hi = row_range or (0, n_rows)
        lo, hi = max(lo, 0), min(hi, n_rows)

        # CF contiguous ragged layout: instance-dim variables repeat onto
        # the sample dimension per the row-count variable. Precompute the
        # obs→instance index map for just this slice (O(slice log inst)).
        ragged = self.ragged_spec()
        inst_idx: np.ndarray | None = None
        inst_dim = None
        if ragged is not None and grid == (ragged[0],):
            _, inst_dim, counts = ragged
            ends = np.cumsum(counts)
            inst_idx = np.searchsorted(ends, np.arange(lo, hi), side="right")

        names: list[str] = []
        arrays: list[pa.Array] = []
        for name, (dims, arr) in self.variables.items():
            if columns is not None and name not in columns:
                continue
            if inst_idx is not None and dims == (inst_dim,):
                # per-profile value gathered onto each of its observations
                flat = np.asarray(arr)[np.clip(inst_idx, 0, len(arr) - 1)]
                attrs = self.var_attrs.get(name, {})
                arrow_type = None
                if cf_decode:
                    flat, arrow_type = decode_cf(np.ascontiguousarray(flat), attrs)
                names.append(name)
                arrays.append(_to_arrow(flat, arrow_type))
                continue
            if not set(dims).issubset(grid):
                continue  # outside the grid → dropped (rule 5)
            # view the variable on the grid: insert size-1 axes for missing
            # dims (in grid order), then broadcast_to the grid shape
            expand_shape = tuple(
                self.dims[d] if d in dims else 1 for d in grid
            )
            if dims:
                # reorder the variable's axes into grid order
                order = sorted(range(len(dims)), key=lambda i: grid.index(dims[i]))
                view = np.transpose(arr, order).reshape(expand_shape)
            else:
                view = arr.reshape(expand_shape) if shape else arr
            bcast = np.broadcast_to(view, shape) if shape else view
            flat = bcast.reshape(-1)[lo:hi]
            attrs = self.var_attrs.get(name, {})
            arrow_type = None
            if cf_decode:
                flat, arrow_type = decode_cf(np.ascontiguousarray(flat), attrs)
            names.append(name)
            arrays.append(_to_arrow(flat, arrow_type))

        if attribute_columns:
            count = hi - lo
            for vname, attrs in self.var_attrs.items():
                if columns is not None and vname not in columns:
                    continue
                for aname, aval in attrs.items():
                    if aname in ("_FillValue", "scale_factor", "add_offset"):
                        continue
                    names.append(f"{vname}.{aname}")
                    arrays.append(_const_array(aval, count))
            for aname, aval in self.global_attrs.items():
                names.append(f".{aname}")
                arrays.append(_const_array(aval, count))

        return pa.table(arrays, names=names)


def _to_arrow(arr: np.ndarray, arrow_type: pa.DataType | None) -> pa.Array:
    if arr.dtype.byteorder == ">":
        # slice-level native-endian copy (pyarrow rejects byte-swapped);
        # O(slice) — the full variable stays an OS-paged mmap view
        arr = arr.astype(arr.dtype.newbyteorder("="))
    if isinstance(arr, np.ma.MaskedArray):
        return pa.array(arr.data, mask=np.ma.getmaskarray(arr), type=arrow_type)
    out = pa.array(arr)
    if arrow_type is not None:
        out = out.cast(arrow_type)
    return out


def _const_array(value, count: int) -> pa.Array:
    if isinstance(value, (np.generic,)):
        value = value.item()
    return pa.array([value] * count)


# ------------------------------------------------------------ file openers


def open_netcdf(path: str) -> GridDataset:
    """Open a NetCDF file as a GridDataset. Requires netCDF4 or h5py or
    xarray (none present in this container — gated; the flattening core
    above is exercised by unit tests on synthetic arrays instead)."""
    try:
        import netCDF4  # type: ignore
    except ImportError:
        netCDF4 = None
    if netCDF4 is not None:
        ds = netCDF4.Dataset(path, "r")
        ds.set_auto_maskandscale(False)
        dims = {name: len(d) for name, d in ds.dimensions.items()}
        variables = {}
        var_attrs = {}
        for name, v in ds.variables.items():
            variables[name] = (tuple(v.dimensions), np.asarray(v[...]))
            var_attrs[name] = {k: v.getncattr(k) for k in v.ncattrs()}
        global_attrs = {k: ds.getncattr(k) for k in ds.ncattrs()}
        return GridDataset(dims, variables, var_attrs, global_attrs)
    try:
        import xarray as xr  # type: ignore
    except ImportError:
        xr = None
    if xr is not None:
        ds = xr.open_dataset(path, decode_cf=False)
        dims = dict(ds.sizes)
        variables = {n: (tuple(v.dims), v.values) for n, v in ds.variables.items()}
        var_attrs = {n: dict(v.attrs) for n, v in ds.variables.items()}
        return GridDataset(dims, variables, var_attrs, dict(ds.attrs))
    # no nd library installed: self-contained NetCDF3 classic parser
    # (NetCDF4/HDF5 files raise with a clear message from read_netcdf3)
    from beacon_spark.sources.netcdf3 import read_netcdf3

    return GridDataset(*read_netcdf3(path))


def open_zarr(path: str) -> GridDataset:
    """Open a Zarr v2/v3 store as a GridDataset — via the zarr package when
    present, else the self-contained directory-store reader (bytes/gzip/
    zlib codecs; exotic codecs raise naming the package)."""
    try:
        import zarr  # type: ignore
    except ImportError:
        from beacon_spark.sources.zarrlite import read_zarr_store

        return GridDataset(*read_zarr_store(path))
    g = zarr.open_group(path, mode="r")
    dims: dict[str, int] = {}
    variables = {}
    var_attrs = {}
    for name, arr in g.arrays():
        adims = tuple(arr.attrs.get("_ARRAY_DIMENSIONS", [f"dim_{i}" for i in range(arr.ndim)]))
        for d, s in zip(adims, arr.shape):
            dims[d] = s
        variables[name] = (adims, arr[...])
        var_attrs[name] = {k: v for k, v in arr.attrs.items() if k != "_ARRAY_DIMENSIONS"}
    return GridDataset(dims, variables, var_attrs, dict(g.attrs))


def open_tiff(path: str) -> GridDataset:
    from beacon_spark.sources.tifflite import open_tiff as _ot

    return _ot(path)


_OPENERS = {
    "netcdf": open_netcdf,
    "zarr": open_zarr,
    "hdf5": open_netcdf,
    "tiff": open_tiff,
}


# ------------------------------------------------------------ spark reader


def coord_row_ranges(
    ds: GridDataset,
    dimensions: list[str] | None,
    ranges: dict[str, tuple[float | None, float | None]] | None,
) -> list[tuple[int, int]]:
    """Coordinate pushdown (the reference's PushdownFilter analog,
    ``beacon-nd-array/src/arrow/pushdown_filter.rs:11-99`` → chunk
    selection, e.g. ``beacon-arrow-zarr/src/datafusion/source.rs``):
    an AND-ed numeric range on the LEADING grid dimension's coordinate
    variable maps to a contiguous index hull, which in C-order flattening
    is a contiguous row range — rows outside are never materialized.
    Inner-dim and non-numeric constraints fall through fail-open (the
    residual Spark filter keeps correctness)."""
    grid = ds.grid(dimensions)
    shape = [ds.dims[d] for d in grid]
    n = int(np.prod(shape)) if shape else 1
    full = [(0, n)]
    if not grid or not ranges:
        return full
    lead = grid[0]
    spec = ranges.get(lead)
    if spec is None or lead not in ds.variables:
        return full
    dims_of, coord = ds.variables[lead]
    if dims_of != (lead,):
        return full
    vals, arrow_type = decode_cf(
        np.ascontiguousarray(coord), ds.var_attrs.get(lead, {})
    )
    if isinstance(vals, np.ma.MaskedArray) or vals.dtype.kind not in "iuf":
        return full
    lo, hi = spec
    mask = np.ones(len(vals), bool)
    if lo is not None:
        mask &= vals >= lo
    if hi is not None:
        mask &= vals <= hi
    if not mask.any():
        return []
    i0 = int(np.argmax(mask))
    i1 = len(mask) - int(np.argmax(mask[::-1]))
    inner = n // shape[0] if shape[0] else 1
    return [(i0 * inner, i1 * inner)]


def read_nd(
    spark,
    fmt: str,
    paths: str | list[str],
    datasets_root: str | None = None,
    dimensions: list[str] | None = None,
    rows_per_task: int = 1_000_000,
    ranges: dict[str, tuple[float | None, float | None]] | None = None,
):
    """Distributed nd read: plan (file, row-chunk) tasks, flatten per task.

    Partition planning opens each file's *metadata* driver-side to learn the
    grid size (the reference does the same in its table providers), then
    splits the row space into ``rows_per_task`` chunks so a single huge file
    still parallelizes across the cluster. ``ranges`` (per-column numeric
    bounds from the query filter) prunes chunks by coordinate range at
    planning time — see ``coord_row_ranges``.
    """
    from pyspark.sql import types as T

    from beacon_spark.sources.paths import resolve_globs
    from beacon_spark.sources.tabular import _arrow_to_spark_schema

    files = resolve_globs(paths, datasets_root)
    opener = _OPENERS[fmt]

    tasks: list[tuple[str, int, int]] = []
    sample_schema: pa.Schema | None = None
    for f in files:
        ds = opener(f)
        if sample_schema is None:
            sample_schema = ds.flatten(dimensions, row_range=(0, 0)).schema
        for rlo, rhi in coord_row_ranges(ds, dimensions, ranges):
            for lo in range(rlo, max(rhi, rlo + 1), rows_per_task):
                tasks.append((f, lo, min(lo + rows_per_task, rhi)))

    spark_schema = _arrow_to_spark_schema(sample_schema)
    if not tasks:
        # every chunk provably outside the requested coordinate ranges
        return spark.createDataFrame([], spark_schema)
    tasks_df = spark.createDataFrame(
        tasks,
        T.StructType(
            [
                T.StructField("path", T.StringType(), False),
                T.StructField("lo", T.LongType(), False),
                T.StructField("hi", T.LongType(), False),
            ]
        ),
    ).repartition(min(len(tasks), 256))

    target_names = [f.name for f in sample_schema]

    def _scan(batches):
        for b in batches:
            for row in b.to_pylist():
                ds = opener(row["path"])
                table = ds.flatten(dimensions, row_range=(row["lo"], row["hi"]))
                table = table.select([n for n in target_names if n in table.column_names])
                yield from table.to_batches(max_chunksize=1 << 16)

    return tasks_df.mapInArrow(_scan, spark_schema)

"""Atlas array-store reader/writer (pure Python).

Atlas (github.com/maris-development/atlas, MIT) is a directory-based
array store: ONE metadata marker at the store root — ``atlas.json`` (or
msgpack / ``.zst``/``.lz4`` variants, beacon-arrow-atlas/src/util.rs:16-21)
— describing one or more NAMED DATASETS, each a collection of N-dim
arrays plus per-dataset and per-array attributes, with per-dataset
per-column statistics; array data is zstd-compressed (the reference's
format page, docs/docs/2.0.0-rc2/formats/atlas.md). The headline
capability is **dataset pruning with statistics**: a range predicate
drops whole datasets *before any array data is read*
(beacon-arrow-atlas/src/datafusion/pruning.rs).

This module implements that documented model over a JSON registry:

  atlas.json = {"atlas": 1, "datasets": {name: {
      "arrays": {aname: {"dims": [...], "dtype": "float64",
                          "shape": [...], "path": "name/aname.af",
                          "fill_value": null}},
      "attrs": {...},                  # dataset-level -> ".attr" columns
      "array_attrs": {aname: {...}},   # -> "aname.attr" columns
      "stats": {aname: {"min": x, "max": y, "null_count": 0,
                         "row_count": n}}}}}

``.af`` files hold zstd-compressed little-endian C-order array bytes.
The byte-exact layout of atlas-rust's own ``.af`` framing lives in the
external crate; this implementation is self-consistent (write→read) and
carries the format's semantics — marker discovery, named datasets,
attrs-as-columns, stats pruning, column projection — through the shared
GridDataset core. Column naming matches the reference reader
(beacon-arrow-atlas/src/reader.rs:9-14): arrays under their own name,
per-array attributes as ``{array}.{attr}``, dataset attributes bare.
"""

from __future__ import annotations

import json
import os

import numpy as np

from beacon_spark.sources import bytesource as _bs

ATLAS_MARKER_NAMES = (
    "atlas.json", "atlas.json.zst", "atlas.json.lz4",
    "atlas.msgpack", "atlas.msgpack.zst", "atlas.msgpack.lz4",
)

# Separator for pseudo-paths addressing one dataset of one store:
# "<marker path>::<dataset name>" (read_nd plans one task set per dataset).
DATASET_SEP = "::"

# .af files decoded since process start (tests pin stats pruning on it)
AF_READS = 0


def _read_marker(path: str) -> dict:
    name = _bs.basename(path)
    if name not in ATLAS_MARKER_NAMES:
        raise ValueError(f"{path}: not an atlas marker (want one of {ATLAS_MARKER_NAMES})")
    raw = _bs.read_bytes(path)
    if name.endswith((".zst", ".lz4")) or ".msgpack" in name:
        raise ValueError(
            f"{path}: only plain atlas.json markers are supported "
            "(compressed/msgpack variants need the atlas package)"
        )
    return json.loads(raw)


class AtlasLazyArray:
    """One atlas array: the ``.af`` file is decoded on first access only
    (whole-array zstd frame — atlas's chunk granularity is the dataset,
    which is why dataset-level stats pruning is the format's scan cut)."""

    def __init__(self, af_path: str, shape: tuple[int, ...], dtype: np.dtype,
                 fill, nbytes: int):
        self.af_path = af_path
        self.shape = shape
        self.dtype = dtype
        self.fill = fill
        self.nbytes = nbytes  # exact decompressed size, from the registry
        self.ndim = len(shape)
        self._data: np.ndarray | None = None

    def _load(self) -> np.ndarray:
        global AF_READS
        if self._data is None:
            AF_READS += 1
            import pyarrow as pa

            raw = _bs.read_bytes(self.af_path)
            buf = pa.Codec("zstd").decompress(raw, self.nbytes)
            if self.dtype.kind in "US":  # strings: json-encoded list
                vals = json.loads(buf.to_pybytes())
                self._data = np.array(vals, dtype=self.dtype).reshape(self.shape)
            else:
                self._data = np.frombuffer(buf, self.dtype).reshape(self.shape)
        return self._data

    def __len__(self) -> int:
        return self.shape[0] if self.shape else 1

    def __getitem__(self, idx) -> np.ndarray:
        return self._load()[idx]

    def __array__(self, dtype=None, copy=None):
        full = self._load()
        return full.astype(dtype) if dtype is not None else full


def list_datasets(marker_path: str) -> list[str]:
    return sorted(_read_marker(marker_path)["datasets"])


def dataset_stats(marker_path: str) -> dict[str, dict[str, dict]]:
    """dataset name → column → {min, max, null_count, row_count}."""
    reg = _read_marker(marker_path)
    return {name: ds.get("stats", {}) for name, ds in reg["datasets"].items()}


def prune_datasets(
    marker_path: str,
    ranges: dict[str, tuple[float | None, float | None]] | None,
) -> list[str]:
    """Names of datasets that can match the AND-ed per-column ranges —
    the reference's dataset pruning (pruning.rs): a dataset whose stats
    interval for a constrained column is disjoint from the query range is
    dropped before any ``.af`` read. Fail-open per column (missing stats
    keep the dataset)."""
    reg = _read_marker(marker_path)
    kept = []
    for name, ds in reg["datasets"].items():
        stats = ds.get("stats", {})
        ok = True
        for col, (lo, hi) in (ranges or {}).items():
            st = stats.get(col)
            if st is None or st.get("min") is None or st.get("max") is None:
                continue
            try:
                if lo is not None and st["max"] < lo:
                    ok = False
                    break
                if hi is not None and st["min"] > hi:
                    ok = False
                    break
            except TypeError:
                # a hand-written registry can carry non-numeric stats —
                # pruning is an optimization, so unorderable stats keep
                # the dataset (fail-open) instead of failing the scan
                continue
        if ok:
            kept.append(name)
    return sorted(kept)


def open_atlas(path: str):
    """Open ``<marker>::<dataset>`` (or a marker with exactly one dataset)
    as a GridDataset. Opening touches the registry only — array data
    decodes lazily per slice."""
    from beacon_spark.sources.nd import GridDataset

    if DATASET_SEP in path:
        marker, ds_name = path.rsplit(DATASET_SEP, 1)
    else:
        marker, ds_name = path, None
    reg = _read_marker(marker)
    datasets = reg["datasets"]
    if ds_name is None:
        if len(datasets) != 1:
            raise ValueError(
                f"{marker}: holds {sorted(datasets)}; address one as "
                f"'{marker}{DATASET_SEP}<name>'"
            )
        ds_name = next(iter(datasets))
    if ds_name not in datasets:
        raise KeyError(f"{marker}: no dataset {ds_name!r} (have {sorted(datasets)})")
    spec = datasets[ds_name]
    root = _bs.dirname(marker)

    dims: dict[str, int] = {}
    variables: dict[str, tuple[tuple[str, ...], AtlasLazyArray]] = {}
    var_attrs: dict[str, dict] = {}
    for aname, aspec in spec["arrays"].items():
        shape = tuple(aspec["shape"])
        adims = tuple(aspec["dims"])
        rel = str(aspec["path"])
        # the registry is data, not trusted code: an array path must
        # stay INSIDE the store (a crafted '../../…' entry would read
        # arbitrary files into the scan as array bytes)
        if rel.startswith(("/", "\\")) or ".." in rel.split("/"):
            raise ValueError(
                f"{marker}::{ds_name}: array path {rel!r} escapes the "
                f"store root")
        arr = AtlasLazyArray(
            _bs.join(root, rel),
            shape,
            np.dtype(aspec["dtype"]),
            aspec.get("fill_value"),
            int(aspec["nbytes"]),
        )
        variables[aname] = (adims, arr)
        var_attrs[aname] = dict(spec.get("array_attrs", {}).get(aname, {}))
        if aspec.get("fill_value") is not None:
            # registry fill sentinels ride the SAME CF fill handling as
            # every other nd source (_FillValue -> NULL in flatten) —
            # ignoring them leaked the sentinel values through as data
            var_attrs[aname].setdefault("_FillValue", aspec["fill_value"])
        for d, s in zip(adims, shape):
            if dims.get(d, s) != s:
                # last-wins here surfaced later as a cryptic broadcast
                # error mid-flatten — fail at open with the real cause
                raise ValueError(
                    f"{marker}::{ds_name}: dimension {d!r} has "
                    f"conflicting sizes {dims[d]} and {s} across arrays"
                )
            dims[d] = s
    return GridDataset(dims, variables, var_attrs, dict(spec.get("attrs", {})))


def write_atlas_store(
    path: str,
    datasets: dict[str, dict],
    global_attrs_by_ds: dict[str, dict] | None = None,
) -> str:
    """Write an atlas store for fixtures/round-trips.

    ``datasets``: name → {"variables": {aname: (dims, ndarray)},
    "attrs": {...}, "array_attrs": {aname: {...}}}. Stats (min/max/
    null_count/row_count per numeric array) are computed here, exactly
    what ``prune_datasets`` consumes."""
    import pyarrow as pa

    os.makedirs(path, exist_ok=True)
    reg: dict = {"atlas": 1, "datasets": {}}
    for name, spec in datasets.items():
        ds_dir = os.path.join(path, name)
        os.makedirs(ds_dir, exist_ok=True)
        arrays: dict = {}
        stats: dict = {}
        for aname, (adims, arr) in spec["variables"].items():
            arr = np.asarray(arr)
            rel = f"{name}/{aname}.af"
            if arr.dtype.kind in "US":
                raw = json.dumps([str(x) for x in arr.reshape(-1)]).encode()
            else:
                raw = np.ascontiguousarray(
                    arr.astype(arr.dtype.newbyteorder("<"), copy=False)
                ).tobytes()
            with open(os.path.join(path, rel), "wb") as f:
                f.write(pa.Codec("zstd").compress(raw).to_pybytes())
            arrays[aname] = {
                "dims": list(adims),
                "dtype": arr.dtype.str,
                "shape": list(arr.shape),
                "path": rel,
                "fill_value": None,
                "nbytes": len(raw),
            }
            if arr.dtype.kind in "iuf" and arr.size:
                finite = arr[np.isfinite(arr)] if arr.dtype.kind == "f" else arr
                if finite.size:
                    stats[aname] = {
                        "min": float(finite.min()),
                        "max": float(finite.max()),
                        "null_count": int(arr.size - finite.size),
                        "row_count": int(arr.size),
                    }
        reg["datasets"][name] = {
            "arrays": arrays,
            "attrs": dict(spec.get("attrs", {})),
            "array_attrs": dict(spec.get("array_attrs", {})),
            "stats": stats,
        }
    with open(os.path.join(path, "atlas.json"), "w") as f:
        json.dump(reg, f)
    return os.path.join(path, "atlas.json")

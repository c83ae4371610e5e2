"""Spark Python DataSource (V2 API) surface for the nd readers.

``read_nd`` (sources/nd.py) is the primary distributed path — it plans
(file, region, row-chunk) tasks and flattens via ``mapInArrow``. This
module wraps the same machinery in Spark 4's Python DataSource API so
the formats also compose with the idiomatic reader surface:

    spark.dataSource.register(BeaconNDDataSource)
    spark.read.format("beacon_nd")
         .option("fmt", "netcdf").load("/data/obs/*.nc")

Partition planning happens in ``partitions()`` (one InputPartition per
row-chunk of the pruned region — the same planning-time pushdown story
as read_nd: the executor task reads only its slice); ``read()`` yields
Arrow record batches, so rows never materialize in Python objects.

The reference exposes these formats as DataFusion TableProviders
(beacon-arrow-netcdf/src/, beacon-arrow-zarr/src/datafusion/); this is
the Spark-native equivalent registration.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class NDPartition(InputPartition):
    def __init__(self, path: str, region_json: str, lo: int, hi: int):
        self.path = path
        self.region_json = region_json
        self.lo = lo
        self.hi = hi


class BeaconNDDataSource(DataSource):
    """Options: ``fmt`` (netcdf|zarr|tiff|atlas|hdf5), ``path`` (or the
    load() argument), ``dimensions`` (comma-separated), ``rows_per_task``."""

    @classmethod
    def name(cls) -> str:
        return "beacon_nd"

    def _files(self) -> list[str]:
        from beacon_spark.sources.paths import resolve_globs

        paths_json = self.options.get("paths")
        if paths_json:
            # the engine's SQL table functions take a LIST of globs —
            # ships here JSON-encoded (load() accepts only one string)
            paths = json.loads(paths_json)
        else:
            path = self.options.get("path")
            if not path:
                raise ValueError(
                    "beacon_nd: a load() path or path/paths option is required")
            paths = [path]
        return resolve_globs(paths, self.options.get("datasets_root"))

    def _fmt(self) -> str:
        return (self.options.get("fmt") or "netcdf").lower()

    def _dimensions(self) -> list[str] | None:
        dims = self.options.get("dimensions")
        return [d.strip() for d in dims.split(",")] if dims else None

    def _columns(self) -> list[str] | None:
        """Variable projection (JSON list): only the named variables
        flatten and ship through the Arrow boundary. Spark's Python
        DataSource has no column-pruning hook (reader() receives the
        FULL schema even under a narrow SELECT — verified on 4.1), so
        the caller passes the referenced-variable set explicitly; the
        engine's SQL rewrite derives it fail-open from the statement."""
        cols = self.options.get("columns")
        return json.loads(cols) if cols else None

    def _sample_file(self, files: list[str]) -> str:
        # an atlas path addresses the store MARKER; scan units are
        # marker::dataset (atlaslite.DATASET_SEP) — sample the first
        if self._fmt() == "atlas":
            from beacon_spark.sources.atlaslite import DATASET_SEP, list_datasets

            if DATASET_SEP not in files[0]:
                names = list_datasets(files[0])
                if not names:
                    raise FileNotFoundError(
                        f"beacon_nd: atlas store {files[0]!r} has no datasets")
                return f"{files[0]}{DATASET_SEP}{names[0]}"
        return files[0]

    def schema(self):
        from beacon_spark.sources.nd import _OPENERS
        from beacon_spark.sources.tabular import _arrow_to_spark_schema

        files = self._files()
        if not files:
            raise FileNotFoundError("beacon_nd: no files matched")
        sample = _OPENERS[self._fmt()](self._sample_file(files)).flatten(
            self._dimensions(), columns=self._columns(), row_range=(0, 1)
        )
        return _arrow_to_spark_schema(sample.schema)

    def reader(self, schema) -> "NDReader":
        return NDReader(
            self._fmt(),
            self._files(),
            self._dimensions(),
            int(self.options.get("rows_per_task", 1_000_000)),
            schema,
            self._columns(),
            parallelism=int(self.options.get("parallelism", 0)) or None,
        )


class NDReader(DataSourceReader):
    def __init__(self, fmt, files, dimensions, rows_per_task, schema,
                 columns=None, parallelism=None):
        import os as _os

        self.fmt = fmt
        self.files = files
        self.dimensions = dimensions
        self.rows_per_task = rows_per_task
        self.spark_schema = schema
        self.columns = columns
        # partitions() runs in a plan-time Python worker with no
        # SparkSession; the engine ships defaultParallelism as an option,
        # else fall back to the driver-contract core count / cpu count
        self.parallelism = parallelism or int(
            _os.environ.get("SPARK_GRAFT_CPUS", _os.cpu_count() or 8))
        self._ranges = None

    def pushFilters(self, filters):
        """WHERE-clause chunk pruning, the reference's 'predicate
        pushdown is automatic' contract (beacon-arrow-zarr
        datafusion/source.rs): numeric comparisons on 1-D coordinate
        variables tighten the planned region hull (coord_region).
        EVERY filter is yielded back unsupported, so Spark re-evaluates
        them post-scan — pruning can only SHRINK the region, never
        change results (fail-open by construction). Strict bounds are
        widened to inclusive hulls for the same reason."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ranges: dict[str, tuple] = {}

        def tighten(col, lo=None, hi=None):
            plo, phi = ranges.get(col, (None, None))
            if lo is not None:
                plo = lo if plo is None else max(plo, lo)
            if hi is not None:
                phi = hi if phi is None else min(phi, hi)
            ranges[col] = (plo, phi)

        for f in filters:
            attr = getattr(f, "attribute", None)
            v = getattr(f, "value", None)
            if (not attr or len(attr) != 1 or isinstance(v, bool)
                    or not isinstance(v, (int, float))):
                continue
            col = attr[0]
            if isinstance(f, EqualTo):
                tighten(col, float(v), float(v))
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                tighten(col, lo=float(v))
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                tighten(col, hi=float(v))
        self._ranges = ranges or None
        yield from filters

    def _scan_units(self) -> list[str]:
        """File paths → per-file scan units. Atlas markers expand to
        marker::dataset units AFTER stats pruning against the pushed
        WHERE ranges (the format's headline capability, the reference's
        pruning.rs) — datasets whose column stats cannot match are
        dropped before any array data is read."""
        if self.fmt != "atlas":
            return self.files
        from beacon_spark.sources.atlaslite import DATASET_SEP, prune_datasets

        units: list[str] = []
        for f in self.files:
            if DATASET_SEP in f:
                units.append(f)
                continue
            units.extend(
                f"{f}{DATASET_SEP}{n}" for n in prune_datasets(f, self._ranges)
            )
        return units

    def partitions(self):
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np

        from beacon_spark.sources.nd import (
            _OPENERS,
            _lead_block_rows,
            coord_region,
            effective_rows_per_task,
            split_task_rows,
        )

        opener = _OPENERS[self.fmt]

        def plan(f: str):
            ds = opener(f)  # lazy: metadata + coordinate vars only
            region = coord_region(ds, self.dimensions, self._ranges)
            if region is None:
                return f, None, 0, 0, 0
            n = int(np.prod([hi - lo for lo, hi in region])) if region else 1
            block = _lead_block_rows(ds, self.dimensions, region)
            inner = (int(np.prod([hi - lo for lo, hi in region[1:]]))
                     if len(region) > 1 else 1)
            lead = region[0][0] if region else 0
            lead_off = ((lead % (block // max(inner, 1))) * inner
                        if block and inner else 0)
            return f, region, n, block, lead_off

        units = self._scan_units()
        if len(units) > 8:
            # metadata opens are I/O-bound; planning runs on the driver's
            # Python worker (no SparkSession here — read_nd's cluster-
            # distributed planning isn't reachable), so thread it
            with ThreadPoolExecutor(max_workers=16) as pool:
                plans = list(pool.map(plan, units))
        else:
            plans = [plan(f) for f in units]
        # scale-adaptive, chunk-band-aligned task sizing — same planner
        # as read_nd (guide §2.2: the fixed 1M-row constant planned a
        # pruned 800k-row slice as ONE task)
        eff = effective_rows_per_task(
            sum(p[2] for p in plans), self.rows_per_task, self.parallelism)
        parts: list[NDPartition] = []
        for f, region, n, block, lead_off in plans:
            if region is None or n == 0:
                continue
            rjson = json.dumps(region)
            # explicit fine rows_per_task beats band alignment (same
            # contract as read_nd — tests pin task counts with it)
            use_block = block if block <= self.rows_per_task else 0
            for lo, hi in split_task_rows(n, eff, use_block, lead_off):
                parts.append(NDPartition(f, rjson, lo, hi))
        return parts or [NDPartition("", "[]", 0, 0)]

    def read(self, partition: NDPartition):
        import pyarrow as pa

        from beacon_spark.sources.nd import _OPENERS

        if not partition.path:
            return
        ds = _OPENERS[self.fmt](partition.path)
        region = [tuple(r) for r in json.loads(partition.region_json)]
        table = ds.flatten(
            self.dimensions,
            columns=self.columns,
            row_range=(partition.lo, partition.hi),
            region=region,
        )
        # align to the negotiated schema (multi-file safety, same rule as
        # read_nd): null-fill missing columns, cast mismatched types
        import pyarrow as _pa
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.spark_schema)
        cols = []
        for fld in target:
            if fld.name in table.column_names:
                col = table.column(fld.name)
                if col.type != fld.type:
                    col = col.cast(fld.type)
            else:
                col = _pa.nulls(table.num_rows, fld.type)
            cols.append(col)
        aligned = pa.table(cols, names=[f.name for f in target])
        yield from aligned.to_batches(max_chunksize=1 << 16)


def register_nd_datasource(spark) -> None:
    """Idempotent registration of the ``beacon_nd`` format."""
    if getattr(spark, "_beacon_nd_ds_registered", False):
        return
    spark.dataSource.register(BeaconNDDataSource)
    # WHERE-clause chunk pruning rides the Python-DS pushFilters hook
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark._beacon_nd_ds_registered = True

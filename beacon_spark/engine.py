"""Engine — the embedded entry point (the Spark analog of Beacon's
``Database::open`` embedded mode, ``beacon-core/src/embedded.rs``).

    engine = Engine(spark, datasets_root="/data")
    engine.sql("SELECT ... FROM read_parquet('obs/*.parquet')")
    engine.query({"select": [...], "filter": {...}, "from": ...})
    engine.read_parquet("obs/*.parquet")

Both the SQL and the JSON interfaces compile to the same DataFrame plans
(the reference's unified statement pipeline, ``statement_plan/mod.rs:1-13``).
The SQL path is ``spark.sql`` with a thin pre-parser for the dialect
extensions Spark lacks (SUMMARIZE, read_* table functions, try_arrow_cast
with Arrow type names), mirroring how Beacon splits "Beacon statements"
from DataFusion statements (``parser/beacon_parser.rs:33-115``).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from beacon_spark import dsl
from beacon_spark.functions.core import _arrow_name_to_spark, register_functions
from beacon_spark.operators.summarize import summarize
from beacon_spark.sources import paths as _paths
from beacon_spark.sources import tabular
from beacon_spark.sources.nd import read_nd

_READ_FN_RE = re.compile(
    r"\bread_(parquet|csv|arrow|netcdf|zarr|hdf5|odv_ascii|odv)\s*\("
    r"\s*('[^']*'(?:\s*,\s*'[^']*')*)\s*\)",
    re.IGNORECASE,
)
_TRY_ARROW_CAST_RE = re.compile(
    r"\btry_arrow_cast\s*\(", re.IGNORECASE
)
_SUMMARIZE_RE = re.compile(r"^\s*SUMMARIZE\s+(.*?);?\s*$", re.IGNORECASE | re.DOTALL)
_ANALYZE_RE = re.compile(
    r"^\s*ANALYZE\s+FILES(?:\s+'([^']*)')?(\s+FORCE)?;?\s*$", re.IGNORECASE
)


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        datasets_root: str | None = None,
        default_table: str | None = None,
    ):
        self.spark = spark
        self.datasets_root = datasets_root
        self.default_table = default_table
        register_functions(spark)

    # ------------------------------------------------------------ sources

    def read_parquet(self, paths, merge: str = "supertype") -> DataFrame:
        return tabular.read_parquet(self.spark, paths, self.datasets_root, merge)

    def read_csv(self, paths, delimiter: str | None = None) -> DataFrame:
        return tabular.read_csv(self.spark, paths, self.datasets_root, delimiter)

    def read_arrow(self, paths) -> DataFrame:
        return tabular.read_arrow(self.spark, paths, self.datasets_root)

    def read_odv(self, paths) -> DataFrame:
        from beacon_spark.sources.odv import read_odv

        return read_odv(self.spark, paths, self.datasets_root)

    def read_netcdf(self, paths, dimensions=None) -> DataFrame:
        return read_nd(self.spark, "netcdf", paths, self.datasets_root, dimensions)

    def read_zarr(self, paths, dimensions=None) -> DataFrame:
        return read_nd(self.spark, "zarr", paths, self.datasets_root, dimensions)

    def read_parquet_schema(self, paths) -> DataFrame:
        return tabular.read_parquet_schema(self.spark, paths, self.datasets_root)

    def read_csv_schema(self, paths, delimiter=None) -> DataFrame:
        return tabular.read_csv_schema(self.spark, paths, self.datasets_root, delimiter)

    def read_arrow_schema(self, paths) -> DataFrame:
        return tabular.read_arrow_schema(self.spark, paths, self.datasets_root)

    def list_datasets(self) -> DataFrame:
        """Every file under the datasets root + detected format
        (beacon-functions/src/file_formats/list_datasets.rs)."""
        if self.datasets_root is None:
            raise ValueError("Engine has no datasets_root configured")
        rows = _paths.list_datasets(self.datasets_root)
        return self.spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("dataset", T.StringType(), False),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
        )

    # ------------------------------------------------------------ sql

    def sql(self, statement: str) -> DataFrame:
        """Spark SQL with the dialect extensions pre-compiled away.

        - ``SUMMARIZE <table|query>`` → one-pass profiling aggregate
        - ``read_parquet('glob')`` etc. in FROM → temp views over our readers
        - ``try_arrow_cast(e, 'Int32')`` → ``try_cast`` with Spark type names
        """
        m = _ANALYZE_RE.match(statement)
        if m:
            # ANALYZE FILES ['prefix'] [FORCE] (parser/statement.rs:305-318)
            from beacon_spark.stats import analyze_files

            if self.datasets_root is None:
                raise ValueError("ANALYZE FILES needs a datasets_root")
            prefix, force = m.group(1), bool(m.group(2))
            files = None
            if prefix:
                from beacon_spark.sources.paths import resolve_globs

                files = resolve_globs(f"{prefix}*.parquet", self.datasets_root)
            n = analyze_files(self.datasets_root, files, force=force)
            return self.spark.createDataFrame(
                [(n,)], T.StructType([T.StructField("files_analyzed", T.IntegerType())])
            )

        m = _SUMMARIZE_RE.match(statement)
        if m:
            src = m.group(1).strip()
            if src.startswith("(") and src.endswith(")"):
                src = src[1:-1]
            if re.match(r"^\s*SELECT\b", src, re.IGNORECASE) or _READ_FN_RE.search(src):
                return summarize(self.sql(src))
            return summarize(self.spark.table(src))

        statement = self._rewrite_read_fns(statement)
        statement = self._rewrite_try_arrow_cast(statement)
        return self.spark.sql(statement)

    def _rewrite_read_fns(self, statement: str) -> str:
        """Replace ``read_*('glob' [, 'glob'...])`` table functions with
        temp views backed by the matching reader (the reference registers
        these as UDTFs — beacon-functions/src/file_formats/mod.rs:21-107)."""

        def repl(m: re.Match) -> str:
            fmt = m.group(1).lower()
            globs = [g.strip()[1:-1] for g in m.group(2).split(",")]
            df = {
                "parquet": self.read_parquet,
                "csv": self.read_csv,
                "arrow": self.read_arrow,
                "netcdf": self.read_netcdf,
                "zarr": self.read_zarr,
                "hdf5": self.read_netcdf,
                "odv": self.read_odv,
                "odv_ascii": self.read_odv,
            }[fmt](globs)
            name = f"__beacon_read_{abs(hash((fmt, tuple(globs)))) % 10**10}"
            df.createOrReplaceTempView(name)
            return name

        return _READ_FN_RE.sub(repl, statement)

    def _rewrite_try_arrow_cast(self, statement: str) -> str:
        """try_arrow_cast(expr, 'ArrowType') → try_cast(expr AS sparktype)."""
        out = []
        pos = 0
        for m in _TRY_ARROW_CAST_RE.finditer(statement):
            start = m.end()  # after the open paren
            depth = 1
            i = start
            while i < len(statement) and depth:
                if statement[i] == "(":
                    depth += 1
                elif statement[i] == ")":
                    depth -= 1
                i += 1
            inner = statement[start : i - 1]
            expr, _, type_lit = inner.rpartition(",")
            type_name = type_lit.strip().strip("'\"")
            spark_type = _arrow_name_to_spark(type_name)
            out.append(statement[pos : m.start()])
            out.append(f"try_cast({expr.strip()} AS {spark_type})")
            pos = i
        out.append(statement[pos:])
        return "".join(out)

    # ------------------------------------------------------------ json dsl

    def query(self, body: dict[str, Any], output_path: str | None = None) -> DataFrame:
        """JSON query DSL (or ``{"sql": ...}``) → DataFrame — the two forms
        compile to the same plans (README.md:117-119). An ``output`` block
        (``{"format": ..., ...options}``) plus ``output_path`` writes the
        result in the requested format (query/output.rs)."""
        body = dict(body)
        output = body.pop("output", None)
        df = self.sql(body["sql"]) if "sql" in body else dsl.compile_query(self, body)
        if output is not None and output_path is not None:
            from beacon_spark.outputs import write_output

            opts = {k: v for k, v in output.items() if k != "format"}
            write_output(df, output["format"], output_path, **opts)
        return df

    def resolve_from(
        self,
        spec: Any,
        projection: list[str] | None = None,
        ranges: dict | None = None,
    ) -> DataFrame:
        """Resolve a DSL ``from`` (query/from.rs:23-131): named table, or
        ``{"<format>": {"paths": [...], ...}}``. ``projection`` is the
        DSL compiler's pushdown column set — Catalyst prunes scans on its
        own, so it only gates nd readers (which prune variables).
        ``ranges`` (column → [lo, hi] from the filter) drives stats-index
        file pruning for parquet collections (fail-open)."""
        if spec is None:
            if self.default_table is None:
                raise ValueError("query has no 'from' and engine has no default table")
            spec = self.default_table
        if isinstance(spec, str):
            return self.spark.table(spec)
        if isinstance(spec, dict):
            ((fmt, cfg),) = spec.items()
            fmt = fmt.lower()
            if fmt == "parquet":
                if ranges and self.datasets_root:
                    from beacon_spark.sources.paths import resolve_globs
                    from beacon_spark.stats import prune_files

                    files = resolve_globs(cfg["paths"], self.datasets_root)
                    pruned = prune_files(self.datasets_root, files, ranges)
                    if not pruned:
                        # every file provably dead → empty frame, full schema
                        full = self.read_parquet(files)
                        return self.spark.createDataFrame([], full.schema)
                    if pruned != files:
                        return self.read_parquet(pruned)
                return self.read_parquet(cfg["paths"])
            if fmt == "csv":
                return self.read_csv(cfg["paths"], cfg.get("delimiter"))
            if fmt == "arrow":
                return self.read_arrow(cfg["paths"])
            if fmt in ("netcdf", "hdf5"):
                return self.read_netcdf(cfg["paths"])
            if fmt == "zarr":
                return self.read_zarr(cfg["paths"])
            if fmt == "odv":
                return self.read_odv(cfg["paths"])
            raise ValueError(f"unsupported from format: {fmt}")
        raise ValueError(f"bad from spec: {spec!r}")

    # ------------------------------------------------------------ stats

    def analyze_files(self, force: bool = False) -> int:
        from beacon_spark.stats import analyze_files

        if self.datasets_root is None:
            raise ValueError("Engine has no datasets_root configured")
        return analyze_files(self.datasets_root, force=force)

    def view_statistics(self) -> DataFrame:
        from beacon_spark.stats import statistics_df

        return statistics_df(self.spark, self.datasets_root)

    # ------------------------------------------------------------ operators

    def summarize(self, df_or_name) -> DataFrame:
        df = (
            df_or_name
            if isinstance(df_or_name, DataFrame)
            else self.spark.table(df_or_name)
        )
        return summarize(df)

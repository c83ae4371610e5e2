"""ODV ASCII (Ocean Data View spreadsheet) reader + writer.

Format (reference: ``beacon-arrow-odv/src/reader.rs``):
  - comment header ``//<Key>value</Key>`` lines; ``//<MetaVariable>`` /
    ``//<DataVariable>`` lines declare columns:
    ``label="Name [units]" value_type="FLOAT" qf_schema=... comment=...``
  - value types: INDEXED_TEXT/TEXT:n → string, INTEGER → int64,
    FLOAT → float32, DOUBLE → float64 (reader.rs:246-255)
  - implicit always-present fields: Cruise, Station, Type (strings) and
    the ``yyyy-mm-ddThh:mm:ss.sss`` / ``time_ISO8601`` time columns
    (timestamp[ms]) (reader.rs:155-175, 275-283)
  - a ``QV:SCHEMA[:FIELD]`` column becomes ``<field>_qc`` (string), bound
    to the preceding column when FIELD is omitted (reader.rs:285-310)
  - per-field metadata (units/qf_schema/comment) appended as constant
    columns ``"<field>.<key>"`` (reader.rs:78-97,109-118) — the same
    attributes-as-columns convention as the nd formats
  - body: tab-separated, ``/``-comment lines skipped

Spark integration: one task per file via ``mapInArrow`` over the file
list — header parse + pandas TSV decode execute on executors, schemas
harmonized driver-side from the (cheap) headers only.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import numpy as np

from beacon_spark.sources import bytesource as _bs
import pandas as pd
import pyarrow as pa

_VAR_RE = re.compile(
    r"^//<(?:MetaVariable|DataVariable)>(.*)</(?:MetaVariable|DataVariable)>"
)
_ATTR_RE = re.compile(r'(\w+)="([^"]*)"')
_UNITS_RE = re.compile(r"^(.*?)\s*\[(.*?)\]$")

_VALUE_TYPES = {
    "INDEXED_TEXT": pa.string(),
    "INTEGER": pa.int64(),
    "FLOAT": pa.float32(),
    "DOUBLE": pa.float64(),
}

_TIME_COLUMNS = {"yyyy-mm-ddthh:mm:ss.sss", "time_iso8601"}


class OdvField(NamedTuple):
    name: str
    dtype: pa.DataType
    metadata: dict[str, str]


def _value_type(vt: str) -> pa.DataType:
    if vt in _VALUE_TYPES:
        return _VALUE_TYPES[vt]
    if vt.startswith("TEXT:"):
        return pa.string()
    raise ValueError(f"unsupported ODV value_type {vt!r}")


def parse_header(lines: list[str]) -> tuple[dict[str, OdvField], list[str]]:
    """Parse comment-header lines + the column header row. Returns the
    declared-field registry and the header row's column labels."""
    declared: dict[str, OdvField] = {
        "Cruise": OdvField("Cruise", pa.string(), {}),
        "Station": OdvField("Station", pa.string(), {}),
        "Type": OdvField("Type", pa.string(), {}),
    }
    header_row: list[str] | None = None
    for line in lines:
        if not line.startswith("//"):
            header_row = line.rstrip("\n").split("\t")
            break
        m = _VAR_RE.match(line)
        if m:
            attrs = dict(_ATTR_RE.findall(m.group(1)))
            label = attrs.get("label")
            vt = attrs.get("value_type")
            qf, comment = attrs.get("qf_schema"), attrs.get("comment")
            if not label or not vt:
                continue
            meta: dict[str, str] = {}
            um = _UNITS_RE.match(label)
            name = label
            if um:
                name = um.group(1)
                if um.group(2):
                    meta["units"] = um.group(2)
            if qf:
                meta["qf_schema"] = qf
            if comment:
                meta["comment"] = comment
            declared[name] = OdvField(name, _value_type(vt), meta)
    if header_row is None:
        raise ValueError("ODV file has no data header row")
    return declared, header_row


def resolve_columns(
    declared: dict[str, OdvField], header_row: list[str]
) -> list[OdvField]:
    """Map the header row onto typed output fields (reader.rs:260-315)."""
    out: list[OdvField] = []
    for label in header_row:
        um = _UNITS_RE.match(label)
        name = um.group(1) if um else label
        if name.lower() in _TIME_COLUMNS:
            f = declared.get(name, OdvField(name, pa.string(), {}))
            out.append(OdvField(name, pa.timestamp("ms"), f.metadata))
        elif name in declared:
            out.append(declared[name])
        elif name.startswith("QV:"):
            parts = name.split(":")
            if len(parts) == 2:
                if not out:
                    raise ValueError(f"QF column {name!r} with no preceding field")
                out.append(OdvField(f"{out[-1].name}_qc", pa.string(), {}))
            elif len(parts) == 3:
                out.append(OdvField(f"{parts[2]}_qc", pa.string(), {}))
            else:
                raise ValueError(f"invalid QF column {name!r}")
        else:
            out.append(OdvField(name, pa.string(), {}))
    return out


def read_odv_table(path: str) -> pa.Table:
    """One ODV file → Arrow table (runs executor-side)."""
    header_lines: list[str] = []
    with _bs.open_text(path, errors="replace") as f:
        for line in f:
            header_lines.append(line)
            if not line.startswith("//"):
                break
    declared, header_row = parse_header(header_lines)
    cols = resolve_columns(declared, header_row)

    # body reads through the byte-source too: a raw-path read_csv broke
    # object-store URIs (header opened fine, body 404'd) and decoded the
    # body strict-utf-8 while the header tolerated bad bytes
    with _bs.open_text(path, errors="replace") as body:
        pdf = pd.read_csv(
            body, sep="\t", comment=None, skiprows=len(header_lines),
            header=None, names=[f"c{i}" for i in range(len(cols))], dtype=str,
            na_values=[""], keep_default_na=False, engine="c",
            quoting=3,
        )
    # drop any stray comment lines inside the body
    if len(pdf):
        pdf = pdf[~pdf["c0"].astype(str).str.startswith("//")]

    arrays: list[pa.Array] = []
    names: list[str] = []
    seen: set[str] = set()
    for i, fld in enumerate(cols):
        raw = pdf[f"c{i}"]
        if pa.types.is_timestamp(fld.dtype):
            vals = pd.to_datetime(raw, errors="coerce", format="ISO8601")
            arr = pa.Array.from_pandas(vals).cast(pa.timestamp("ms"))
        elif pa.types.is_integer(fld.dtype):
            # nullable Int64 keeps the parse integer-exact: to_numeric
            # falls back to float64 when the column has ANY null, which
            # silently rounds int64 values beyond 2^53 (r13 net catch,
            # same class as the float ulp bug above)
            try:
                vals = raw.astype("Int64")
            except (ValueError, TypeError):
                vals = pd.to_numeric(raw, errors="coerce")
            arr = pa.Array.from_pandas(vals).cast(fld.dtype, safe=False)
        elif pa.types.is_floating(fld.dtype):
            # NOT pd.to_numeric for the clean case: it parses via
            # pandas' fast xstrtod, which is off by 1 ulp on some
            # doubles ('5.960464477539063e-08' → ...064e-08; caught by
            # the r13 generative writer net). Series.astype goes
            # through C strtod — exact — and the coercing parser
            # survives only as the malformed-cell fallback.
            try:
                vals = raw.astype(np.float64)
            except (ValueError, TypeError):
                vals = pd.to_numeric(raw, errors="coerce").astype(np.float64)
            arr = pa.Array.from_pandas(vals).cast(fld.dtype, safe=False)
        else:
            arr = pa.Array.from_pandas(raw.astype("object"))
        name = fld.name
        while name in seen:
            name = name + "_"
        seen.add(name)
        names.append(name)
        arrays.append(arr)

    # per-field metadata → constant columns "<field>.<key>" (reader.rs:78-97)
    n = len(pdf)
    for fld in cols:
        for k, v in fld.metadata.items():
            col = f"{fld.name}.{k}"
            if col not in seen:
                seen.add(col)
                names.append(col)
                arrays.append(pa.array([v] * n, pa.string()))

    return pa.table(arrays, names=names)


def odv_schema(path: str) -> pa.Schema:
    header_lines: list[str] = []
    with _bs.open_text(path, errors="replace") as f:
        for line in f:
            header_lines.append(line)
            if not line.startswith("//"):
                break
    declared, header_row = parse_header(header_lines)
    cols = resolve_columns(declared, header_row)
    # mirror read_odv_table's naming exactly: DATA columns dedupe by
    # suffixing, METADATA columns colliding with an existing name are
    # SKIPPED (suffixing them here declared a column the table never
    # emits — read_odv then null-filled a phantom column)
    seen: set[str] = set()
    out: list[pa.Field] = []
    for c in cols:
        name = c.name
        while name in seen:
            name = name + "_"
        seen.add(name)
        out.append(pa.field(name, c.dtype, True))
    for c in cols:
        for k in c.metadata:
            col = f"{c.name}.{k}"
            if col not in seen:
                seen.add(col)
                out.append(pa.field(col, pa.string(), True))
    return pa.schema(out)


def read_odv(spark, paths, datasets_root: str | None = None):
    """``read_odv_ascii(globs)`` — distributed over the file list."""
    from pyspark.sql import types as T

    from beacon_spark.schema import super_schema
    from beacon_spark.sources.paths import resolve_globs
    from beacon_spark.sources.tabular import _arrow_to_spark_schema, _schemas_parallel

    files = resolve_globs(paths, datasets_root)
    schemas = _schemas_parallel(files, odv_schema)
    target = super_schema([_arrow_to_spark_schema(s) for s in schemas])

    from pyspark.sql.pandas.types import to_arrow_type

    target_arrow = pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType), True) for f in target.fields]
    )

    paths_df = spark.createDataFrame(
        [(f,) for f in files],
        T.StructType([T.StructField("path", T.StringType(), False)]),
    ).repartition(min(len(files), 64))

    def _scan(batches):
        for b in batches:
            for path in b.column("path").to_pylist():
                table = read_odv_table(path)
                cols = []
                for fld in target_arrow:
                    if table.schema.get_field_index(fld.name) >= 0:
                        cols.append(table.column(fld.name).cast(fld.type, safe=False))
                    else:
                        cols.append(pa.nulls(len(table), fld.type))
                yield from pa.table(cols, schema=target_arrow).to_batches(
                    max_chunksize=1 << 16
                )

    return paths_df.mapInArrow(_scan, target)


# ---------------------------------------------------------------- writer


def write_odv(
    df,
    path: str,
    longitude_column: str | None = None,
    latitude_column: str | None = None,
    depth_column: str | None = None,
    time_column: str | None = None,
    key_column: str | None = None,
    qf_columns: dict[str, str] | None = None,
    metadata_columns: list[str] | None = None,
) -> None:
    """ODV spreadsheet writer (output.rs:120, beacon-arrow-odv/src/
    writer.rs:49-70: OdvOptions assign column roles; data vs metadata
    columns). Streams partitions through toLocalIterator — bounded driver
    memory (one partition at a time), single-file download semantics."""
    from pyspark.sql import functions as F

    meta_roles = {
        "METALONGITUDE": longitude_column,
        "METALATITUDE": latitude_column,
        "METADEPTH": depth_column,
        "METATIME": time_column,
        "METAKEY": key_column,
    }
    role_of = {v: k for k, v in meta_roles.items() if v}
    metadata_columns = metadata_columns or []

    def value_type(dt) -> str:
        s = dt.simpleString()
        if s in ("int", "bigint", "smallint", "tinyint"):
            return "INTEGER"
        if s == "float":
            return "FLOAT"
        if s == "double":
            return "DOUBLE"
        return "INDEXED_TEXT"

    with open(path, "w", encoding="utf-8") as out:
        out.write("//<Encoding>UTF-8</Encoding>\n")
        out.write("//<Software>beacon_spark</Software>\n")
        out.write("//<DataType>Profiles</DataType>\n")
        for fld in df.schema.fields:
            tag = (
                "MetaVariable"
                if fld.name in role_of or fld.name in metadata_columns
                else "DataVariable"
            )
            var_type = role_of.get(fld.name, "METABASIC" if tag == "MetaVariable" else "")
            vt_attr = f' var_type="{var_type}"' if var_type else ""
            out.write(
                f'//<{tag}>label="{fld.name}"{vt_attr} '
                f'value_type="{value_type(fld.dataType)}" qf_schema="" '
                f'comment=""</{tag}>\n'
            )
        out.write("\t".join(f.name for f in df.schema.fields) + "\n")
        for row in df.toLocalIterator():
            vals = []
            for v in row:
                if v is None:
                    vals.append("")
                elif hasattr(v, "isoformat"):
                    vals.append(v.isoformat(timespec="milliseconds"))
                else:
                    # the format has no quoting: a tab/newline inside a
                    # string value would shift every later column / split
                    # the row — replace with spaces (lossy but documented;
                    # the alternative is a corrupt spreadsheet)
                    s = str(v)
                    if "\t" in s or "\n" in s or "\r" in s:
                        s = (s.replace("\t", " ")
                             .replace("\r\n", " ")
                             .replace("\n", " ")
                             .replace("\r", " "))
                    vals.append(s)
            out.write("\t".join(vals) + "\n")

"""Supertype schema harmonization.

Re-expresses the reference's super-type lattice (Beacon
``beacon-db/beacon-common/src/super_typing.rs:17-180``) on Spark types:
multi-file tables merge their per-file schemas by *field-name union*, every
field nullable, and conflicting types widened to the least common supertype
(Polars/NumPy-style widening: int ⊔ float → double, int ⊔ string → string,
any ⊔ null → any). An irreconcilable pair (e.g. array vs map) is a hard
error, mirroring ``super_typing.rs:529``. The merge is order-independent
(``super_typing.rs:543``).

Divergences from the reference (documented, SURVEY.md §1.2):
  - Spark has no unsigned ints: readers map UInt8/16/32 → next wider signed
    int, UInt64 → DecimalType(20, 0).
  - Spark timestamps are µs; Beacon's are ns (truncation at read).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SupertypeError(TypeError):
    """Raised when two types have no common supertype."""


# Widening ladder for integers (by byte width). Spark has no unsigned types.
_INT_ORDER = {T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2, T.LongType(): 3}
_FLOAT_ORDER = {T.FloatType(): 0, T.DoubleType(): 1}


def _is_int(dt: T.DataType) -> bool:
    return dt in _INT_ORDER


def _is_float(dt: T.DataType) -> bool:
    return dt in _FLOAT_ORDER


def _is_numeric(dt: T.DataType) -> bool:
    return _is_int(dt) or _is_float(dt) or isinstance(dt, T.DecimalType)


def super_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common supertype of two Spark types (commutative)."""
    if a == b:
        return a
    # any ⊔ null → any  (super_typing.rs: any ⊔ Null → any)
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a

    # integer ⊔ integer → wider integer
    if _is_int(a) and _is_int(b):
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    # float ⊔ float → wider float
    if _is_float(a) and _is_float(b):
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    # int ⊔ float → double (Polars rule: mixing magnitude domains widens to f64)
    if (_is_int(a) and _is_float(b)) or (_is_float(a) and _is_int(b)):
        return T.DoubleType()
    # decimal ⊔ numeric → double (conservative; decimals of differing scale too)
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        prec = max(a.precision - a.scale, b.precision - b.scale)
        scale = max(a.scale, b.scale)
        if prec + scale <= 38:
            return T.DecimalType(prec + scale, scale)
        return T.DoubleType()
    if (isinstance(a, T.DecimalType) and _is_numeric(b)) or (
        isinstance(b, T.DecimalType) and _is_numeric(a)
    ):
        return T.DoubleType()

    # boolean ⊔ numeric → numeric
    if isinstance(a, T.BooleanType) and _is_numeric(b):
        return b
    if isinstance(b, T.BooleanType) and _is_numeric(a):
        return a

    # anything-scalar ⊔ string → string  (Int* ⊔ Utf8 → Utf8, super_typing.rs:101-180)
    for x, y in ((a, b), (b, a)):
        if isinstance(x, T.StringType) and isinstance(
            y,
            (
                T.BooleanType, T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
                T.TimestampType, T.TimestampNTZType, T.BinaryType,
            ),
        ):
            return T.StringType()

    # date ⊔ timestamp → timestamp
    for x, y in ((a, b), (b, a)):
        if isinstance(x, T.DateType) and isinstance(y, (T.TimestampType, T.TimestampNTZType)):
            return y
    if isinstance(a, (T.TimestampType, T.TimestampNTZType)) and isinstance(
        b, (T.TimestampType, T.TimestampNTZType)
    ):
        return T.TimestampType()

    # nested types merge element-wise
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(super_type(a.elementType, b.elementType), True)
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return T.MapType(
            super_type(a.keyType, b.keyType), super_type(a.valueType, b.valueType), True
        )
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return super_schema([a, b])

    raise SupertypeError(f"no common supertype for {a.simpleString()} and {b.simpleString()}")


def super_schema(schemas: list[T.StructType]) -> T.StructType:
    """Field-name union of schemas, types widened, all fields nullable.

    Field order: first-seen order across the input schemas. The TYPE
    result is order-independent (mirroring super_typing.rs:543's
    property test): each column's distinct types fold in a CANONICAL
    order, not listing order — the lattice is partial, so a raw
    left-to-right fold made both the widened type and whether the
    merge errors at all depend on which file the lister happened to
    return first (``[boolean, binary, string]`` errored at
    boolean⊔binary while ``[binary, string, boolean]`` reached string
    — caught by tests/test_schema_property.py)."""
    order: list[str] = []
    merged: dict[str, list[T.DataType]] = {}
    for schema in schemas:
        for field in schema.fields:
            if field.name not in merged:
                order.append(field.name)
                merged[field.name] = [field.dataType]
            elif field.dataType not in merged[field.name]:
                merged[field.name].append(field.dataType)

    def join_all(types: list[T.DataType]) -> T.DataType:
        out, *rest = sorted(types, key=lambda t: t.simpleString())
        for t in rest:
            out = super_type(out, t)
        return out

    return T.StructType(
        [T.StructField(n, join_all(merged[n]), True) for n in order])


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: cast matching columns, NULL-fill
    missing ones (the Spark analog of Beacon's ``SupercastUnionCoercion``
    analyzer rule, ``beacon-datafusion-ext/src/analyzer_rules/union_by_name.rs:19-82``).

    Pure projection — no shuffle; Catalyst folds the casts into the scan.
    """
    existing = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in target.fields:
        # column names are FLAT — a dot is part of the name (attribute
        # columns "<var>.<attr>"), never struct access — so quote always
        ref = F.col("`" + field.name.replace("`", "``") + "`")
        if field.name in existing:
            if existing[field.name] == field.dataType:
                cols.append(ref)
            else:
                cols.append(ref.cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def supertype_align(*dfs: DataFrame) -> list[DataFrame]:
    """Align any number of DataFrames to their common super-schema."""
    target = super_schema([df.schema for df in dfs])
    return [align_to_schema(df, target) for df in dfs]


def union_all_by_name(*dfs: DataFrame) -> DataFrame:
    """UNION ALL BY NAME with supertype widening + NULL fill.

    Semantics: ``docs/docs/2.0.0-rc2/sql/union-by-name.md`` — inputs matched
    by column name, missing columns become typed NULLs, conflicting types
    widen via the supertype lattice. Spark's ``unionByName`` alone errors on
    Int32-vs-Float64; the pre-alignment pass fixes that.
    """
    aligned = supertype_align(*dfs)
    return reduce(lambda x, y: x.unionByName(y), aligned)


def union_by_name(*dfs: DataFrame) -> DataFrame:
    """UNION (distinct) BY NAME — union_all_by_name + dropDuplicates."""
    return union_all_by_name(*dfs).distinct()

"""Supertype lattice tests — ports of the reference's inline cases
(beacon-common/src/super_typing.rs:504-580: widening rules, nullability,
order independence, irreconcilable pairs)."""

import pytest
from pyspark.sql import types as T

from beacon_spark.schema import (
    SupertypeError,
    align_to_schema,
    super_schema,
    super_type,
    union_all_by_name,
)


def test_same_type_identity():
    assert super_type(T.IntegerType(), T.IntegerType()) == T.IntegerType()


def test_null_is_identity():
    assert super_type(T.NullType(), T.DoubleType()) == T.DoubleType()
    assert super_type(T.StringType(), T.NullType()) == T.StringType()


def test_integer_widening():
    assert super_type(T.ByteType(), T.LongType()) == T.LongType()
    assert super_type(T.ShortType(), T.IntegerType()) == T.IntegerType()


def test_int_float_widens_to_double():
    assert super_type(T.LongType(), T.FloatType()) == T.DoubleType()
    assert super_type(T.IntegerType(), T.DoubleType()) == T.DoubleType()


def test_numeric_string_widens_to_string():
    # Int* ⊔ Utf8 → Utf8 (super_typing.rs:101-180)
    assert super_type(T.IntegerType(), T.StringType()) == T.StringType()
    assert super_type(T.DoubleType(), T.StringType()) == T.StringType()


def test_date_timestamp():
    assert super_type(T.DateType(), T.TimestampType()) == T.TimestampType()


def test_nested_arrays():
    assert super_type(
        T.ArrayType(T.IntegerType()), T.ArrayType(T.DoubleType())
    ) == T.ArrayType(T.DoubleType(), True)


def test_irreconcilable_is_error():
    with pytest.raises(SupertypeError):
        super_type(T.ArrayType(T.IntegerType()), T.MapType(T.StringType(), T.IntegerType()))


def test_schema_merge_order_independent():
    s1 = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    s2 = T.StructType([T.StructField("b", T.StringType()), T.StructField("a", T.DoubleType())])
    m12 = super_schema([s1, s2])
    m21 = super_schema([s2, s1])
    assert {f.name: f.dataType for f in m12} == {f.name: f.dataType for f in m21}
    assert all(f.nullable for f in m12.fields)


def test_field_name_union():
    s1 = T.StructType([T.StructField("a", T.IntegerType())])
    s2 = T.StructType([T.StructField("b", T.LongType())])
    merged = super_schema([s1, s2])
    assert [f.name for f in merged.fields] == ["a", "b"]


def test_align_and_union(spark):
    a = spark.createDataFrame([(1, 2.0)], "x int, y double")
    b = spark.createDataFrame([(9,)], "x bigint")
    target = super_schema([a.schema, b.schema])
    aligned = align_to_schema(b, target)
    assert [f.dataType for f in aligned.schema.fields] == [T.LongType(), T.DoubleType()]
    u = union_all_by_name(a, b)
    rows = sorted((r.x, r.y) for r in u.collect())
    assert rows == [(1, 2.0), (9, None)]

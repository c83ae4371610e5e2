"""Scalar-function tests (beacon-functions/src registry analogs)."""

from pyspark.sql import functions as F

from beacon_spark.functions.core import (
    cast_int8_as_char,
    coalesce_label,
    map_lookup,
    try_arrow_cast,
)


def test_try_arrow_cast(spark):
    df = spark.createDataFrame([("12", "abc")], "a string, b string")
    row = df.select(
        try_arrow_cast("a", "Int32").alias("ok"),
        try_arrow_cast("b", "Float64").alias("bad"),
        try_arrow_cast("a", "Utf8").alias("s"),
    ).collect()[0]
    assert row.ok == 12 and row.bad is None and row.s == "12"


def test_coalesce_label(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (2.0, None), (None, None)], "a double, b double"
    )
    got = [r.lbl for r in df.select(
        coalesce_label("a", "from_a", "b", "from_b").alias("lbl")).collect()]
    assert got == ["from_b", "from_a", None]


def test_cast_int8_as_char(spark):
    df = spark.createDataFrame([(65,), (97,)], "c int")
    got = [r.ch for r in df.select(cast_int8_as_char("c").alias("ch")).collect()]
    assert got == ["A", "a"]


def test_map_lookup(spark):
    df = spark.createDataFrame([("P01",), ("XXX",)], "code string")
    got = [r.mapped for r in df.select(
        map_lookup({"P01": "TEMP", "P02": "PSAL"}, "code").alias("mapped")).collect()]
    assert got == ["TEMP", None]


def test_beacon_version_sql(spark):
    from beacon_spark.functions.core import register_functions
    from beacon_spark.version import VERSION

    register_functions(spark)
    assert spark.sql("SELECT beacon_version() v").collect()[0].v == VERSION


def test_summarize_contract(spark):
    from beacon_spark.operators.summarize import summarize

    df = spark.createDataFrame(
        [(10.0, 0, "A"), (20.0, 50, "B"), (30.0, 100, None), (None, 100, "B")],
        "temperature double, depth int, platform string",
    )
    out = {r.column_name: r for r in summarize(df).collect()}
    t = out["temperature"]
    assert (t.min, t.max, t["distinct"], t["count"]) == ("10.0", "30.0", 3, 3)
    assert t.null_percentage == 25.0
    p = out["platform"]
    assert p.avg is None and p.std is None and p.distinct == 2
    # source column order preserved
    assert [r.column_name for r in summarize(df).collect()] == [
        "temperature", "depth", "platform"]

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


class TestDataFusionCompat:
    """DataFusion names from the reference's function-reference.md that
    Spark spells differently (functions/compat.py); values pinned, the
    integer pair cross-checked against DuckDB where it shares them."""

    def _one(self, spark, expr):
        from beacon_spark.functions.core import register_functions

        register_functions(spark)
        return spark.sql(f"SELECT {expr} AS x").collect()[0].x

    def test_expression_tier(self, spark):
        import datetime

        assert self._one(spark, "today()") == datetime.date.today()
        assert self._one(spark, "strpos('hello', 'l')") == 3
        assert self._one(spark, "strpos('hello', 'zz')") == 0
        assert self._one(spark, "substr_index('a.b.c', '.', 2)") == "a.b"
        assert self._one(spark, "to_hex(255)") == "ff"
        assert self._one(
            spark, "datetrunc('year', timestamp '2024-03-05 10:11:12')"
        ) == datetime.datetime(2024, 1, 1)
        assert self._one(
            spark, "to_unixtime(to_timestamp_seconds(1700000000))"
        ) == 1700000000
        assert self._one(
            spark, "to_timestamp_millis(1000)"
        ) == self._one(spark, "to_timestamp_seconds(1)")
        assert self._one(
            spark, "to_timestamp_micros(1000000)"
        ) == self._one(spark, "to_timestamp_seconds(1)")
        # nanos floor to micros, exactly, incl. pre-1970
        assert self._one(
            spark, "to_timestamp_nanos(1500)"
        ) == self._one(spark, "to_timestamp_micros(1)")
        assert self._one(
            spark, "to_timestamp_nanos(-1500)"
        ) == self._one(spark, "to_timestamp_micros(-2)")

    def test_to_local_time_strips_zone(self, spark):
        from pyspark.sql import types as T

        from beacon_spark.functions.core import register_functions

        register_functions(spark)
        df = spark.sql(
            "SELECT to_local_time(timestamp '2024-01-01 10:00:00') AS x")
        assert isinstance(df.schema["x"].dataType, T.TimestampNTZType)
        assert str(df.collect()[0].x) == "2024-01-01 10:00:00"

    def test_time_type_enabled(self, spark):
        import datetime

        assert self._one(spark, "make_time(10, 11, 12)") == \
            datetime.time(10, 11, 12)
        assert self._one(spark, "to_time('23:59:01')") == \
            datetime.time(23, 59, 1)

    def test_regexp_match_postgres_semantics(self, spark):
        # no capture groups -> whole first match; groups -> the groups;
        # no match -> NULL
        assert self._one(spark, "regexp_match('abcd', 'b.')") == ["bc"]
        assert self._one(
            spark, r"regexp_match('k=v', '(\\w+)=(\\w+)')") == ["k", "v"]
        assert self._one(spark, "regexp_match('abc', 'z')") is None

    def test_regexp_match_optional_flags(self, spark):
        # DataFusion signature: regexp_match(str, regexp[, flags])
        assert self._one(spark, "regexp_match('ABC', 'abc')") is None
        assert self._one(spark, "regexp_match('ABC', 'abc', 'i')") == ["ABC"]
        assert self._one(
            spark, r"regexp_match('a\nxb', '^xb', 'm')") == ["xb"]
        import pytest as _p

        with _p.raises(Exception, match="unsupported flag"):
            self._one(spark, "regexp_match('a', 'a', 'q')")

    def test_gcd_lcm(self, spark):
        import duckdb

        from beacon_spark.functions.core import register_functions

        register_functions(spark)
        cases = [(12, 8), (0, 5), (-12, 18), (270, 192)]
        for a, b in cases:
            want_g = duckdb.sql(f"SELECT gcd({a}, {b})").fetchone()[0]
            want_l = duckdb.sql(f"SELECT lcm({a}, {b})").fetchone()[0]
            got = spark.sql(
                f"SELECT gcd({a}, {b}) AS g, lcm({a}, {b}) AS l"
            ).collect()[0]
            assert (got.g, got.l) == (want_g, want_l), (a, b)
        assert self._one(spark, "gcd(NULL, 3)") is None


def test_time_type_conf_does_not_change_non_time_plans(spark, sf_dir):
    """register_compat_functions flips spark.sql.timeType.enabled
    session-wide to unlock TIME (the reference serves Time64). Pin that
    a representative NON-TIME statement — casts, timestamps, strings,
    numerics — plans AND evaluates identically with the flag on vs off,
    so a Spark upgrade can't silently change semantics for every other
    query in the session (VERDICT r8 'what's wrong' #2)."""
    stmt = f"""
        SELECT o_orderstatus,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price,
               CAST(o_orderdate AS TIMESTAMP) AS ts,
               date_trunc('month', o_orderdate) AS mon,
               CAST(o_orderkey AS STRING) AS k
        FROM parquet.`{sf_dir}/orders.parquet`
        ORDER BY o_orderkey LIMIT 50
    """
    prev = spark.conf.get("spark.sql.timeType.enabled", None)
    try:
        spark.conf.set("spark.sql.timeType.enabled", "false")
        df_off = spark.sql(stmt)
        plan_off = df_off._jdf.queryExecution().executedPlan().toString()
        rows_off = df_off.collect()
        schema_off = df_off.schema
        spark.conf.set("spark.sql.timeType.enabled", "true")
        df_on = spark.sql(stmt)
        plan_on = df_on._jdf.queryExecution().executedPlan().toString()
        assert df_on.schema == schema_off
        assert df_on.collect() == rows_off
        # physical plans match modulo auto-generated ids
        import re as _re

        def _scrub(p):
            return _re.sub(r"#\d+", "#x", _re.sub(r"plan_id=\d+", "", p))

        assert _scrub(plan_on) == _scrub(plan_off)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.timeType.enabled")
        else:
            spark.conf.set("spark.sql.timeType.enabled", prev)


def test_datafusion_builtin_overrides(spark):
    """r9: the residual DataFusion-name gaps from the reference's
    function-reference.md — iszero, binary encode/decode, chrono-pattern
    to_char/date_format, occurrence-based regexp_instr, flagged
    regexp_like. Same-named Spark builtins carry DIFFERENT contracts
    (charset encode, Java-pattern date_format, group-index
    regexp_instr), so the compat tier overrides them; DuckDB
    cross-checks where it shares the semantics."""
    import duckdb

    from beacon_spark.functions.core import register_functions

    register_functions(spark)

    def one(expr):
        return spark.sql(f"SELECT {expr} AS v").collect()[0].v

    assert one("iszero(0.0)") is True
    assert one("iszero(-0.0)") is True
    assert one("iszero(double('nan'))") is False
    assert one("iszero(CAST(NULL AS DOUBLE))") is None

    assert one("encode(X'6869', 'hex')") == "6869"
    assert one("encode('hi', 'base64')") == "aGk="
    assert one("encode(X'5C0A41', 'escape')") == "\\\\\\012A"
    assert bytes(one("decode('6869', 'hex')")) == b"hi"
    assert bytes(one("decode('aGk=', 'base64')")) == b"hi"
    assert bytes(one(r"decode('\\\\\\012A', 'escape')")) == b"\\\nA"

    # chrono/strftime patterns — DuckDB's strftime is the oracle
    for fmt in ("%Y-%m-%d", "%d/%m/%Y %H:%M:%S", "%B %Y", "%j"):
        want = duckdb.sql(
            f"SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '{fmt}')"
        ).fetchone()[0]
        assert one(
            f"to_char(TIMESTAMP '2024-03-05 07:08:09', '{fmt}')") == want
        assert one(
            f"date_format(TIMESTAMP '2024-03-05 07:08:09', '{fmt}')") == want
    # chrono %f = 9-digit nanoseconds (python's 6-digit micro translated)
    assert one("to_char(TIMESTAMP '2024-01-01 00:00:00.123456', "
               "'%H:%M:%S%.f')") == "00:00:00.123456000"

    assert one("regexp_like('abc', 'B', 'i')") is True
    assert one("regexp_like('abc', 'B')") is False
    assert one("regexp_instr('aXbXc', 'X')") == 2
    assert one("regexp_instr('aXbXc', 'X', 3)") == 4  # search from pos 3
    assert one("regexp_instr('aXbXc', 'X', 1, 2)") == 4  # 2nd occurrence
    assert one("regexp_instr('aXbXc', 'Z')") == 0
    assert one("regexp_instr('xAB', '(A)(B)', 1, 1, '', 2)") == 3


def test_datafusion_array_function_renames(spark, sf_dir):
    """r9: DataFusion's array functions are polymorphic, so they rename
    at macro time (engine._rewrite_macros) onto Spark's spellings:
    array_length/size, array_has/array_contains, array_element +
    list_extract/try_element_at (NULL out of bounds — Spark 4's
    ANSI-default element_at would error), array_dims,
    generate_series/sequence, array_to_string/array_join,
    array_concat/concat, string_to_array (literal delimiter, optional
    NULL mapping), arrow_typeof via typeof + an Arrow-name map.
    range() is deliberately NOT renamed — Spark's range() table
    function owns the name in FROM position."""
    from beacon_spark.engine import Engine

    eng = Engine(spark, datasets_root=sf_dir)

    def one(expr):
        return eng.sql(f"SELECT {expr} AS v").collect()[0].v

    assert one("array_length(array(1,2,3))") == 3
    assert one("array_length(array(1,2), 2)") is None
    assert one("array_has(array(1,2), 1)") is True
    assert one("array_element(array(10,20), 2)") == 20
    assert one("array_element(array(10,20), 9)") is None
    assert one("list_extract(array('x','y'), 1)") == "x"
    assert one("array_dims(array(1,2))") == [2]
    assert one("generate_series(1, 3)") == [1, 2, 3]
    assert one("generate_series(0, 4, 2)") == [0, 2, 4]
    assert one("array_to_string(array('a','b'), '-')") == "a-b"
    assert one("string_to_array('a.b', '.')") == ["a", "b"]  # literal dot
    assert one("string_to_array('a-b-x', '-', 'x')") == ["a", "b", None]
    assert one("array_concat(array(1), array(2,3))") == [1, 2, 3]
    assert one("arrow_typeof(CAST(1 AS BIGINT))") == "Int64"
    assert one("arrow_typeof(CAST(1 AS DECIMAL(10,2)))") == "Decimal128(10,2)"
    # Spark's range() table function is untouched
    assert eng.sql("SELECT count(*) AS n FROM range(5)").collect()[0].n == 5

"""JSON DSL compiler tests — ports of the reference's serde/compile tests
(beacon-core/src/query/filter/mod.rs:124-338, query/mod.rs:243-365)."""

import pytest
from pyspark.sql import functions as F

from beacon_spark import Engine
from beacon_spark.dsl import DslError, compile_filter


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        [(0, 12.5, "argo"), (50, 13.5, None), (100, None, "buoy")],
        "depth int, temperature double, platform string",
    )
    df.createOrReplaceTempView("obs")
    return Engine(spark, default_table="obs")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---- filter leaf semantics (filter/mod.rs tests) ----


def test_comparison_variants_by_field_name(eng):
    for op, expect in [
        ("eq", [0]), ("neq", [50, 100]), ("gt", [50, 100]),
        ("gt_eq", [0, 50, 100]), ("lt", []), ("lt_eq", [0]),
    ]:
        got = rows(eng.query({"select": ["depth"], "filter": {"column": "depth", op: 0}}))
        assert [r[0] for r in got] == expect, op


def test_gteq_plus_lteq_is_between(eng):
    got = rows(eng.query({"select": ["depth"],
                          "filter": {"column": "depth", "gt_eq": 0, "lt_eq": 60}}))
    assert [r[0] for r in got] == [0, 50]


def test_legacy_aliases(eng):
    modern = rows(eng.query({"select": ["depth"],
                             "filter": {"column": "depth", "gt_eq": 0, "lt_eq": 60}}))
    legacy = rows(eng.query({"select": ["depth"],
                             "filter": {"for_query_parameter": "depth", "min": 0, "max": 60}}))
    assert modern == legacy
    for alias in ("is_not_null", "skip_fill_values", "skip_missing"):
        got = rows(eng.query({"select": ["platform"], "filter": {alias: {"column": "platform"}}}))
        assert len(got) == 2, alias


def test_fractional_literal_truncates_into_integer_column(eng):
    # depth >= 49.5 compiles to depth >= 49 (pinned lossy semantics)
    got = rows(eng.query({"select": ["depth"], "filter": {"column": "depth", "gt_eq": 49.5}}))
    assert [r[0] for r in got] == [50, 100]


def test_string_values_select_string_variant(eng):
    got = rows(eng.query({"select": ["platform"],
                          "filter": {"column": "platform", "eq": "argo"}}))
    assert got == [("argo",)]


def test_empty_combinators_fold_to_identity(eng):
    assert len(rows(eng.query({"select": ["depth"], "filter": {"and": []}}))) == 3
    assert len(rows(eng.query({"select": ["depth"], "filter": {"or": []}}))) == 0


def test_nested_combinators(eng):
    got = rows(eng.query({
        "select": ["depth"],
        "filter": {"and": [{"column": "depth", "gt": 0},
                           {"or": [{"is_null": {"column": "platform"}}]}]},
    }))
    assert [r[0] for r in got] == [50]


def test_null_comparison_rejected(eng):
    with pytest.raises(DslError):
        eng.query({"select": ["depth"], "filter": {"column": "depth", "eq": None}})


def test_is_null_variant(eng):
    got = rows(eng.query({"select": ["depth"], "filter": {"is_null": {"column": "platform"}}}))
    assert [r[0] for r in got] == [50]


def test_number_coercion_keeps_pushdown_type(spark):
    # coerced literal stays integer-typed in the plan (no cast of the column)
    schema = spark.createDataFrame([(1,)], "depth int").schema
    expr = compile_filter({"column": "depth", "eq": 3}, schema)
    assert "CAST(depth" not in str(expr._jc)


def test_timestamp_string_becomes_timestamp_literal(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    df.createOrReplaceTempView("tsv")
    eng = Engine(spark, default_table="tsv")
    got = rows(eng.query({"select": ["ts"], "filter": {"column": "ts", "eq": "2024-01-01T00:00:00"}}))
    assert len(got) == 1


# ---- select shapes (query/mod.rs tests) ----


def test_select_shapes(eng):
    df = eng.query({"select": [
        "depth",
        {"column": "depth", "alias": "d2"},
        {"function": "abs", "args": ["depth"], "alias": "fn"},
        {"value": 7, "alias": "lit7"},
    ]})
    assert df.columns == ["depth", "d2", "fn", "lit7"]


def test_query_parameters_alias(eng):
    df = eng.query({"query_parameters": ["depth"]})
    assert df.columns == ["depth"]


def test_sort_nulls_last_both_directions(eng):
    asc = [r[0] for r in eng.query(
        {"select": ["temperature"], "sort_by": [{"asc": "temperature"}]}).collect()]
    desc = [r[0] for r in eng.query(
        {"select": ["temperature"], "sort_by": [{"desc": "temperature"}]}).collect()]
    assert asc == [12.5, 13.5, None]
    assert desc == [13.5, 12.5, None]


def test_offset_limit(eng):
    got = eng.query({"select": ["depth"], "sort_by": [{"asc": "depth"}],
                     "offset": 1, "limit": 1}).collect()
    assert [r[0] for r in got] == [50]


def test_distinct_on(eng):
    df = eng.query({
        "select": ["platform", "depth"],
        "distinct": {"on": [{"function": "coalesce", "args": ["platform", {"value": "?"}]}],
                     "select": ["platform"]},
    })
    assert df.count() == 3


def test_sql_and_json_same_result(eng, spark):
    """DSL-vs-SQL equivalence (integration-tests/test_queries_parquet.py:31)."""
    a = rows(eng.query({"select": ["depth", "temperature"],
                        "filter": {"column": "depth", "gt_eq": 0, "lt_eq": 60},
                        "sort_by": [{"asc": "depth"}]}))
    b = rows(spark.sql(
        "SELECT depth, temperature FROM obs WHERE depth BETWEEN 0 AND 60 ORDER BY depth"))
    assert a == b


# ---- round-8 review regressions ----


def test_distinct_on_sort_picks_and_orders(spark):
    """sort_by feeds the distinct: the kept row per group is the
    sort-first row, and the output keeps that order (a deterministic
    refinement of the reference's arbitrary-row distinct_on)."""
    spark.createDataFrame(
        [("a", 1), ("a", 9), ("b", 5), ("b", 2)], "k string, v int"
    ).createOrReplaceTempView("dsv")
    eng = Engine(spark, default_table="dsv")
    got = eng.query({
        "select": ["k", "v"],
        "sort_by": [{"desc": "v"}],
        "distinct": {"on": ["k"], "select": ["k", "v"]},
        "limit": 2,
    }).collect()
    assert [tuple(r) for r in got] == [("a", 9), ("b", 5)]


def test_distinct_on_preserves_user_rn_column(spark):
    """A user column literally named __rn must survive intact (the
    window's row-number lives on an internal unique name)."""
    spark.createDataFrame(
        [(1, 100), (1, 50), (2, 300)], "k int, __rn int"
    ).createOrReplaceTempView("drn")
    eng = Engine(spark, default_table="drn")
    got = eng.query({
        "select": ["k", "__rn"],
        "sort_by": [{"desc": "__rn"}],
        "distinct": {"on": ["k"], "select": ["k", "__rn"]},
    }).collect()
    assert sorted(tuple(r) for r in got) == [(1, 100), (2, 300)]


def test_distinct_on_alias_shadowing_select_column(spark):
    """An ON expression aliased to the same name as a select column must
    not raise AMBIGUOUS_REFERENCE (positional internal names)."""
    spark.createDataFrame(
        [("x", 1), ("X", 2), ("y", 3)], "b string, a int"
    ).createOrReplaceTempView("damb")
    eng = Engine(spark, default_table="damb")
    got = eng.query({
        "select": ["b", "a"],
        "distinct": {"on": [{"function": "upper", "args": ["b"], "alias": "b"}],
                     "select": ["b", "a"]},
    })
    assert got.columns == ["b", "a"]
    assert got.count() == 2  # upper(b) has two distinct values


def test_offset_accepts_json_float(eng):
    got = eng.query({"select": ["depth"], "sort_by": [{"asc": "depth"}],
                     "offset": 1.0, "limit": 1}).collect()
    assert [r[0] for r in got] == [50]


def test_geometry_missing_latitude_is_dsl_error(eng):
    with pytest.raises(DslError, match="latitude_column"):
        eng.query({"select": ["depth"], "filter": {
            "geometry": {"type": "Point", "coordinates": [0, 0]},
            "longitude_column": "depth"}}).collect()


def test_null_checks_reject_string_payload(eng):
    with pytest.raises(DslError, match="is_not_null"):
        eng.query({"select": ["depth"],
                   "filter": {"is_not_null": "depth"}}).collect()


def test_filter_coercion_reaches_through_projection(spark, sf_small):
    """Literal coercion must see the SOURCE column's type even when the
    select list drops the filtered column: `eq: 1.5` on an int column
    truncates to `= 1` (the pinned reference semantics) whether or not
    the column is projected. It silently stopped truncating for
    unselected columns — found by the DSL↔SQL↔DuckDB differential."""
    from beacon_spark.engine import Engine

    eng = Engine(spark, datasets_root=sf_small)
    selected = eng.query({
        "select": ["o_orderkey", "o_custkey"],
        "from": {"parquet": {"paths": ["orders.parquet"]}},
        "filter": {"column": "o_custkey", "eq": 1.5},
    }).count()
    unselected = eng.query({
        "select": ["o_orderkey"],
        "from": {"parquet": {"paths": ["orders.parquet"]}},
        "filter": {"column": "o_custkey", "eq": 1.5},
    }).count()
    assert selected == unselected
    assert selected > 0  # truncated to = 1, which has rows at sf0.001


def test_hostile_bodies_fail_as_dsl_errors(spark, sf_small):
    """Malformed query bodies must fail with DslError/ValueError (clean
    400s on the transports), never raw TypeErrors from deep inside the
    compiler — shapes found by fuzzing the query surface."""
    from beacon_spark.dsl import DslError
    from beacon_spark.engine import Engine

    eng = Engine(spark, datasets_root=sf_small)
    frm = {"parquet": {"paths": ["orders.parquet"]}}
    shapes = [
        {"select": True, "from": frm},
        {"select": 1, "from": frm},
        {"select": ["o_orderkey"], "filters": {}, "from": frm},
        {"select": ["o_orderkey"], "sort_by": {"asc": 1}, "from": frm},
        {"select": ["o_orderkey"], "sort_by": [{"asc": []}], "from": frm},
        {"select": ["o_orderkey"], "distinct": True, "from": frm},
        {"select": ["o_orderkey"], "distinct": {"on": 1}, "from": frm},
        {"select": ["o_orderkey"], "limit": [], "from": frm},
        {"select": ["o_orderkey"], "offset": {}, "from": frm},
        {"select": [{"column": [1]}], "from": frm},
        {"select": [{"function": 1}], "from": frm},
        {"select": [{"function": "upper", "args": 1}], "from": frm},
        {"select": [{"value": {"a": 1}, "alias": "v"}], "from": frm},
        {"select": ["o_orderkey"], "from": {"a": {}, "b": {}}},
    ]
    for body in shapes:
        with pytest.raises((DslError, ValueError)):
            eng.query(dict(body))


def test_limit_offset_validated_in_gate(spark, sf_small):
    """limit/offset are converted INSIDE the shape gate: "abc" must be a
    DslError (not a raw ValueError from a later int()), 10.7 must error
    (int() would silently truncate), bools and negatives are rejected,
    and integral floats (JSON 10.0) are accepted."""
    from beacon_spark.dsl import DslError
    from beacon_spark.engine import Engine

    eng = Engine(spark, datasets_root=sf_small)
    frm = {"parquet": {"paths": ["orders.parquet"]}}
    for bad in ("abc", "10", 10.7, True, -1, -0.5):
        for key in ("limit", "offset"):
            with pytest.raises(DslError):
                eng.query({"select": ["o_orderkey"], key: bad, "from": frm})
    assert eng.query(
        {"select": ["o_orderkey"], "limit": 3.0, "from": frm}
    ).count() == 3
    assert eng.query(
        {"select": ["o_orderkey"], "limit": 2, "offset": 1.0, "from": frm}
    ).count() == 2

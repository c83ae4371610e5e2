"""File-statistics index + pruning tests (beacon-file-stats analogs:
footer-only collection, fail-open pruning, ANALYZE FILES, incremental)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from beacon_spark import Engine
from beacon_spark.stats import (
    analyze_files,
    extract_value_ranges,
    index_path,
    prune_files,
)


@pytest.fixture()
def lake(tmp_path):
    root = str(tmp_path)
    # three files with disjoint value ranges of x
    for i, (lo, hi) in enumerate([(0, 9), (10, 19), (20, 29)]):
        pq.write_table(
            pa.table({"x": pa.array(range(lo, hi + 1)), "y": pa.array([float(i)] * 10)}),
            f"{root}/f{i}.parquet",
        )
    return root


def test_analyze_and_prune(lake):
    n = analyze_files(lake)
    assert n == 3
    files = [f"{lake}/f{i}.parquet" for i in range(3)]
    kept = prune_files(lake, files, {"x": (12.0, 15.0)})
    assert kept == [f"{lake}/f1.parquet"]
    # upper-bounded only
    assert prune_files(lake, files, {"x": (None, 5.0)}) == [f"{lake}/f0.parquet"]
    # fail-open: unknown file kept
    extra = files + [f"{lake}/ghost.parquet"]
    assert f"{lake}/ghost.parquet" in prune_files(lake, extra, {"x": (0.0, 1.0)})


def test_analyze_incremental(lake):
    assert analyze_files(lake) == 3
    assert analyze_files(lake) == 0  # nothing changed
    pq.write_table(pa.table({"x": pa.array([100])}), f"{lake}/f3.parquet")
    assert analyze_files(lake) == 1
    assert analyze_files(lake, force=True) == 4


def test_extract_value_ranges():
    f = {"and": [
        {"column": "x", "gt_eq": 10, "lt_eq": 20},
        {"column": "y", "gt": 5},
        {"column": "z", "eq": 3},
        {"or": [{"column": "q", "eq": 1}]},          # OR ignored (fail-open)
        {"column": "s", "eq": "text"},               # non-numeric ignored
    ]}
    r = extract_value_ranges(f)
    assert r["x"] == (10.0, 20.0)
    assert r["y"] == (5.0, None)
    assert r["z"] == (3.0, 3.0)
    assert "q" not in r and "s" not in r


def test_sql_analyze_and_pruned_query(spark, lake):
    eng = Engine(spark, datasets_root=lake)
    out = eng.sql("ANALYZE FILES").collect()
    assert out[0].files_analyzed == 3
    assert os.path.exists(index_path(lake))

    # DSL query with a range filter: result correctness unaffected by pruning
    got = eng.query({
        "select": ["x", "y"],
        "filter": {"column": "x", "gt_eq": 12, "lt_eq": 15},
        "from": {"parquet": {"paths": ["*.parquet"]}},
        "sort_by": [{"asc": "x"}],
    })
    assert [r.x for r in got.collect()] == [12, 13, 14, 15]
    # an impossible range prunes everything but keeps the schema
    empty = eng.query({
        "select": ["x"],
        "filter": {"column": "x", "gt_eq": 1000},
        "from": {"parquet": {"paths": ["*.parquet"]}},
    })
    assert empty.count() == 0 and empty.columns == ["x"]

    stats = eng.view_statistics()
    assert stats.filter("column = 'x'").count() == 3


def test_prune_respects_select_alias_shadowing(spark, lake):
    """A select alias that shadows a DIFFERENT source column must not
    prune against that source's stats: the filter applies post-projection,
    so `x AS y` + filter on y constrains source x, not source y."""
    eng = Engine(spark, datasets_root=lake)
    eng.sql("ANALYZE FILES").collect()
    got = eng.query({
        "select": [{"column": "x", "alias": "y"}],
        "filter": {"column": "y", "gt_eq": 25},
        "from": {"parquet": {"paths": ["*.parquet"]}},
        "sort_by": [{"asc": "y"}],
    })
    # source y's stats max out at 2.0 — pruning on them would empty the
    # result; the correct translation prunes on x (keeps only f2)
    assert [r.y for r in got.collect()] == [25, 26, 27, 28, 29]
    assert [f.rsplit("/", 1)[-1] for f in got.inputFiles()] == ["f2.parquet"]


def test_prune_fractional_bound_is_conservative(spark, lake):
    """`gt_eq: 9.4` executes as x >= 9 on an integer column (pinned
    truncation), so the prune bound must floor to 9 — a file whose max
    is exactly 9 still holds matching rows."""
    eng = Engine(spark, datasets_root=lake)
    eng.sql("ANALYZE FILES").collect()
    got = eng.query({
        "select": ["x"],
        "filter": {"column": "x", "gt_eq": 9.4, "lt_eq": 10.6},
        "from": {"parquet": {"paths": ["*.parquet"]}},
        "sort_by": [{"asc": "x"}],
    })
    assert [r.x for r in got.collect()] == [9, 10]
    # widened range [9, 11] keeps f0 (max 9) and f1 (min 10), drops f2
    assert sorted(f.rsplit("/", 1)[-1] for f in got.inputFiles()) == [
        "f0.parquet", "f1.parquet"]


def test_prune_covers_legacy_filters_list(spark, lake):
    """The legacy flat `filters` list drives file pruning like `filter`."""
    eng = Engine(spark, datasets_root=lake)
    eng.sql("ANALYZE FILES").collect()
    got = eng.query({
        "select": ["x"],
        "filters": [{"column": "x", "gt_eq": 12, "lt_eq": 15}],
        "from": {"parquet": {"paths": ["*.parquet"]}},
    })
    assert [f.rsplit("/", 1)[-1] for f in got.inputFiles()] == ["f1.parquet"]
    assert got.count() == 4


def test_extract_value_ranges_widens_fractional_bounds():
    r = extract_value_ranges({"and": [
        {"column": "a", "gt_eq": 10.4, "lt_eq": 20.6},
        {"column": "b", "eq": 3.5},
        {"column": "c", "gt": -10.4},
    ]})
    assert r["a"] == (10.0, 21.0)
    assert r["b"] == (3.0, 4.0)
    assert r["c"] == (-11.0, None)


def test_prune_filter_on_nonselected_column(spark, lake):
    """A filter column no select output claims resolves against the
    source (Spark lets filters reach through the projection), so it
    still prunes as itself."""
    eng = Engine(spark, datasets_root=lake)
    eng.sql("ANALYZE FILES").collect()
    got = eng.query({
        "select": ["y"],
        "filter": {"column": "x", "gt_eq": 12, "lt_eq": 15},
        "from": {"parquet": {"paths": ["*.parquet"]}},
    })
    assert [f.rsplit("/", 1)[-1] for f in got.inputFiles()] == ["f1.parquet"]
    assert got.count() == 4


def test_prune_intersects_two_outputs_of_one_source(spark, lake):
    """Two select outputs passing through one source column intersect
    their range constraints (AND), keeping full pruning power."""
    eng = Engine(spark, datasets_root=lake)
    eng.sql("ANALYZE FILES").collect()
    got = eng.query({
        "select": ["x", {"column": "x", "alias": "x2"}],
        "filter": {"and": [{"column": "x", "gt_eq": 10},
                           {"column": "x2", "lt_eq": 15}]},
        "from": {"parquet": {"paths": ["*.parquet"]}},
    })
    assert [f.rsplit("/", 1)[-1] for f in got.inputFiles()] == ["f1.parquet"]
    assert got.count() == 6


def test_view_dataset_statistics_with_path(spark, tmp_path):
    """r9: view_dataset_statistics('<path>') — per-column stats of one
    file (table-functions-utility.md:70-89): cached rows when ANALYZE
    ran, computed on demand from the footer otherwise."""
    from beacon_spark.engine import Engine

    root = tmp_path / "vds"
    root.mkdir()
    spark.range(10).selectExpr(
        "id AS a", "CAST(id * 2.5 AS DOUBLE) AS b"
    ).coalesce(1).write.parquet(str(root / "t.parquet"))
    eng = Engine(spark, datasets_root=str(root))
    # no ANALYZE yet -> computed on demand
    rows = {r.column_name: r for r in eng.sql(
        "SELECT * FROM view_dataset_statistics('t.parquet')").collect()}
    assert rows["a"].min_value == "0" and rows["a"].max_value == "9"
    assert rows["a"].data_type == "bigint" and rows["a"].is_exact
    assert rows["b"].data_type == "double"
    assert float(rows["b"].max_value) == 22.5
    # after ANALYZE the cached path answers identically
    eng.sql("ANALYZE FILES")
    rows2 = {r.column_name: (r.min_value, r.max_value) for r in eng.sql(
        "SELECT * FROM view_dataset_statistics('t.parquet')").collect()}
    assert rows2 == {
        k: (v.min_value, v.max_value) for k, v in rows.items()}


def test_view_dataset_statistics_nonparquet_on_demand(spark, tmp_path):
    """A non-parquet file computes stats through its reader (one
    aggregate scan) — exact, with the flattened nd columns."""
    import numpy as np

    from beacon_spark.engine import Engine
    from beacon_spark.sources.zarrlite import write_zarr_store

    root = tmp_path / "vdz"
    root.mkdir()
    write_zarr_store(
        str(root / "g.zarr"),
        {"t": (("t",), np.arange(5.0)),
         "v": (("t",), np.arange(5.0) * 10)},
        version=2, codec=None,
    )
    eng = Engine(spark, datasets_root=str(root))
    rows = {r.column_name: r for r in eng.sql(
        "SELECT * FROM view_dataset_statistics('g.zarr')").collect()}
    assert float(rows["v"].min_value) == 0.0
    assert float(rows["v"].max_value) == 40.0
    assert rows["t"].is_exact


def test_view_external_table_statistics(spark, tmp_path):
    """r9: view_external_table_statistics('<t>') — cache coverage per
    file; uncached files appear once with cached=false (the doc's
    'find files with no cached statistics' shape)."""
    from beacon_spark.engine import Engine

    root = tmp_path / "vets"
    root.mkdir()
    spark.range(5).selectExpr("id AS x").coalesce(1).write.parquet(
        str(root / "f1.parquet"))
    eng = Engine(spark, datasets_root=str(root))
    eng.sql("CREATE EXTERNAL TABLE et STORED AS PARQUET "
            "LOCATION 'f1.parquet'")
    eng.sql("ANALYZE FILES")
    # add a SECOND file after the analyze -> it has no cached stats
    spark.range(5).selectExpr("id AS x").coalesce(1).write.parquet(
        str(root / "f2.parquet"))
    eng2 = Engine(spark, datasets_root=str(root))
    eng2.sql("DROP TABLE et")
    eng2.sql("CREATE EXTERNAL TABLE et STORED AS PARQUET "
             "LOCATION '*.parquet'")
    out = eng2.sql(
        "SELECT * FROM view_external_table_statistics('et')").collect()
    cached = {r.path for r in out if r.cached}
    uncached = [r for r in out if not r.cached]
    assert any("f1.parquet" in p for p in cached)
    assert len(uncached) == 1 and "f2.parquet" in uncached[0].path
    assert uncached[0].column_name is None
    assert all(r.file_size > 0 for r in out)
    x_rows = [r for r in out if r.column_name == "x"]
    assert x_rows and all(
        r.min_value == "0" and r.max_value == "4" for r in x_rows)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown external table"):
        eng2.sql("SELECT * FROM view_external_table_statistics('ghost')")


def test_string_columns_never_numeric_pruned(tmp_path):
    """r10 sweep: parquet string stats are LEXICAL min/max — in a file
    holding '9' and '10' the lexical interval is ['10','9']; float()ing
    it gave (10.0, 9.0) and a numeric WHERE col >= 9.5 falsely pruned
    the file even though row '10' matches. String stats now carry no
    numeric interval (fail-open)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beacon_spark.stats import analyze_files, prune_files

    root = str(tmp_path)
    f = f"{root}/s.parquet"
    pq.write_table(pa.table({"v": ["9", "10"]}), f)
    analyze_files(root)
    kept = prune_files(root, [f], {"v": (9.5, None)})
    assert kept == [f]


def test_dataset_statistics_recomputes_after_rewrite(spark, tmp_path):
    """r10 sweep: view_dataset_statistics served stale cache rows as
    is_exact=true after the file was rewritten; an mtime mismatch now
    recomputes from the footer."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from beacon_spark import Engine
    from beacon_spark.stats import analyze_files, dataset_statistics_df

    root = str(tmp_path)
    f = f"{root}/d.parquet"
    pq.write_table(pa.table({"x": [1, 2, 3]}), f)
    analyze_files(root)
    time.sleep(0.01)
    pq.write_table(pa.table({"x": [100, 200]}), f)
    os.utime(f)  # ensure mtime moves even on coarse filesystems
    eng = Engine(spark, datasets_root=root)
    rows = {r.column_name: (r.min_value, r.max_value)
            for r in dataset_statistics_df(spark, eng, "d.parquet").collect()}
    assert rows["x"] == ("100", "200")


def test_decimal_columns_keep_numeric_stats(tmp_path):
    """r10 review: the string-stats fix over-rejected decimal.Decimal
    (parquet DECIMAL stats) — decimals are genuinely numeric and must
    keep their pruning interval."""
    from decimal import Decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from beacon_spark.stats import analyze_files, prune_files

    root = str(tmp_path)
    f = f"{root}/dec.parquet"
    pq.write_table(pa.table({"p": pa.array(
        [Decimal("10.50"), Decimal("20.25")], pa.decimal128(10, 2))}), f)
    analyze_files(root)
    # disjoint range prunes; overlapping range keeps
    assert prune_files(root, [f], {"p": (100.0, None)}) == []
    assert prune_files(root, [f], {"p": (15.0, None)}) == [f]


def test_timestamp_stats_are_utc_not_driver_local():
    """Parquet stats return NAIVE datetimes holding UTC wall time; the
    numeric interval must read them as UTC — a bare .timestamp() on a
    non-UTC driver skewed every timestamp interval by the UTC offset."""
    import datetime as dt
    import os
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from beacon_spark.stats import _file_stats

    ts = dt.datetime(2024, 6, 1, 12, 0, 0)  # naive = UTC wall time
    t = pa.table({"t": pa.array([ts], pa.timestamp("us"))})
    with tempfile.TemporaryDirectory() as td:
        f = os.path.join(td, "x.parquet")
        pq.write_table(t, f)
        old_tz = os.environ.get("TZ")
        os.environ["TZ"] = "America/New_York"  # UTC-4/-5
        time.tzset()
        try:
            rows = {r["column"]: r for r in _file_stats(f)}
        finally:
            if old_tz is None:
                os.environ.pop("TZ", None)
            else:
                os.environ["TZ"] = old_tz
            time.tzset()
    want = ts.replace(tzinfo=dt.timezone.utc).timestamp()
    assert rows["t"]["min_num"] == want
    assert rows["t"]["max_num"] == want

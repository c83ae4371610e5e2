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

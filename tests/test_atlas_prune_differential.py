"""Atlas dataset-pruning differential: pruned scans vs numpy truth.

Atlas stores prune whole DATASETS by per-array min/max stats before
any array byte is read (atlaslite.prune_datasets — the format's
headline capability). A false prune silently loses every row of a
dataset; this property net fires random time/temp windows through BOTH
the DSL (stats pruning in resolve_from) and the SQL surface (stats
pruning inside the DataSource's partitions()) and compares against an
independently-built pandas truth table evaluated by DuckDB.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from beacon_spark.engine import Engine

# three datasets with adjacent/overlapping time ranges so random
# windows prune 0, 1, 2 or all of them
_SPECS = {
    "a": (np.arange(0.0, 12.0), np.arange(10.0, 22.0)),
    "b": (np.arange(10.0, 24.0), np.arange(20.0, 34.0)),
    "c": (np.arange(50.0, 60.0), np.arange(-5.0, 5.0)),
}


@pytest.fixture(scope="module")
def atlas_world(spark, tmp_path_factory):
    import pandas as pd

    from beacon_spark.sources.atlaslite import write_atlas_store

    root = tmp_path_factory.mktemp("atlas-prune")
    write_atlas_store(
        str(root / "obs.atlas"),
        {
            name: {"variables": {"time": (("t",), t), "temp": (("t",), v)}}
            for name, (t, v) in _SPECS.items()
        },
    )
    truth = pd.concat([
        pd.DataFrame({"time": t, "temp": v}) for t, v in _SPECS.values()
    ], ignore_index=True)
    truth_pq = str(root / "truth.parquet")
    truth.to_parquet(truth_pq)
    return Engine(spark, datasets_root=str(root)), truth_pq


_VALS = st.floats(min_value=-10.0, max_value=70.0, allow_nan=False)


@st.composite
def atlas_windows(draw):
    parts = []
    for col, pool in (("time", _VALS), ("temp", _VALS)):
        for _ in range(draw(st.integers(0, 2))):
            op = draw(st.sampled_from([">", ">=", "<", "<=", "="]))
            parts.append((col, op, float(draw(pool))))
    if not parts:
        parts = [("time", ">=", 0.0)]
    return parts


_DSL_OP = {">": "gt", ">=": "gt_eq", "<": "lt", "<=": "lt_eq", "=": "eq"}


@settings(max_examples=12, deadline=None)
@given(window=atlas_windows())
def test_atlas_pruned_scans_match_truth(atlas_world, window):
    eng, truth_pq = atlas_world
    where = " AND ".join(f"{c} {op} {v!r}" for c, op, v in window)
    flt = {"and": [{"column": c, _DSL_OP[op]: v} for c, op, v in window]}
    con = duckdb.connect()
    try:
        want = sorted(tuple(r) for r in con.execute(
            f"SELECT time, temp FROM read_parquet('{truth_pq}') "
            f"WHERE {where}").fetchall())
    finally:
        con.close()
    got_sql = sorted(
        (r.time, r.temp) for r in eng.sql(
            f"SELECT time, temp FROM read_atlas('obs.atlas/atlas.json') "
            f"WHERE {where}").collect())
    assert got_sql == want, f"SQL atlas scan diverged for {where}"
    got_dsl = sorted(
        (r.time, r.temp) for r in eng.query({
            "select": ["time", "temp"],
            "from": {"atlas": {"paths": ["obs.atlas/atlas.json"]}},
            "filter": flt,
        }).collect())
    assert got_dsl == want, f"DSL atlas scan diverged for {flt!r}"

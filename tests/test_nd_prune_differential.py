"""nd chunk-pruning differential: pruned scans must equal ground truth.

The nd SQL surface pushes WHERE comparisons into NDReader.pushFilters →
coord_region, which prunes the chunk grid at plan time (strict bounds
widen to inclusive hulls; residual Spark filters restore exactness).
A pruning off-by-one would silently DROP rows at region edges — the
same silent-loss class the index-pruning differential guards. Ground
truth is built independently in numpy (the same arrays the store was
written from) and evaluated by DuckDB, never through the nd reader.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

NT, NLAT = 30, 20


@pytest.fixture(scope="module")
def nd_world(spark, tmp_path_factory):
    import duckdb
    import pandas as pd

    from beacon_spark.engine import Engine
    from beacon_spark.sources.zarrlite import write_zarr_store

    root = tmp_path_factory.mktemp("ndprune")
    store = str(root / "grid.zarr")
    t = np.arange(NT, dtype=np.float64)
    lat = np.arange(NLAT, dtype=np.float64) * 2.5 - 10.0
    temp = (t[:, None] * 100 + lat[None, :]).astype(np.float64)
    write_zarr_store(
        store,
        {
            "t": (("t",), t),
            "lat": (("lat",), lat),
            "temp": (("t", "lat"), temp),
        },
        version=2, codec=None,
        # uneven chunks: edge chunks exercise the hull arithmetic
        chunk_shapes={"temp": (7, 6), "t": (NT,), "lat": (NLAT,)},
    )
    # INDEPENDENT truth: the same arrays flattened by plain numpy
    tt, ll = np.meshgrid(t, lat, indexing="ij")
    truth = pd.DataFrame({
        "t": tt.ravel(), "lat": ll.ravel(), "temp": temp.ravel(),
    })
    truth_pq = str(root / "truth.parquet")
    truth.to_parquet(truth_pq)
    eng = Engine(spark, datasets_root=str(root))
    return eng, store, truth_pq


_T_VALS = st.one_of(st.integers(-3, 33), st.floats(
    min_value=-3.0, max_value=33.0, allow_nan=False))
_LAT_VALS = st.floats(min_value=-14.0, max_value=44.0, allow_nan=False)
_OPS = ["=", ">", ">=", "<", "<="]


@st.composite
def nd_wheres(draw):
    parts = []
    for col, pool in (("t", _T_VALS), ("lat", _LAT_VALS)):
        for _ in range(draw(st.integers(0, 2))):
            op = draw(st.sampled_from(_OPS))
            v = draw(pool)
            parts.append(f"{col} {op} {float(v)!r}")
    if draw(st.booleans()):
        # a VALUE-variable predicate: not prunable, must ride the
        # residual filter without disturbing the pruned region
        op = draw(st.sampled_from(_OPS))
        v = draw(st.integers(-100, 3100))
        parts.append(f"temp {op} {v}")
    if not parts:
        parts = ["t >= 0"]
    return " AND ".join(parts)


@settings(max_examples=15, deadline=None)
@given(where=nd_wheres())
def test_nd_sql_pruned_scan_matches_truth(nd_world, where):
    import duckdb

    eng, store, truth_pq = nd_world
    got = sorted(
        (r.t, r.lat, r.temp)
        for r in eng.sql(
            f"SELECT t, lat, temp FROM read_zarr('{store}') WHERE {where}"
        ).collect()
    )
    con = duckdb.connect()
    try:
        want = sorted(
            tuple(r) for r in con.execute(
                f"SELECT t, lat, temp FROM read_parquet('{truth_pq}') "
                f"WHERE {where}"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, f"pruned nd scan diverged for WHERE {where}"


# =====================================================================
# Same window differential over the NETCDF reader: its lazy record-
# variable striding (netcdf3.py read_region) differs from zarr's chunk
# store, so the region math gets a second, format-specific workout.
# =====================================================================


@pytest.fixture(scope="module")
def nc_world(spark, tmp_path_factory):
    import pandas as pd

    from beacon_spark.engine import Engine
    from beacon_spark.sources.netcdf3 import write_netcdf3

    root = tmp_path_factory.mktemp("ncprune")
    path = str(root / "grid.nc")
    t = np.arange(NT, dtype=np.float64)
    lat = np.arange(NLAT, dtype=np.float64) * 2.5 - 10.0
    temp = (t[:, None] * 100 + lat[None, :]).astype(np.float64)
    write_netcdf3(
        path,
        dims={"t": NT, "lat": NLAT},
        variables={
            "t": (("t",), t),
            "lat": (("lat",), lat),
            "temp": (("t", "lat"), temp),
        },
    )
    tt, ll = np.meshgrid(t, lat, indexing="ij")
    truth = pd.DataFrame({
        "t": tt.ravel(), "lat": ll.ravel(), "temp": temp.ravel(),
    })
    truth_pq = str(root / "truth.parquet")
    truth.to_parquet(truth_pq)
    return Engine(spark, datasets_root=str(root)), "grid.nc", truth_pq


@settings(max_examples=12, deadline=None)
@given(where=nd_wheres())
def test_netcdf_sql_pruned_scan_matches_truth(nc_world, where):
    import duckdb

    eng, rel, truth_pq = nc_world
    got = sorted(
        (r.t, r.lat, r.temp)
        for r in eng.sql(
            f"SELECT t, lat, temp FROM read_netcdf('{rel}') WHERE {where}"
        ).collect()
    )
    con = duckdb.connect()
    try:
        want = sorted(
            tuple(r) for r in con.execute(
                f"SELECT t, lat, temp FROM read_parquet('{truth_pq}') "
                f"WHERE {where}"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, f"pruned netcdf scan diverged for WHERE {where}"

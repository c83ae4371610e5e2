"""nd grid-flattening tests — the worked example from the reference's
arrays-to-tables.md plus CF decoding rules (cf-decoding.md)."""

import numpy as np
import pyarrow as pa

from beacon_spark.sources.nd import GridDataset, decode_cf


def sst_dataset() -> GridDataset:
    """The docs' worked example: dims time=2, lat=3, lon=4; sst on the full
    grid; coordinate vars 1-D; one var attr and one global attr."""
    return GridDataset(
        dims={"time": 2, "lat": 3, "lon": 4},
        variables={
            "time": (("time",), np.array([1704067200, 1704153600], dtype="int64")),
            "lat": (("lat",), np.array([50.0, 51.0, 52.0], dtype="float32")),
            "lon": (("lon",), np.array([-4.0, -3.0, -2.0, -1.0], dtype="float32")),
            "sst": (("time", "lat", "lon"), np.arange(24, dtype="float32").reshape(2, 3, 4)),
        },
        var_attrs={"sst": {"units": "degree_Celsius"}},
        global_attrs={"title": "Demo SST"},
    )


def test_grid_is_largest_variable():
    assert sst_dataset().grid() == ("time", "lat", "lon")


def test_row_count_is_grid_product():
    assert sst_dataset().row_count() == 24


def test_flatten_broadcast_rule():
    t = sst_dataset().flatten()
    assert t.num_rows == 24
    # row 0: first of everything; row 4 (docs example row 5): lat cycles to 51
    assert t.column("time")[0].as_py() == 1704067200
    assert t.column("lat")[0].as_py() == 50.0
    assert t.column("lon")[1].as_py() == -3.0  # lon cycles fastest
    assert t.column("lat")[4].as_py() == 51.0
    assert t.column("sst")[5].as_py() == 5.0


def test_attribute_columns():
    t = sst_dataset().flatten()
    assert t.column("sst.units")[0].as_py() == "degree_Celsius"
    assert t.column(".title")[23].as_py() == "Demo SST"


def test_scalar_becomes_constant_column():
    ds = sst_dataset()
    ds.variables["version"] = ((), np.float64(3.0))
    t = ds.flatten()
    assert t.column("version").to_pylist() == [3.0] * 24


def test_variable_outside_grid_dropped():
    ds = sst_dataset()
    ds.dims["other"] = 7
    ds.variables["weird"] = (("other",), np.arange(7))
    t = ds.flatten()
    assert "weird" not in t.column_names


def test_row_range_slicing_matches_full():
    ds = sst_dataset()
    full = ds.flatten()
    parts = [ds.flatten(row_range=(lo, lo + 7)) for lo in range(0, 24, 7)]
    joined = pa.concat_tables(parts)
    assert joined.column("sst").to_pylist() == full.column("sst").to_pylist()
    assert joined.column("lat").to_pylist() == full.column("lat").to_pylist()


def test_dimensions_override():
    ds = sst_dataset()
    t = ds.flatten(dimensions=["time"])
    # grid=(time,) → only vars on ⊆{time} survive: time itself (lat/lon/sst dropped)
    assert t.num_rows == 2
    assert "sst" not in t.column_names and "time" in t.column_names


# ---- CF decoding (cf-decoding.md) ----


def test_cf_time_since_epoch():
    vals = np.array([0.0, 1.0], dtype="float64")
    out, typ = decode_cf(vals, {"units": "days since 1950-01-01"})
    assert typ == pa.timestamp("us")
    assert str(out.view("int64")[1] - out.view("int64")[0]) == str(86_400_000_000_000)


def test_cf_scale_offset():
    vals = np.array([10, 20], dtype="int16")
    out, _ = decode_cf(vals, {"scale_factor": 0.5, "add_offset": 100.0})
    assert out.dtype == np.float64
    assert out.tolist() == [105.0, 110.0]


def test_cf_fill_value_becomes_null():
    vals = np.array([1, -999, 3], dtype="int32")
    out, _ = decode_cf(vals, {"_FillValue": -999})
    arr = pa.array(out.data if isinstance(out, np.ma.MaskedArray) else out,
                   mask=np.ma.getmaskarray(out) if isinstance(out, np.ma.MaskedArray) else None)
    assert arr.to_pylist() == [1, None, 3]


def test_cf_missing_value_ignored():
    # the reference deliberately ignores missing_value (cf-decoding.md)
    vals = np.array([1, -999, 3], dtype="int32")
    out, _ = decode_cf(vals, {"missing_value": -999})
    assert np.asarray(out).tolist() == [1, -999, 3]


def test_ragged_profile_shape():
    """CF contiguous ragged arrays: per-profile rows via a profile dim."""
    ds = GridDataset(
        dims={"obs": 6},
        variables={
            "pressure": (("obs",), np.array([1, 2, 3, 1, 2, 3], dtype="int32")),
            "profile_id": (("obs",), np.array([0, 0, 0, 1, 1, 1], dtype="int32")),
        },
    )
    t = ds.flatten()
    assert t.num_rows == 6
    assert t.column("profile_id").to_pylist() == [0, 0, 0, 1, 1, 1]


def ragged_dataset() -> GridDataset:
    """CF contiguous ragged layout (dataset/any.rs:10-23): 3 profiles with
    2/3/1 observations; rowSize carries sample_dimension."""
    return GridDataset(
        dims={"profile": 3, "obs": 6},
        variables={
            "platform": (("profile",), np.array([10, 20, 30], dtype="int32")),
            "lat": (("profile",), np.array([50.0, 51.0, 52.0], dtype="float64")),
            "rowSize": (("profile",), np.array([2, 3, 1], dtype="int32")),
            "pressure": (("obs",), np.array([5, 10, 5, 10, 15, 5], dtype="int32")),
        },
        var_attrs={"rowSize": {"sample_dimension": "obs"}},
    )


def test_ragged_grid_is_sample_dim():
    assert ragged_dataset().grid() == ("obs",)
    assert ragged_dataset().row_count() == 6


def test_ragged_instance_vars_repeat_per_counts():
    t = ragged_dataset().flatten(attribute_columns=False)
    assert t.column("platform").to_pylist() == [10, 10, 20, 20, 20, 30]
    assert t.column("lat").to_pylist() == [50.0, 50.0, 51.0, 51.0, 51.0, 52.0]
    assert t.column("pressure").to_pylist() == [5, 10, 5, 10, 15, 5]
    assert t.column("rowSize").to_pylist() == [2, 2, 3, 3, 3, 1]


def test_ragged_row_range_mid_profile():
    t = ragged_dataset().flatten(attribute_columns=False, row_range=(1, 5))
    assert t.column("platform").to_pylist() == [10, 20, 20, 20]
    assert t.column("pressure").to_pylist() == [10, 5, 10, 15]


def test_ragged_netcdf3_roundtrip(tmp_path):
    from beacon_spark.sources.nd import open_netcdf
    from beacon_spark.sources.netcdf3 import write_netcdf3

    ds = ragged_dataset()
    p = str(tmp_path / "ragged.nc")
    write_netcdf3(p, ds.dims, ds.variables, ds.var_attrs, {})
    back = open_netcdf(p)
    t = back.flatten(attribute_columns=False)
    assert t.column("platform").to_pylist() == [10, 10, 20, 20, 20, 30]
    assert t.column("pressure").to_pylist() == [5, 10, 5, 10, 15, 5]


def test_cf_time_decode_is_exact_at_modern_epochs():
    """float64(v) * ns_per_unit rounds past 2^53 ns: a µs-unit variable
    at a modern epoch decoded ±128 ns off and the ns→µs safe-cast then
    CRASHED the read ('would lose data'). Integer inputs (and integral
    floats) must decode exactly; genuine sub-µs floors to the boundary
    instead of failing the scan."""
    import numpy as np

    from beacon_spark.sources.nd import _to_arrow, decode_cf

    for dt in (np.int64, np.float64):
        vals = np.array([1700000000000001, 1700000000000003], dtype=dt)
        arr, t = decode_cf(vals, {"units": "microseconds since 1970-01-01"})
        out = _to_arrow(np.ascontiguousarray(arr), t).to_pylist()
        assert out[0].isoformat() == "2023-11-14T22:13:20.000001"
        assert out[1].isoformat() == "2023-11-14T22:13:20.000003"
    # ns-resolution input floors to the µs boundary (Spark has no ns)
    vals = np.array([1700000000000000500], dtype=np.int64)
    arr, t = decode_cf(vals, {"units": "nanoseconds since 1970-01-01"})
    out = _to_arrow(np.ascontiguousarray(arr), t).to_pylist()
    assert out[0].isoformat() == "2023-11-14T22:13:20"
    # seconds stay exact and _FillValue still masks to NULL
    vals = np.array([1700000000, -999], dtype=np.int64)
    arr, t = decode_cf(
        vals, {"units": "seconds since 1970-01-01", "_FillValue": -999})
    out = _to_arrow(arr, t).to_pylist()
    assert out == [__import__("datetime").datetime(2023, 11, 14, 22, 13, 20),
                   None]


# ------------------------------------------------- adaptive task planning


def test_effective_rows_per_task_scales_with_input():
    from beacon_spark.sources.nd import _MIN_TASK_ROWS, effective_rows_per_task

    # small scans floor at the minimum task size (never 1-row tasks)
    assert effective_rows_per_task(100_000, 1_000_000, 32) == _MIN_TASK_ROWS
    # huge scans cap at the caller's rows_per_task
    assert effective_rows_per_task(10**9, 1_000_000, 32) == 1_000_000
    # mid-size scans target ~2 tasks per core
    eff = effective_rows_per_task(32 * 2 * 200_000, 10**9, 32)
    assert eff == 200_000
    # explicit tiny caps are honored verbatim
    assert effective_rows_per_task(10**6, 5, 32) == 5
    # degenerate inputs fall back to the cap
    assert effective_rows_per_task(0, 777, 32) == 777


def test_rdd_slice_count_scales_past_256():
    from beacon_spark.sources.nd import rdd_slice_count

    # local-mode scans: one slice per task, far under the cap
    assert rdd_slice_count(64, 32) == 64
    # big scans on small clusters keep the 256 floor cap
    assert rdd_slice_count(10_000, 32) == 256
    # the cap follows the cluster (r14 verdict #1: fixed 256 serialized
    # >=4 tasks/slice at 1024+ cores)
    assert rdd_slice_count(10_000, 2048) == 2048
    assert rdd_slice_count(1_000, 2048) == 1_000


def test_interleave_tasks_spreads_adjacent_tasks():
    from beacon_spark.sources.nd import interleave_tasks

    tasks = list(range(10))
    # one slice per task: order untouched
    assert interleave_tasks(tasks, 10) == tasks
    assert interleave_tasks(tasks, 20) == tasks
    # capped: round-robin reorder — adjacent originals land ~n_slices
    # apart so a contiguous slice split never co-locates neighbours
    out = interleave_tasks(tasks, 3)
    assert sorted(out) == tasks  # permutation, nothing lost
    assert out == [0, 3, 6, 9, 1, 4, 7, 2, 5, 8]
    # each group of ~len/n consecutive outputs = one slice's worth,
    # containing no two originally-adjacent tasks
    assert all(abs(a - b) >= 3 for a, b in zip(out[:4], out[1:4]))


def test_split_task_rows_band_alignment_and_coverage():
    from beacon_spark.sources.nd import split_task_rows

    # bench zarr shape: 400x2000 region, chunk band 150*2000 rows,
    # region starts mid-band (time=400, chunk lead 150 -> offset 100*2000)
    bounds = split_task_rows(800_000, 65_536, 300_000, 200_000)
    # full coverage, no overlap
    assert bounds[0][0] == 0 and bounds[-1][1] == 800_000
    assert all(a[1] == b[0] for a, b in zip(bounds, bounds[1:]))
    # every interior cut sits on an ABSOLUTE chunk-band edge
    # (absolute edges at rows ≡ -200000 ≡ 100000 (mod 300000))
    for lo, _ in bounds[1:]:
        assert (lo + 200_000) % 300_000 == 0
    # contiguous layouts split in plain eff steps
    plain = split_task_rows(150_000, 65_536, 0, 0)
    assert plain == [(0, 65_536), (65_536, 131_072), (131_072, 150_000)]
    # degenerate
    assert split_task_rows(0, 100, 50, 0) == []
    assert split_task_rows(10, 100, 0, 0) == [(0, 10)]

"""Python DataSource V2 surface for nd formats (sources/nd_datasource.py):
``spark.read.format("beacon_nd")`` — same planning-time pushdown story as
read_nd, idiomatic reader registration (the Spark-native analog of the
reference's DataFusion TableProviders, beacon-arrow-netcdf/src/)."""

import os

import numpy as np
import pytest

from beacon_spark.sources.netcdf3 import write_netcdf3


@pytest.fixture()
def nc_file(tmp_path):
    p = str(tmp_path / "grid.nc")
    write_netcdf3(
        p,
        dims={"time": 4, "lat": 3},
        variables={
            "time": (("time",), np.arange(4, dtype=np.int32)),
            "lat": (("lat",), np.array([10.0, 20.0, 30.0])),
            "temp": (
                ("time", "lat"),
                np.arange(12, dtype=np.float32).reshape(4, 3),
            ),
        },
    )
    return p


def test_format_read_matches_read_nd(spark, nc_file):
    from beacon_spark.sources.nd import read_nd
    from beacon_spark.sources.nd_datasource import register_nd_datasource

    register_nd_datasource(spark)
    via_ds = (
        spark.read.format("beacon_nd").option("fmt", "netcdf").load(nc_file)
    )
    via_fn = read_nd(spark, "netcdf", [nc_file])
    assert sorted(via_ds.columns) == sorted(via_fn.columns)
    s = sorted(tuple(r) for r in via_ds.select(*sorted(via_ds.columns)).collect())
    b = sorted(tuple(r) for r in via_fn.select(*sorted(via_ds.columns)).collect())
    assert s == b and len(s) == 12


def test_format_read_partitions_chunk(spark, nc_file):
    from beacon_spark.sources.nd_datasource import register_nd_datasource

    register_nd_datasource(spark)
    df = (
        spark.read.format("beacon_nd")
        .option("fmt", "netcdf")
        .option("rows_per_task", "5")
        .load(nc_file)
    )
    # 12 rows at 5 rows/task -> 3 partitions, all rows intact
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 12


def test_format_read_tiff(spark, tmp_path):
    from beacon_spark.sources.nd_datasource import register_nd_datasource
    from beacon_spark.sources.tifflite import write_tiff

    p = str(tmp_path / "r.tif")
    band = np.arange(24, dtype=np.float32).reshape(4, 6)
    write_tiff(p, [band], pixel_scale=(0.5, 0.25), tiepoint=(0, 0, 10.0, 60.0))
    register_nd_datasource(spark)
    df = spark.read.format("beacon_nd").option("fmt", "tiff").load(p)
    assert df.count() == 24
    from pyspark.sql import functions as F

    total = df.agg(F.sum(F.col("`band.0`"))).collect()[0][0]
    assert total == float(band.sum())


def test_nd_datasource_where_pushdown_prunes_partitions(spark, tmp_path):
    """r9: the reference's 'predicate pushdown is automatic' for the
    SQL/DataFrame surface — a WHERE on a coordinate variable reaches
    NDReader.pushFilters and shrinks the PLANNED partitions (chunk-grid
    pruning), while every filter is handed back to Spark so results
    stay exact."""
    import numpy as np

    from beacon_spark.sources.nd_datasource import register_nd_datasource
    from beacon_spark.sources.zarrlite import write_zarr_store

    root = str(tmp_path / "push.zarr")
    write_zarr_store(
        root,
        {
            "t": (("t",), np.arange(40.0)),
            "v": (("t",), np.arange(40.0) * 2),
        },
        version=2, codec=None,
        chunk_shapes={"v": (5,), "t": (40,)},
    )
    register_nd_datasource(spark)

    def load():
        return (
            spark.read.format("beacon_nd")
            .option("fmt", "zarr").option("rows_per_task", "5")
            .load(root)
        )

    full = load()
    assert full.rdd.getNumPartitions() == 8  # 40 rows / 5 per task
    sliced = load().filter("t >= 10 AND t <= 19")
    # the planned region shrank to 10 rows -> 2 partitions
    assert sliced.rdd.getNumPartitions() == 2
    rows = sliced.orderBy("t").collect()
    assert [r.t for r in rows] == [float(x) for x in range(10, 20)]
    assert rows[0].v == 20.0
    # strict bounds widen to inclusive hulls; the residual filter
    # restores exactness
    strict = load().filter("t > 10 AND t < 12")
    assert [r.t for r in strict.collect()] == [11.0]

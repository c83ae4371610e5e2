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

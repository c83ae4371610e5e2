"""Output-format tests: cross-format agreement (the reference's
test_output_formats.py asserts csv/arrow/parquet agree on the same query)
+ ndnetcdf re-gridding core + geoparquet metadata."""

import json

import numpy as np
import pyarrow.ipc as pa_ipc
import pyarrow.parquet as pq
import pytest

from beacon_spark.outputs import regrid, write_output


@pytest.fixture(scope="module")
def result_df(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/orders.parquet")
    return (
        df.groupBy("o_orderpriority")
        .count()
        .orderBy("o_orderpriority")
    )


def test_cross_format_agreement(result_df, tmp_path, spark):
    p_csv = str(tmp_path / "r.csv")
    p_parquet = str(tmp_path / "r.parquet")
    p_arrow = str(tmp_path / "r.arrow")
    write_output(result_df, "csv", p_csv)
    write_output(result_df, "parquet", p_parquet)
    write_output(result_df, "arrow", p_arrow)

    via_parquet = pq.read_table(p_parquet).to_pylist()
    with pa_ipc.open_file(p_arrow) as r:
        via_arrow = r.read_all().to_pylist()
    import csv as _csv

    with open(p_csv) as f:
        rd = _csv.DictReader(f)
        via_csv = [{"o_orderpriority": row["o_orderpriority"],
                    "count": int(row["count"])} for row in rd]
    assert via_parquet == via_arrow == via_csv
    assert len(via_parquet) > 0


def test_distributed_parquet_write(result_df, tmp_path, spark):
    out = str(tmp_path / "dist")
    write_output(result_df, "parquet", out, single=False)
    assert spark.read.parquet(out).count() == result_df.count()


def test_regrid_dense():
    import pyarrow as pa

    t = pa.table({
        "time": [1, 1, 2, 2], "lat": [10.0, 20.0, 10.0, 20.0],
        "sst": [1.0, 2.0, 3.0, 4.0],
    })
    coords, variables = regrid(t, ["time", "lat"])
    assert coords["time"].tolist() == [1, 2]
    assert variables["sst"].shape == (2, 2)
    assert variables["sst"].tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_regrid_sparse_fills_nan():
    import pyarrow as pa

    t = pa.table({"x": [1, 2], "y": [1, 2], "v": [5.0, 6.0]})
    coords, variables = regrid(t, ["x", "y"])
    m = variables["v"]
    assert m[0][0] == 5.0 and m[1][1] == 6.0
    assert np.isnan(m[0][1]) and np.isnan(m[1][0])


def test_geoparquet_metadata(spark, tmp_path):
    df = spark.createDataFrame([(4.5, 52.0, "a")], "lon double, lat double, name string")
    out = str(tmp_path / "geo.parquet")
    write_output(df, "geoparquet", out, longitude_column="lon", latitude_column="lat")
    table = pq.read_table(out)
    meta = json.loads(table.schema.metadata[b"geo"])
    assert meta["primary_column"] == "geometry"
    wkb = table.column("geometry")[0].as_py()
    assert wkb[0:1] == b"\x01"  # little-endian
    import struct

    geom_type = struct.unpack("<I", wkb[1:5])[0]
    x, y = struct.unpack("<2d", wkb[5:21])
    assert geom_type == 1 and (x, y) == (4.5, 52.0)


def test_netcdf_gated(result_df, tmp_path):
    with pytest.raises(ImportError):
        write_output(result_df, "netcdf", str(tmp_path / "x.nc"))

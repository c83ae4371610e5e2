"""Engine SQL dialect extensions: QUALIFY, macros, schema twins
(reference: docs sql/index.md:46-48, table-functions-utility.md)."""

import pytest

from beacon_spark.engine import Engine


@pytest.fixture()
def eng(spark, sf_dir):
    return Engine(spark, datasets_root=sf_dir)


def test_qualify_alias_form(eng):
    out = eng.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
        FROM read_parquet('orders.parquet')
        QUALIFY rn = 1
        ORDER BY o_custkey LIMIT 20
        """
    ).collect()
    assert len(out) == 20
    assert all(r.rn == 1 for r in out)
    assert [r.o_custkey for r in out] == sorted(r.o_custkey for r in out)


def test_qualify_window_pred_form(eng, spark):
    out = eng.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM read_parquet('orders.parquet')
        QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) <= 2
        """
    )
    counts = out.groupBy("o_custkey").count().collect()
    assert all(r["count"] <= 2 for r in counts)
    assert "__q" not in out.columns


def test_read_schema_twins(eng):
    rows = {r.column_name: r.data_type for r in eng.read_parquet_schema("orders.parquet").collect()}
    assert rows["o_orderkey"] in ("bigint", "long")
    odv = None  # odv/netcdf twins need fixture files; schema twin for parquet covers the path

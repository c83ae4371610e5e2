"""Iceberg source: avrolite container codec + metadata/manifest replay
(sources/iceberg.py, sources/avrolite.py)."""

import os

import pytest
from pyspark.sql import functions as F

from beacon_spark.sources.avrolite import read_avro, write_avro
from beacon_spark.sources.iceberg import (
    read_iceberg,
    read_iceberg_schema,
    write_iceberg,
)


def test_avro_container_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "e",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"]},
            {"name": "xs", "type": {"type": "array", "items": "double"}},
            {"name": "m", "type": {"type": "map", "values": ["null", "string"]}},
            {"name": "ok", "type": "boolean"},
        ],
    }
    recs = [
        {"s": "a", "n": None, "xs": [1.5, -2.25], "m": {"k": "v", "z": None}, "ok": True},
        {"s": "ü", "n": -(2**40), "xs": [], "m": {}, "ok": False},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_avro(p, schema, recs, codec)
        meta, out = read_avro(p)
        assert out == recs
        assert meta["codec"] == codec


@pytest.fixture()
def ice_dir(tmp_path):
    return str(tmp_path / "tbl")


def test_write_read_roundtrip(spark, ice_dir):
    df = spark.range(60).select(
        "id", (F.col("id") % 5).alias("g"), (F.col("id") * 0.5).alias("v")
    )
    write_iceberg(df, ice_dir)
    out = read_iceberg(spark, ice_dir)
    assert out.count() == 60
    assert {r["id"] for r in out.collect()} == set(range(60))


def test_append_overwrite_time_travel(spark, ice_dir):
    s1 = write_iceberg(spark.range(10), ice_dir, mode="overwrite")
    s2 = write_iceberg(spark.range(10, 30), ice_dir, mode="append")
    assert read_iceberg(spark, ice_dir).count() == 30
    assert read_iceberg(spark, ice_dir, snapshot_id=s1).count() == 10
    s3 = write_iceberg(spark.range(3), ice_dir, mode="overwrite")
    assert read_iceberg(spark, ice_dir).count() == 3
    assert read_iceberg(spark, ice_dir, snapshot_id=s2).count() == 30
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, ice_dir, snapshot_id=999)
    assert s3 != s1


def test_schema_fn(spark, ice_dir):
    write_iceberg(
        spark.range(2).select(
            "id", F.lit("x").alias("s"), F.lit(1.5).alias("v"),
            F.lit(True).alias("b"),
        ),
        ice_dir,
    )
    got = {
        r["column_name"]: r["data_type"]
        for r in read_iceberg_schema(spark, ice_dir).collect()
    }
    assert got == {"id": "bigint", "s": "string", "v": "double", "b": "boolean"}


def test_delete_manifests_rejected(spark, ice_dir):
    import json

    from beacon_spark.sources.avrolite import write_avro as _wa
    from beacon_spark.sources.iceberg import (
        _MANIFEST_LIST_SCHEMA,
        _load_metadata,
        _localize,
    )

    write_iceberg(spark.range(5), ice_dir)
    md = _load_metadata(ice_dir)
    cur = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    mlist = _localize(cur["manifest-list"], ice_dir)
    _meta, entries = read_avro(mlist)
    entries.append({**entries[0], "content": 1})
    _wa(mlist, _MANIFEST_LIST_SCHEMA, entries)
    with pytest.raises(NotImplementedError, match="delete manifests"):
        read_iceberg(spark, ice_dir)


def test_relocated_table_reads(spark, ice_dir, tmp_path):
    """Manifest paths are absolute from write time; a moved table must
    still read via path re-rooting."""
    import shutil

    write_iceberg(spark.range(12), ice_dir)
    moved = str(tmp_path / "moved" / os.path.basename(ice_dir))
    os.makedirs(os.path.dirname(moved))
    shutil.move(ice_dir, moved)
    assert read_iceberg(spark, moved).count() == 12


def test_sql_and_dsl_paths(spark, ice_dir, tmp_path):
    from beacon_spark import Engine

    eng = Engine(spark, datasets_root=str(tmp_path))
    write_iceberg(
        spark.range(30).select("id", (F.col("id") % 3).alias("g")), ice_dir
    )
    assert (
        eng.sql(
            f"SELECT g, count(*) AS n FROM read_iceberg('{ice_dir}') GROUP BY g"
        ).count()
        == 3
    )
    out = eng.query(
        {
            "select": ["id"],
            "from": {"iceberg": {"location": ice_dir}},
            "filter": {"column": "id", "lt_eq": 4},
        }
    )
    assert out.count() == 5

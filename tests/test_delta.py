"""Delta Lake source: pure-Python log replay (sources/delta.py).

Round-trips through our own minimal writer — which emits the same protocol
delta-spark reads (JSON commits with protocol/metaData/add/remove) — plus
time travel, partitioned tables, schema evolution with NULL-fill, history,
and loud failures on unsupported reader features.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from beacon_spark.sources.delta import (
    delta_history,
    read_delta,
    read_delta_schema,
    write_delta,
)


@pytest.fixture()
def delta_dir(tmp_path):
    return str(tmp_path / "tbl")


def test_write_read_roundtrip(spark, delta_dir):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), (F.col("id") * 1.5).alias("v")
    )
    v = write_delta(df, delta_dir, mode="overwrite")
    assert v == 0
    out = read_delta(spark, delta_dir)
    assert out.count() == 100
    assert {r["id"] for r in out.collect()} == set(range(100))


def test_append_and_time_travel(spark, delta_dir):
    write_delta(spark.range(10), delta_dir, mode="overwrite")
    write_delta(spark.range(10, 25), delta_dir, mode="append")
    assert read_delta(spark, delta_dir).count() == 25
    assert read_delta(spark, delta_dir, version_as_of=0).count() == 10
    with pytest.raises(ValueError, match="does not exist"):
        read_delta(spark, delta_dir, version_as_of=9)


def test_overwrite_removes_old_files(spark, delta_dir):
    write_delta(spark.range(50), delta_dir, mode="overwrite")
    write_delta(spark.range(7), delta_dir, mode="overwrite")
    assert read_delta(spark, delta_dir).count() == 7
    assert read_delta(spark, delta_dir, version_as_of=0).count() == 50
    h = {r["version"]: r for r in delta_history(spark, delta_dir).collect()}
    assert h[1]["num_remove"] > 0


def test_partitioned_table_prunes(spark, delta_dir):
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("p")
    )
    write_delta(df, delta_dir, mode="overwrite", partition_by=["p"])
    out = read_delta(spark, delta_dir)
    assert out.count() == 40
    assert dict(out.dtypes)["p"] == "int"
    one = out.filter(F.col("p") == 2)
    assert one.count() == 10
    # partition filter constant-folds: the final plan scans only p=2 files
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "p=2" not in plan or "p=1" not in plan


def test_schema_evolution_null_fill(spark, delta_dir):
    write_delta(spark.range(5).select("id"), delta_dir, mode="overwrite")
    # append with an extra column via overwrite-metadata commit: simulate a
    # widened table whose old files lack the new column
    df2 = spark.range(5, 8).select("id", F.lit("x").alias("tag"))
    write_delta(df2, delta_dir, mode="append")
    # append keeps the ORIGINAL metaData (no schema overwrite) → still id-only
    assert read_delta(spark, delta_dir).columns == ["id"]
    # an overwrite commits new metadata including the new column
    write_delta(df2, delta_dir, mode="overwrite")
    out = read_delta(spark, delta_dir)
    assert set(out.columns) == {"id", "tag"}


def test_schema_fn(spark, delta_dir):
    write_delta(
        spark.range(3).select("id", F.lit(1.5).alias("v")), delta_dir
    )
    rows = {r["column_name"]: r["data_type"] for r in read_delta_schema(spark, delta_dir).collect()}
    assert rows == {"id": "bigint", "v": "double"}


def _checkpoint_rows(snap):
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None},
        {"protocol": None,
         "metaData": {
             "id": "cp", "schemaString": json.dumps(snap.schema.jsonValue()),
             "partitionColumns": [], "configuration": {}},
         "add": None},
    ] + [
        {"protocol": None, "metaData": None,
         "add": {"path": p, "partitionValues": pv, "size": 1,
                 "modificationTime": 0, "dataChange": True}}
        for p, pv in snap.adds.items()
    ]


def _checkpoint_table(rows):
    import pyarrow as pa

    mss = pa.map_(pa.string(), pa.string())
    cp_schema = pa.schema([
        pa.field("protocol", pa.struct([
            pa.field("minReaderVersion", pa.int32()),
            pa.field("minWriterVersion", pa.int32())])),
        pa.field("metaData", pa.struct([
            pa.field("id", pa.string()),
            pa.field("schemaString", pa.string()),
            pa.field("partitionColumns", pa.list_(pa.string())),
            pa.field("configuration", mss)])),
        pa.field("add", pa.struct([
            pa.field("path", pa.string()),
            pa.field("partitionValues", mss),
            pa.field("size", pa.int64()),
            pa.field("modificationTime", pa.int64()),
            pa.field("dataChange", pa.bool_())])),
    ])
    for r in rows:
        if r["metaData"]:
            r["metaData"]["configuration"] = list(
                r["metaData"]["configuration"].items())
        if r["add"]:
            r["add"]["partitionValues"] = list(r["add"]["partitionValues"].items())
    return pa.Table.from_pylist(rows, schema=cp_schema)


def test_checkpoint_replay(spark, delta_dir):
    """Reader honors _last_checkpoint + checkpoint parquet (the state of a
    long log compacted at version N), replaying only later commits."""
    import pyarrow.parquet as pq

    write_delta(spark.range(10), delta_dir, mode="overwrite")
    write_delta(spark.range(10, 20), delta_dir, mode="append")
    snap_files = read_delta(spark, delta_dir).count()
    # build a checkpoint at version 1 from the log state
    from beacon_spark.sources.delta import _snapshot

    snap = _snapshot(delta_dir)
    rows = _checkpoint_rows(snap)
    log = os.path.join(delta_dir, "_delta_log")
    pq.write_table(
        _checkpoint_table(rows),
        os.path.join(log, f"{snap.version:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": snap.version, "size": len(rows)}, f)
    # remove the pre-checkpoint commits: reader must rely on the checkpoint
    for v in range(snap.version):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert read_delta(spark, delta_dir).count() == snap_files
    write_delta(spark.range(20, 23), delta_dir, mode="append")
    assert read_delta(spark, delta_dir).count() == snap_files + 3


def test_multipart_checkpoint_replay(spark, delta_dir):
    """_last_checkpoint with 'parts': actions split across
    <v>.checkpoint.<i>.<n>.parquet files (common on larger external
    tables) — all parts replay together."""
    import pyarrow.parquet as pq

    write_delta(spark.range(10), delta_dir, mode="overwrite")
    write_delta(spark.range(10, 20), delta_dir, mode="append")
    total = read_delta(spark, delta_dir).count()
    from beacon_spark.sources.delta import _snapshot

    snap = _snapshot(delta_dir)
    rows = _checkpoint_rows(snap)
    # split: protocol+metaData in part 1, adds in part 2
    part1, part2 = rows[:2] + rows[2:3], rows[3:]
    log = os.path.join(delta_dir, "_delta_log")
    v = snap.version
    pq.write_table(_checkpoint_table(part1),
                   os.path.join(log, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(_checkpoint_table(part2),
                   os.path.join(log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": len(rows), "parts": 2}, f)
    for ver in range(v):
        os.remove(os.path.join(log, f"{ver:020d}.json"))
    assert read_delta(spark, delta_dir).count() == total
    write_delta(spark.range(20, 25), delta_dir, mode="append")
    assert read_delta(spark, delta_dir).count() == total + 5


def test_unsupported_features_raise(spark, delta_dir):
    """Column mapping is supported when physicalName metadata is present;
    a mapped table WITHOUT it (id-mode needing parquet field ids) still
    fails loudly rather than guessing."""
    write_delta(spark.range(3), delta_dir)
    log = os.path.join(delta_dir, "_delta_log")
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}}]}
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": {
            "id": "x", "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"}}}) + "\n")
    with pytest.raises(NotImplementedError, match="physicalName"):
        read_delta(spark, delta_dir)


def test_sql_and_dsl_paths(spark, delta_dir, tmp_path):
    from beacon_spark import Engine

    eng = Engine(spark, datasets_root=str(tmp_path))
    write_delta(
        spark.range(30).select("id", (F.col("id") % 3).alias("g")), delta_dir
    )
    n = eng.sql(
        f"SELECT g, count(*) AS n FROM read_delta('{delta_dir}') GROUP BY g"
    )
    assert n.count() == 3
    out = eng.query(
        {
            "select": ["id"],
            "from": {"delta": {"location": delta_dir}},
            "filter": {"column": "id", "gt": 25},
        }
    )
    assert out.count() == 4


# ------------------------------------------------------- deletion vectors


def test_dv_roundtrip_units():
    """z85 + roaring bitmap array encode/decode (sources/delta_dv.py),
    incl. multi-container and >2^32 indexes."""
    import os as _os

    from beacon_spark.sources.delta_dv import (
        roaring_bitmap_array_decode,
        roaring_bitmap_array_encode,
        z85_decode,
        z85_encode,
    )

    for n in (4, 16, 40):
        b = _os.urandom(n)
        assert z85_decode(z85_encode(b)) == b
    idx = [0, 1, 5, 65535, 65536, 70000, (1 << 32) + 3, (1 << 33) + 9]
    assert roaring_bitmap_array_decode(roaring_bitmap_array_encode(idx)) == sorted(idx)


def test_dv_bitmap_and_run_containers():
    """Decoder handles bitset (>4096 cardinality) and run containers."""
    import struct

    from beacon_spark.sources.delta_dv import _roaring32_decode

    # hand-built run-container stream: cookie 12347, 1 container, run flag
    # set, key 0, card-1 = 9, runs [(5, len 4), (100, len 4)]
    buf = struct.pack("<I", 12347 | (0 << 16))
    buf += b"\x01"  # run flag bitset, container 0 is a run
    buf += struct.pack("<HH", 0, 9)
    buf += struct.pack("<H", 2) + struct.pack("<HH", 5, 4) + struct.pack("<HH", 100, 4)
    vals, _ = _roaring32_decode(buf, 0)
    assert vals == [5, 6, 7, 8, 9, 100, 101, 102, 103, 104]


def test_delta_deletion_vectors(spark, tmp_path):
    import os as _os

    from beacon_spark.sources.delta import delta_delete_rows

    loc = str(tmp_path / "dvt")
    df = spark.range(0, 100).selectExpr("id", "id % 3 AS g")
    write_delta(df.coalesce(1), loc)
    rel = [
        _os.path.relpath(_os.path.join(r, n), loc)
        for r, _, ns in _os.walk(loc)
        for n in ns
        if n.endswith(".parquet")
    ][0]
    delta_delete_rows(loc, {rel: [0, 5, 99]})
    ids = sorted(r.id for r in read_delta(spark, loc).collect())
    assert len(ids) == 97 and {0, 5, 99}.isdisjoint(ids)
    # merge with the existing DV
    delta_delete_rows(loc, {rel: [1]})
    assert read_delta(spark, loc).count() == 96
    # time travel ignores later DVs
    assert read_delta(spark, loc, version_as_of=0).count() == 100


def test_dv_portable_layout_bytes():
    """Pin the on-disk RoaringBitmapArray layout byte-for-byte: the
    portable 64-bit format (PROTOCOL.md) key-prefixes every 32-bit
    bitmap and stores only non-empty bitmaps — NOT the keyless
    sequential 'native' layout."""
    import struct

    from beacon_spark.sources.delta_dv import (
        roaring_bitmap_array_decode,
        roaring_bitmap_array_encode,
    )

    indexes = [1, 5, (1 << 32) | 7]
    # hand-built per RoaringFormatSpec 64-bit extension:
    fix = struct.pack("<Iq", 1681511377, 2)          # magic, numBitmaps
    fix += struct.pack("<I", 0)                       # key 0 (high bits)
    fix += struct.pack("<II", 12346, 1)               # cookie, 1 container
    fix += struct.pack("<HH", 0, 1)                   # key16 0, card-1
    fix += struct.pack("<I", 16)                      # offset table (from bitmap start)
    fix += struct.pack("<2H", 1, 5)                   # values
    fix += struct.pack("<I", 1)                       # key 1
    fix += struct.pack("<II", 12346, 1)
    fix += struct.pack("<HH", 0, 0)
    fix += struct.pack("<I", 16)
    fix += struct.pack("<1H", 7)
    assert roaring_bitmap_array_encode(indexes) == fix
    assert roaring_bitmap_array_decode(fix) == indexes
    # sparse high bits: no empty bitmaps in between
    blob = roaring_bitmap_array_encode([(5 << 32) | 3])
    assert struct.unpack_from("<q", blob, 4)[0] == 1
    assert roaring_bitmap_array_decode(blob) == [(5 << 32) | 3]


def test_delta_dv_executor_side_filter(spark, tmp_path, monkeypatch):
    """Past _DV_EXPAND_LIMIT the read must not expand indexes on the
    driver: the broadcast-blob + searchsorted path returns the same
    rows."""
    import os as _os

    from beacon_spark.sources import delta as delta_mod
    from beacon_spark.sources.delta import delta_delete_rows

    loc = str(tmp_path / "dvbig")
    df = spark.range(0, 100).selectExpr("id", "id % 3 AS g")
    write_delta(df.coalesce(1), loc)
    rel = [
        _os.path.relpath(_os.path.join(r, n), loc)
        for r, _, ns in _os.walk(loc)
        for n in ns
        if n.endswith(".parquet")
    ][0]
    delta_delete_rows(loc, {rel: [0, 5, 99]})
    monkeypatch.setattr(delta_mod, "_DV_EXPAND_LIMIT", 0)
    ids = sorted(r.id for r in read_delta(spark, loc).collect())
    assert len(ids) == 97 and {0, 5, 99}.isdisjoint(ids)


def test_column_mapping_name_mode(spark, tmp_path):
    """Hand-built name-mode table per PROTOCOL.md Column Mapping: parquet
    columns + partitionValues keys + partitionColumns use physical names;
    the logical schema (incl. a nested struct) comes back to the user."""
    import json as _json
    import os as _os

    loc = str(tmp_path / "cmtab")
    _os.makedirs(_os.path.join(loc, "_delta_log"))
    # physical-named parquet data file (nested struct field also mapped)
    pdir = _os.path.join(loc, "part")
    spark.createDataFrame(
        [(1, ("a", 10)), (2, ("b", 20))],
        "`col-7f3a` long, `col-9e2b` struct<`col-11aa`: string, `col-22bb`: long>",
    ).coalesce(1).write.parquet(pdir)
    data_file = next(
        n for n in _os.listdir(pdir) if n.endswith(".parquet")
    )
    _os.rename(_os.path.join(pdir, data_file), _os.path.join(loc, "f1.parquet"))

    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id", "type": "long", "nullable": True,
                "metadata": {"delta.columnMapping.id": 1,
                             "delta.columnMapping.physicalName": "col-7f3a"},
            },
            {
                "name": "rec", "nullable": True,
                "type": {
                    "type": "struct",
                    "fields": [
                        {"name": "tag", "type": "string", "nullable": True,
                         "metadata": {"delta.columnMapping.id": 3,
                                      "delta.columnMapping.physicalName": "col-11aa"}},
                        {"name": "score", "type": "long", "nullable": True,
                         "metadata": {"delta.columnMapping.id": 4,
                                      "delta.columnMapping.physicalName": "col-22bb"}},
                    ],
                },
                "metadata": {"delta.columnMapping.id": 2,
                             "delta.columnMapping.physicalName": "col-9e2b"},
            },
            {
                "name": "p", "type": "integer", "nullable": True,
                "metadata": {"delta.columnMapping.id": 5,
                             "delta.columnMapping.physicalName": "col-p5"},
            },
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t-cm", "format": {"provider": "parquet"},
            "schemaString": _json.dumps(schema),
            "partitionColumns": ["col-p5"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "5"},
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {"col-p5": "7"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(_os.path.join(loc, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(_json.dumps(a) for a in actions))

    df = read_delta(spark, loc)
    assert [f.name for f in df.schema.fields] == ["id", "rec", "p"]
    assert df.schema["rec"].dataType.fieldNames() == ["tag", "score"]
    rows = {r.id: r for r in df.collect()}
    assert rows[1].rec.tag == "a" and rows[2].rec.score == 20
    assert rows[1].p == 7 and rows[2].p == 7


def test_column_mapping_pushdown_plan(spark, tmp_path):
    """The physical→logical rename is transparent to Catalyst: a filter
    on a logical column reaches the parquet scan as a pushed filter on
    the PHYSICAL column, and ReadSchema prunes to the referenced
    physical columns only."""
    import json as _json
    import os as _os
    import re as _re

    loc = str(tmp_path / "cmplan")
    _os.makedirs(_os.path.join(loc, "_delta_log"))
    pdir = _os.path.join(loc, "part")
    spark.range(100).selectExpr(
        "id AS `col-aa`", "id * 2 AS `col-bb`"
    ).coalesce(1).write.parquet(pdir)
    fn = next(n for n in _os.listdir(pdir) if n.endswith(".parquet"))
    _os.rename(_os.path.join(pdir, fn), _os.path.join(loc, "f1.parquet"))
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aa"}},
        {"name": "v", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bb"}},
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t", "format": {"provider": "parquet"},
                      "schemaString": _json.dumps(schema),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(_os.path.join(loc, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(_json.dumps(a) for a in actions))

    df = read_delta(spark, loc).filter(F.col("id") > 90).select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = _re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "col-aa" in pushed and "GreaterThan" in pushed
    read_schema = _re.search(r"ReadSchema: ([^\n]*)", plan).group(1)
    assert "col-aa" in read_schema and "col-bb" not in read_schema
    assert df.count() == 9


def test_null_partition_value_readable(spark, tmp_path):
    """A NULL partition value (__HIVE_DEFAULT_PARTITION__) must not
    TypeError against string keys when grouping files for the scan."""
    loc = str(tmp_path / "nullpart")
    df = spark.createDataFrame([("a", 1), (None, 2)], "p string, v int")
    write_delta(df, loc, partition_by=["p"])
    got = sorted(
        ((r.p, r.v) for r in read_delta(spark, loc).collect()),
        key=lambda t: (t[0] is None, t[0] or ""),
    )
    assert got == [("a", 1), (None, 2)]


def test_percent_encoded_add_path(spark, tmp_path):
    """add.path values are percent-encoded per the Delta protocol; the
    reader must decode them at the filesystem boundary."""
    loc = str(tmp_path / "encpath")
    df = spark.createDataFrame([("a b", 1), ("c", 2)], "p string, v int")
    write_delta(df, loc, partition_by=["p"])
    # our writer stores raw paths; simulate a protocol-conformant writer
    # by percent-encoding the space in the logged path
    import glob as _glob
    import json as _json
    import urllib.parse

    commit = sorted(_glob.glob(f"{loc}/_delta_log/*.json"))[-1]
    lines = []
    for line in open(commit):
        a = _json.loads(line)
        if "add" in a:
            a["add"]["path"] = urllib.parse.quote(a["add"]["path"], safe="/=")
        lines.append(_json.dumps(a))
    open(commit, "w").write("\n".join(lines) + "\n")
    got = sorted((r.p, r.v) for r in read_delta(spark, loc).collect())
    assert got == [("a b", 1), ("c", 2)]


def test_unsupported_reader_feature_refused(spark, tmp_path):
    """The Delta spec requires readers to refuse unknown readerFeatures
    (scanning a typeWidening table anyway returns wrong data)."""
    loc = str(tmp_path / "feat")
    write_delta(spark.range(3), loc)
    import json as _json

    commit = f"{loc}/_delta_log/{1:020d}.json"
    with open(commit, "w") as f:
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"]}}) + "\n")
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, loc)


def test_version_as_of_replays_from_checkpoint_base(spark, tmp_path):
    """Time travel must use the newest checkpoint at or before the
    target version — pre-checkpoint commits may be retention-cleaned."""
    import pyarrow.parquet as pq

    from beacon_spark.sources.delta import _snapshot

    loc = str(tmp_path / "cpbase")
    write_delta(spark.range(3), loc)                      # v0
    write_delta(spark.range(5), loc, mode="append")       # v1
    snap = _snapshot(loc)
    log = os.path.join(loc, "_delta_log")
    pq.write_table(
        _checkpoint_table(_checkpoint_rows(snap)),
        os.path.join(log, f"{snap.version:020d}.checkpoint.parquet"),
    )
    write_delta(spark.range(7), loc, mode="append")       # v2
    # retention-clean the pre-checkpoint commits
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    assert read_delta(spark, loc, version_as_of=2).count() == 15


def test_read_delta_sql_time_travel_args(spark, tmp_path):
    """r9: read_delta's SQL second argument (table-functions.md) — an
    integer is a version, any other string an RFC-3339 timestamp
    resolved to the last commit at-or-before it. The quoted form was
    previously swallowed as a glob and SILENTLY dropped (time travel
    read the latest version)."""
    import time as _time

    from beacon_spark.engine import Engine
    from beacon_spark.sources.delta import write_delta

    root = tmp_path / "dtt"
    root.mkdir()
    eng = Engine(spark, datasets_root=str(root))
    loc = str(root / "t")
    write_delta(spark.range(3).selectExpr("id AS v"), loc, mode="overwrite")
    _time.sleep(0.05)
    import datetime as _dt

    between = _dt.datetime.now(_dt.timezone.utc).isoformat()
    _time.sleep(0.05)
    write_delta(spark.range(10).selectExpr("id AS v"), loc, mode="overwrite")

    assert eng.sql("SELECT count(*) AS n FROM read_delta('t')") \
        .collect()[0].n == 10
    assert eng.sql("SELECT count(*) AS n FROM read_delta('t', 0)") \
        .collect()[0].n == 3
    got = eng.sql(
        f"SELECT count(*) AS n FROM read_delta('t', '{between}')"
    ).collect()[0].n
    assert got == 3, "timestamp time travel must pin the older version"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no Delta version existed"):
        eng.sql("SELECT * FROM read_delta('t', '1990-01-01T00:00:00Z')")


def test_checkpoint_remove_tombstones_do_not_drop_live_files(spark, delta_dir):
    """r10 delta review (silent row loss): checkpoint `remove` entries
    are VACUUM tombstones — applying them as logical removes dropped a
    live remove-then-re-added file whenever the tombstone row followed
    the add row in the checkpoint parquet (the standard DV DELETE
    commit shape)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beacon_spark.sources.delta import _snapshot

    df = spark.range(10).select(F.col("id"))
    write_delta(df, delta_dir)
    snap = _snapshot(delta_dir)
    log = os.path.join(delta_dir, "_delta_log")
    rows = _checkpoint_rows(snap)
    live = list(snap.adds)[0]
    # retained tombstone for a LIVE path, AFTER its add row
    mss = pa.map_(pa.string(), pa.string())
    cp_schema = pa.schema(list(_checkpoint_table(
        _checkpoint_rows(snap)).schema) + [
        pa.field("remove", pa.struct([
            pa.field("path", pa.string()),
            pa.field("deletionTimestamp", pa.int64()),
            pa.field("dataChange", pa.bool_())])),
    ])
    tbl_rows = [dict(r, remove=None) for r in rows] + [{
        "protocol": None, "metaData": None, "add": None,
        "remove": {"path": live, "deletionTimestamp": 0,
                   "dataChange": False},
    }]
    base = _checkpoint_table([
        {k: v for k, v in r.items() if k != "remove"} for r in tbl_rows
    ])
    rem = pa.array([r["remove"] for r in tbl_rows], cp_schema.field("remove").type)
    cp = base.append_column(cp_schema.field("remove"), rem)
    v = snap.version
    pq.write_table(cp, os.path.join(log, f"{v:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": cp.num_rows}, f)
    for fn in list(os.listdir(log)):
        if fn.endswith(".json") and not fn.startswith("_"):
            os.remove(os.path.join(log, fn))
    assert read_delta(spark, delta_dir).count() == 10  # no rows lost


def test_absolute_add_path_used_verbatim(spark, delta_dir, tmp_path):
    """r10 delta review: absolute add.path entries (shallow clones) were
    joined under the table root, minting garbage paths."""
    from beacon_spark.sources.delta import _resolve_add

    assert _resolve_add("/lake/t", "part-0.parquet") == "/lake/t/part-0.parquet"
    assert _resolve_add("/lake/t", "s3://other/f.parquet") == "s3://other/f.parquet"
    assert _resolve_add("s3://b/t", "/abs/f.parquet") == "/abs/f.parquet"
    assert _resolve_add("s3://b/t", "part-0.parquet") == "s3://b/t/part-0.parquet"

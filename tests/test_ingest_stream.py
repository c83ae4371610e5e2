"""Streaming ingestion: CREATE/RUN/SHOW/DROP STREAM
(streaming/ingest.py — an extension beyond the reference, which has no
streaming engine; the exactly-once contract is Spark's file-source
checkpoint)."""

import pytest

from beacon_spark.engine import Engine


@pytest.fixture()
def seng(spark, tmp_path):
    eng = Engine(spark, datasets_root=str(tmp_path))
    eng.sql("CREATE TABLE sink AS SELECT id, id * 2 AS v FROM range(0)")
    return eng


def _write_files(spark, dirpath, start, n):
    (spark.range(start, start + n)
     .selectExpr("id", "id * 2 AS v")
     .coalesce(1).write.mode("append").parquet(str(dirpath)))


def test_stream_ingests_exactly_once(seng, spark, tmp_path):
    eng = seng
    _write_files(spark, tmp_path / "incoming", 0, 5)
    eng.sql("CREATE STREAM s1 ON 'incoming' INTO sink")
    rows = eng.sql("SHOW STREAMS").collect()
    assert [(r.stream_name, r.target_table, r.format) for r in rows] == [
        ("s1", "sink", "parquet")
    ]
    rep = eng.sql("RUN STREAM s1").collect()[0]
    assert rep.rows_ingested == 5
    assert eng.sql("SELECT count(*) AS n FROM sink").collect()[0].n == 5
    # a second run with nothing new ingests nothing (checkpointed)
    rep = eng.sql("RUN STREAM s1").collect()[0]
    assert rep.rows_ingested == 0
    assert eng.sql("SELECT count(*) AS n FROM sink").collect()[0].n == 5
    # new files → only they are ingested
    _write_files(spark, tmp_path / "incoming", 100, 3)
    rep = eng.sql("RUN STREAM s1").collect()[0]
    assert rep.rows_ingested == 3
    got = sorted(
        r.id for r in eng.sql("SELECT id FROM sink").collect()
    )
    assert got == [0, 1, 2, 3, 4, 100, 101, 102]


def test_stream_rows_query_cleanly(seng, spark, tmp_path):
    eng = seng
    _write_files(spark, tmp_path / "inc2", 0, 4)
    eng.sql("CREATE STREAM s2 ON 'inc2' INTO sink")
    eng.sql("RUN STREAM s2")
    # ingested rows behave like any INSERT: visible, typed, indexable
    assert eng.sql(
        "SELECT sum(v) AS s FROM sink"
    ).collect()[0].s == sum(i * 2 for i in range(4))


def test_stream_validation_and_drop(seng, spark, tmp_path):
    eng = seng
    with pytest.raises(Exception, match="not a managed table"):
        eng.sql("CREATE STREAM bad ON 'x' INTO missing_table")
    eng.sql("CREATE STREAM s3 ON 'inc3' INTO sink")
    with pytest.raises(Exception, match="already exists"):
        eng.sql("CREATE STREAM s3 ON 'other' INTO sink")
    with pytest.raises(Exception, match="unsupported stream format"):
        eng.sql("CREATE STREAM s4 ON 'p' INTO sink WITH ('format' 'xml')")
    assert eng.sql("DROP STREAM s3").collect()[0].status == "ok"
    with pytest.raises(Exception, match="does not exist"):
        eng.sql("DROP STREAM s3")
    assert eng.sql("DROP STREAM IF EXISTS s3").collect()[0].status == "noop"
    # unknown stream run
    with pytest.raises(Exception, match="unknown stream"):
        eng.sql("RUN STREAM nope")


def test_dropped_stream_forgets_checkpoint(seng, spark, tmp_path):
    eng = seng
    _write_files(spark, tmp_path / "inc5", 0, 2)
    eng.sql("CREATE STREAM s5 ON 'inc5' INTO sink")
    assert eng.sql("RUN STREAM s5").collect()[0].rows_ingested == 2
    eng.sql("DROP STREAM s5")
    # recreating starts from scratch: the same files ingest again
    eng.sql("CREATE STREAM s5 ON 'inc5' INTO sink")
    assert eng.sql("RUN STREAM s5").collect()[0].rows_ingested == 2


def test_csv_stream_with_options(seng, spark, tmp_path):
    eng = seng
    (tmp_path / "csvdir").mkdir()
    (tmp_path / "csvdir" / "a.csv").write_text("id|v\n7|14\n8|16\n")
    eng.sql("CREATE STREAM sc ON 'csvdir' INTO sink "
            "WITH ('format' 'csv', 'delimiter' '|')")
    rep = eng.sql("RUN STREAM sc").collect()[0]
    assert rep.rows_ingested == 2
    assert eng.sql(
        "SELECT max(id) AS m FROM sink"
    ).collect()[0].m == 8


def test_stream_is_super_user_only(seng, spark):
    from beacon_spark.auth import AuthError

    eng = seng
    eng.sql("CREATE USER ana WITH PASSWORD 'pw'")
    for stmt in ["CREATE STREAM sx ON 'p' INTO sink", "RUN STREAM sx",
                 "DROP STREAM sx"]:
        with pytest.raises(AuthError, match="super-user"):
            eng.sql(stmt, user="ana")
    # SHOW STREAMS is read-only metadata, like SHOW CRAWLERS
    assert eng.sql("SHOW STREAMS", user="ana").collect() == []


def test_scheduled_streams_run_due(seng, spark, tmp_path):
    """WITH ('schedule' '30s') streams join the crawler scheduler's
    sweep: due immediately when never run, then not due again until the
    interval elapses."""
    from beacon_spark.streaming.ingest import run_due_streams

    eng = seng
    _write_files(spark, tmp_path / "sched", 0, 3)
    eng.sql("CREATE STREAM ss ON 'sched' INTO sink WITH ('schedule' '30s')")
    # unscheduled streams are ignored by the sweep
    eng.sql("CREATE STREAM manual ON 'sched2' INTO sink")
    out = run_due_streams(eng)
    assert [(r[0], r[2]) for r in out] == [("ss", 3)]
    # within the interval: not due
    assert run_due_streams(eng) == []
    # after the interval: due again, but nothing new → zero rows
    import time

    later = time.time() + 31
    out = run_due_streams(eng, now=later)
    assert [(r[0], r[2]) for r in out] == [("ss", 0)]
    with pytest.raises(Exception, match="bad stream schedule"):
        eng.sql("CREATE STREAM bad ON 'p' INTO sink "
                "WITH ('schedule' 'soon')")


def test_insert_marker_makes_replay_idempotent(seng, spark):
    """The (stream, batch_id) marker commits atomically with the rows:
    a foreachBatch replay after a crash-between-commit-and-checkpoint
    must no-op instead of double-ingesting."""
    eng = seng
    mt = eng.catalog.table("sink")
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    v1 = mt.insert(df, stream_marker=("s-abc", 0))
    assert mt._read_manifest().get("stream_batches") == {"s-abc": 0}
    # replay of the same batch: same version back, no new rows
    assert mt.insert(df, stream_marker=("s-abc", 0)) == v1
    assert spark.read.parquet(mt.data_dir).count() == 3
    # markers survive unrelated DML (carried through every manifest write)
    eng.sql("UPDATE sink SET v = v + 1 WHERE id = 0")
    assert mt.insert(df, stream_marker=("s-abc", 0)) == mt.current_version()
    assert mt.read().count() == 3
    # the NEXT batch lands normally (reading through the manifest —
    # the engine-side invalidation is _feed's job, pinned separately)
    v2 = mt.insert(df, stream_marker=("s-abc", 1))
    assert v2 > v1
    assert mt.read().count() == 6


def test_stream_prefix_rejects_traversal(seng):
    import pytest as _p

    for bad in ("../outside", "a/../../b", "/etc/spool"):
        with _p.raises(ValueError, match="bad stream prefix"):
            seng.sql(f"CREATE STREAM sx ON '{bad}' INTO sink")


def test_failing_stream_does_not_starve_later_streams(seng, spark, tmp_path):
    """One permanently-failing scheduled stream must not block
    alphabetically-later streams in the scheduler sweep."""
    from beacon_spark.streaming.ingest import run_due_streams

    eng = seng
    # 'aaa' has a glob prefix whose directory never appears → load fails
    eng.sql("CREATE STREAM aaa ON 'ghost/*.parquet' INTO sink WITH ('schedule' '1s')")
    _write_files(spark, tmp_path / "ok", 0, 2)
    eng.sql("CREATE STREAM bbb ON 'ok' INTO sink WITH ('schedule' '1s')")
    out = run_due_streams(eng, now=9e9)
    assert ("bbb", 1, 2) in [(r[0], r[1], r[2]) for r in out]
    assert eng.sql("SELECT count(*) AS n FROM sink").collect()[0].n == 2

"""Structured Streaming smoke: the streaming tumbling-window plan over the
events fixture produces the same result as the batch path (same F.window
expression, incremental execution)."""

from pyspark.sql import functions as F

from beacon_spark.streaming.windows import stream_events, tumbling_window_agg


def test_stream_matches_batch(spark, sf_small):
    q = stream_events(spark, f"{sf_small}/events.parquet", window="1 hour",
                      query_name="t_stream")
    q.awaitTermination(120)

    streamed = spark.sql("SELECT * FROM t_stream")
    batch = tumbling_window_agg(
        spark.read.parquet(f"{sf_small}/events.parquet"), window="1 hour"
    ).select("window_start", "event_type", "n_events")

    s = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b and len(s) > 0


def test_stateful_operator_matches_batch(spark, sf_small):
    """applyInPandasWithState per-user running stats == batch aggregate
    (single availableNow batch drives state once per user)."""
    from beacon_spark.streaming.windows import stream_user_state

    q = stream_user_state(spark, f"{sf_small}/events.parquet", query_name="u_state")
    q.awaitTermination(120)

    streamed = spark.sql("SELECT user_id, n_events, sum_value FROM u_state")
    batch = (
        spark.read.parquet(f"{sf_small}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("sum_value"),
        )
    )
    s = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b and len(s) > 0


def test_stream_dedup_exact_matches_batch(spark, sf_small, tmp_path):
    """Streaming content-hash dedup == batch dropDuplicates on the same
    key (whole-stream exact mode)."""
    from beacon_spark.streaming.dedup import dedup_key_expr, stream_dedup_exact

    # stage a corpus with real duplicates: the fixture twice, ids offset
    src_df = spark.read.parquet(f"{sf_small}/documents.parquet")
    dup_dir = str(tmp_path / "dup_docs")
    src_df.union(
        src_df.withColumn("doc_id", src_df.doc_id + 1_000_000)
    ).coalesce(2).write.mode("overwrite").parquet(dup_dir)

    q = stream_dedup_exact(spark, dup_dir, query_name="d_exact")
    q.awaitTermination(120)
    streamed = spark.sql("SELECT __key FROM d_exact")
    batch = (
        spark.read.parquet(dup_dir)
        .withColumn("__key", dedup_key_expr("text"))
        .dropDuplicates(["__key"])
        .select("__key")
    )
    s = sorted(r[0] for r in streamed.collect())
    b = sorted(r[0] for r in batch.collect())
    assert s == b and len(s) > 0
    # every text appears twice -> dedup halved the stream
    assert len(s) == spark.read.parquet(dup_dir).count() // 2


def test_stream_dedup_stateful_counts(spark, sf_small, tmp_path):
    """Custom stateful dedup: per-key first_id/n_dups equals the batch
    groupBy answer."""
    from pyspark.sql import functions as F

    from beacon_spark.streaming.dedup import dedup_key_expr, stream_dedup_stateful

    src_df = spark.read.parquet(f"{sf_small}/documents.parquet")
    dup_dir = str(tmp_path / "dup_docs_state")
    src_df.union(
        src_df.withColumn("doc_id", src_df.doc_id + 1_000_000)
    ).coalesce(2).write.mode("overwrite").parquet(dup_dir)

    q = stream_dedup_stateful(spark, dup_dir, query_name="d_state")
    q.awaitTermination(120)
    streamed = spark.sql("SELECT key, first_id, n_dups FROM d_state")
    batch = (
        spark.read.parquet(dup_dir)
        .withColumn("key", dedup_key_expr("text"))
        .groupBy("key")
        .agg(
            F.min("doc_id").alias("first_id"),
            (F.count(F.lit(1)) - 1).alias("n_dups"),
        )
    )
    s = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b and len(s) > 0
    assert any(r[2] > 0 for r in s)  # real duplicates counted


def test_sliding_window_semantics(spark, sf_small):
    """1h/30m sliding windows: every event lands in exactly two windows,
    and a spot-checked window's count equals the direct range filter."""
    from pyspark.sql import functions as F

    from beacon_spark.streaming.windows import _ensure_timestamp, sliding_window_agg

    events = spark.read.parquet(f"{sf_small}/events.parquet")
    out = sliding_window_agg(events, window="1 hour", slide="30 minutes",
                             group_cols=[])
    total_events = events.count()
    assert out.agg(F.sum("n_events")).collect()[0][0] == 2 * total_events

    first = out.orderBy("window_start").limit(3).collect()
    start = first[1].window_start  # a fully-interior window
    direct = (
        _ensure_timestamp(events, "ts")
        .filter(
            (F.unix_timestamp("ts") >= start)
            & (F.unix_timestamp("ts") < start + 3600)
        )
        .count()
    )
    assert {r.window_start: r.n_events for r in first}[start] == direct


def test_stateful_ops_handle_multi_chunk_groups(spark, tmp_path):
    """applyInPandasWithState hands a large group to `update` as MULTIPLE
    Arrow chunks: last_type must be the latest-ts event of the whole
    batch (not of the last chunk) and first_id the global minimum."""
    import pandas as pd

    from beacon_spark.streaming.dedup import stream_dedup_stateful
    from beacon_spark.streaming.windows import stream_user_state

    # one user, rows ordered ts DESCENDING so the max-ts event sits in
    # the FIRST chunk once the batch splits
    pdf = pd.DataFrame({
        "event_id": [9, 5, 4, 3, 2],
        "ts": [5_000_000_000, 4_000_000_000, 3_000_000_000,
               2_000_000_000, 1_000_000_000],
        "user_id": [7, 7, 7, 7, 7],
        "event_type": ["latest", "b", "c", "d", "e"],
        "value": [1.0, 1.0, 1.0, 1.0, 1.0],
    })
    p = str(tmp_path / "chunked.parquet")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(p)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        q = stream_user_state(spark, p, query_name="chunked_state")
        q.processAllAvailable(); q.stop()
        row = spark.sql("SELECT * FROM chunked_state").collect()[0]
        assert row.n_events == 5 and row.last_type == "latest"

        # same-text docs → one key group of 5 rows split across chunks;
        # first_id must be the global minimum event id
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [9, 5, 4, 3, 2],
                          "text": ["same text"] * 5})
        ).coalesce(1).write.parquet(str(tmp_path / "dup.parquet"))
        q2 = stream_dedup_stateful(
            spark, str(tmp_path / "dup.parquet"), query_name="chunked_dedup")
        q2.processAllAvailable(); q2.stop()
        r = spark.sql("SELECT * FROM chunked_dedup").collect()[0]
        assert r.first_id == 2 and r.n_dups == 4
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_user_state_late_batch_keeps_latest_event(spark, tmp_path):
    """r10 streaming review: a later micro-batch of LATE (older-ts)
    events overwrote 'last_type'; the state now carries the event time
    and only a genuinely newer event replaces it. maxFilesPerTrigger=1
    forces the two files into two micro-batches of one run (the file
    source processes oldest-mtime first)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from beacon_spark.streaming import windows as W

    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(pa.table({
        "user_id": [42], "ts": pa.array([10_000_000], pa.timestamp("us")),
        "value": [1.0], "event_type": ["purchase"],
    }), str(d / "b1.parquet"))
    time.sleep(1.1)  # distinct mtimes order the micro-batches
    pq.write_table(pa.table({
        "user_id": [42], "ts": pa.array([5_000_000], pa.timestamp("us")),
        "value": [2.0], "event_type": ["view"],
    }), str(d / "b2.parquet"))
    q = W.stream_user_state(spark, str(d), query_name="u_late",
                            max_files_per_trigger=1)
    q.awaitTermination()
    rows = spark.table("u_late").collect()
    final = {r.n_events: r for r in rows}
    assert 2 in final, rows  # two micro-batches reached the state
    assert final[2].last_type == "purchase"
    assert final[2].sum_value == 3.0

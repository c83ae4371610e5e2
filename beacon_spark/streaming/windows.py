"""Structured Streaming extension (SURVEY.md §2.12: the reference has NO
streaming engine — this is the north-star extension over the ``events``
fixture, not parity).

The window builders work identically on batch and streaming DataFrames
(same ``F.window``/``F.session_window`` expressions), so batch tests and
the DuckDB oracle validate the exact aggregation semantics that the
streaming path executes incrementally with watermark-bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stream_reader(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None):
    """readStream over a parquet file/directory: schema from the parquet
    footer (readStream needs one explicitly; the footer tracks whatever
    physical type the fixture carries — ns-as-long under nanosAsLong,
    µs TIMESTAMP_NTZ, …). A single-file path narrows a directory stream
    with a glob filter, since file sources need a directory."""
    from beacon_spark.sources import bytesource as bs

    reader = spark.readStream.schema(
        spark.read.parquet(bs.spark_path(path)).schema).format("parquet")
    if max_files_per_trigger:
        # bound the micro-batch: tests use 1 to exercise cross-batch
        # state; production caps per-batch memory with it
        reader = reader.option(
            "maxFilesPerTrigger", str(int(max_files_per_trigger)))
    if bs.isfile(path):
        # byte-source helpers, not os.path: an object-store URI is never
        # an os.path file, and Spark needs the s3:// → s3a:// mapping
        reader = reader.option("pathGlobFilter", bs.basename(path))
        path = bs.dirname(path)
    return reader.load(bs.spark_path(path))


def _ensure_timestamp(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP: ns-as-long
    (nanosAsLong reads) → µs timestamps; TIMESTAMP_NTZ (parquet
    timestamp without tz) → TIMESTAMP (session tz is pinned UTC, so the
    cast is value-preserving)."""
    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        return df.withColumn(
            ts_col, F.expr(f"timestamp_micros(CAST({ts_col} DIV 1000 AS BIGINT))")
        )
    if dt == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time windows; window start surfaced as an epoch-
    seconds BIGINT so results hash portably across engines."""
    df = _ensure_timestamp(df, ts_col)
    group_cols = group_cols if group_cols is not None else ["event_type"]
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    df = _ensure_timestamp(df, ts_col)
    group_cols = group_cols if group_cols is not None else ["event_type"]
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *group_cols,
            "n_events",
        )
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
) -> DataFrame:
    """Sessionization with a dynamic-length session window (gap timeout)."""
    df = _ensure_timestamp(df, ts_col)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def stream_events(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "events_stream",
):
    """readStream over the events parquet → watermarked tumbling-window
    counts → memory sink. ``availableNow`` + ``processAllAvailable`` lets a
    batch of files drive the streaming query to completion synchronously
    (the local smoke path; production swaps source/sink, the plan is the
    same)."""
    stream = (
        _ensure_timestamp(file_stream_reader(spark, path), "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    # complete mode so the final (watermark-open) windows are emitted when a
    # bounded file batch drives the stream; a production append-mode sink
    # would rely on later data advancing the watermark instead.
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    return q


def stream_user_state(
    spark: SparkSession,
    path: str,
    query_name: str = "user_state_stream",
    max_files_per_trigger: int | None = None,
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event count, value sum, last event type), state
    carried across micro-batches. This is the pattern for operators the
    built-in windows can't express (counters, CDC merge, custom
    sessionization); Arrow-batched per group, state is a tiny tuple.

    .. warning:: **checkpoint compatibility** — the state schema gained a
       fourth field (``last_us``, the latest event-time in µs) when the
       late-batch fix landed; a stream resuming from a checkpoint written
       by the earlier 3-field state will fail (or misbind) state
       deserialization. When upgrading across that change, start from a
       fresh checkpoint directory or pass a new ``query_name`` so Spark
       derives a new checkpoint location.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, sum_value double, last_type string"
    state_schema = "n bigint, total double, last string, last_us bigint"

    def update(key, pdfs, state: GroupState):
        n, total, last, last_us = (
            state.get if state.exists else (0, 0.0, None, None))
        # the group may arrive as MULTIPLE Arrow chunks (maxRecordsPerBatch);
        # sorting per chunk would take 'last' from the last CHUNK, not the
        # latest-ts event of the batch — concat first, sort once (STABLE,
        # or tied timestamps pick a nondeterministic winner)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("ts", kind="stable")
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            # 'last' means latest EVENT TIME across the whole stream:
            # the state carries its timestamp, so a later micro-batch
            # of late (older-ts) events no longer overwrites it — the
            # in-batch concat/sort defended exactly this semantics
            batch_us = int(pd.Timestamp(pdf["ts"].iloc[-1]).value // 1000)
            if last_us is None or batch_us >= last_us:
                last = pdf["event_type"].iloc[-1]
                last_us = batch_us
        state.update((n, total, last, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(total, 4)],
                "last_type": [last],
            }
        )

    src = _ensure_timestamp(
        file_stream_reader(spark, path, max_files_per_trigger), "ts")
    stream = (
        src
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    return (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )

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

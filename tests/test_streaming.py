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

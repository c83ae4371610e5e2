"""Streaming exact deduplication — stateful drop-duplicates across
micro-batches (SURVEY.md §2.12 north-star extension; the reference has
no streaming engine).

Two tiers:

  - ``stream_dedup_exact``: Spark's built-in
    ``dropDuplicatesWithinWatermark`` on a content hash — state is
    watermark-bounded, so it runs forever on unbounded input. This is
    the production path: dedup state for keys older than the watermark
    is reclaimed, trading exactly-once dedup for bounded memory (the
    standard streaming-dedup contract).
  - ``stream_dedup_stateful``: ``applyInPandasWithState`` keeping a
    per-key seen flag — exact across the whole stream (state grows with
    distinct keys; right when the key space is bounded, e.g. a day's
    document ids). Demonstrates the custom-stateful-operator pattern
    for semantics the built-ins can't express.

At scale both shard state by key across executors (state-store
partitioning follows the groupBy hash), so throughput scales with the
cluster, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beacon_spark.streaming.windows import _ensure_timestamp, file_stream_reader


def dedup_key_expr(text_col: str = "text"):
    """Content key: xxhash64 of whitespace-normalized text (same
    fingerprint family as pipeline/text.py) — JVM-side, no UDF."""
    return F.xxhash64(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def stream_dedup_exact(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    query_name: str = "dedup_stream",
):
    """readStream → first-seen row per content hash → memory sink.
    With ``ts_col`` the state is watermark-bounded
    (``dropDuplicatesWithinWatermark``); without, whole-stream exact
    (``dropDuplicates`` — state unbounded, batch-replay/testing use)."""
    df = file_stream_reader(spark, path).withColumn(
        "__key", dedup_key_expr(text_col))
    if ts_col is not None:
        df = _ensure_timestamp(df, ts_col).withWatermark(ts_col, watermark)
        deduped = df.dropDuplicatesWithinWatermark(["__key"])
    else:
        deduped = df.dropDuplicates(["__key"])
    q = (
        deduped.select(id_col, "__key")
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q


def stream_dedup_stateful(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_name: str = "dedup_state_stream",
):
    """Exact whole-stream dedup as a custom stateful operator:
    ``applyInPandasWithState`` grouped by content hash; state = the
    first-seen id + a duplicate counter, emitted once per key per batch
    so downstream sees (key, first_id, n_dups_so_far)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("first_id", T.LongType()),
            T.StructField("n_dups", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("first_id", T.LongType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        first_id, n_seen = state.get if state.exists else (None, 0)
        # concat the group's Arrow chunks BEFORE taking the minimum:
        # a per-chunk sort would record the first id of the first CHUNK,
        # not the batch's deterministic minimum
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            batch_min = int(pdf[id_col].min())
            first_id = batch_min if first_id is None else min(first_id, batch_min)
            n_seen += len(pdf)
        state.update((first_id, n_seen))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "first_id": [first_id],
                "n_dups": [n_seen - 1],
            }
        )

    stream = (
        file_stream_reader(spark, path)
        .withColumn("__key", dedup_key_expr(text_col))
        .groupBy("__key")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return q

"""Corpus-preparation operators for training-data pipelines.

Beyond the reference's surface (north-star family, like pipeline/dedup
and pipeline/text): the operations that sit between "cleaned documents"
and "training shards" at 100 TB.

Scale design:
  - ``chunk_documents`` is a pure map stage (split → sequence → slice →
    posexplode), all Catalyst — no shuffle, no Python; chunk count per
    doc is O(words/stride).
  - ``decontaminate`` broadcasts the EVAL n-gram set (eval suites are
    KB–MB scale) and left-anti-joins the training corpus's exploded
    n-grams against it — the corpus shuffles nothing; contaminated ids
    ride a second broadcast into the final anti-join. The standard
    13-gram exact-match decontamination (GPT-3 appendix C / Gopher
    sec. A.3 methodology).
  - ``export_shards`` repartitions ONCE by a seeded hash of the id —
    deterministic shard assignment independent of input partitioning —
    and sorts within shards so output files are byte-stable given
    stable input; one shuffle, then a straight parquet write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents", "decontaminate", "export_shards"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into word-bounded chunks of ``max_words`` with
    ``overlap`` words carried between consecutive chunks — the
    context-window packing step of a tokenize→pack pipeline. Returns
    (id_col, chunk_id, n_words, <text_col> = the chunk text).

    One Catalyst expression per row: the words array is let-bound (see
    dedup._shingles_sql for why), chunk starts are a ``sequence`` with
    the stride, each chunk an ``array_join(slice(...))``."""
    if not 0 <= overlap < max_words:
        raise ValueError("need 0 <= overlap < max_words")
    stride = max_words - overlap
    chunks = (
        f"transform(array(split(trim({text_col}), '\\\\s+')), ws -> "
        f"transform(sequence(1, greatest(size(ws), 1), {stride}), "
        f"s -> array_join(slice(ws, s, {max_words}), ' ')))[0]"
    )
    return (
        df.select(F.col(id_col), F.posexplode(F.expr(chunks)))
        .select(
            id_col,
            F.col("pos").alias("chunk_id"),
            F.size(F.split(F.col("col"), r"\s+")).alias("n_words"),
            F.col("col").alias(text_col),
        )
        # drop the empty trailing chunk a stride landing exactly at the
        # end would produce (sequence is inclusive of the start bound)
        .filter(F.length(text_col) > 0)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 13,
    mode: str = "remove",
) -> DataFrame:
    """Exact n-gram decontamination: drop (or flag) training documents
    containing any word n-gram that appears in the evaluation set.

    ``mode='remove'`` returns the clean corpus; ``mode='flag'`` returns
    (id_col, contaminated). The eval n-gram set is hashed to 64-bit
    (xxhash64) and BROADCAST — the train side only explodes and
    anti-joins; document payloads never shuffle."""
    from beacon_spark.pipeline.dedup import _shingles_sql

    if mode not in ("remove", "flag"):
        raise ValueError("mode must be remove|flag")
    eval_text_col = eval_text_col or text_col
    eval_grams = (
        eval_df.select(
            F.explode(
                F.expr(f"transform({_shingles_sql(eval_text_col, n)}, s -> xxhash64(s))")
            ).alias("__g")
        ).distinct()
    )
    train_grams = train.select(
        F.col(id_col).alias("__cid"),
        F.explode(
            F.expr(f"transform({_shingles_sql(text_col, n)}, s -> xxhash64(s))")
        ).alias("__g"),
    )
    contaminated = (
        train_grams.join(F.broadcast(eval_grams), "__g")
        .select("__cid")
        .distinct()
    )
    if mode == "flag":
        return train.select(id_col).distinct().join(
            F.broadcast(contaminated.withColumn("__f", F.lit(True))),
            F.col(id_col) == F.col("__cid"),
            "left",
        ).select(
            id_col, F.coalesce(F.col("__f"), F.lit(False)).alias("contaminated")
        )
    return train.join(
        F.broadcast(contaminated), train[id_col] == F.col("__cid"), "left_anti"
    )


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    mode: str = "error",
) -> int:
    """Write the corpus as ``n_shards`` deterministic training shards:
    shard = pmod(xxhash64(id, seed), n_shards) — stable across runs and
    input partitionings — written ``partitionBy(__shard)`` with rows
    sorted by id within each shard. Returns n_shards.

    One shuffle (the repartition on the shard key); readers get
    partition pruning on ``__shard`` for free."""
    out = (
        df.withColumn(
            "__shard",
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)).cast("int"),
        )
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", id_col)
    )
    out.write.mode(mode).partitionBy("__shard").parquet(path)
    return n_shards

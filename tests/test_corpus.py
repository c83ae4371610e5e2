"""Corpus-prep operators: chunking, decontamination, shard export
(pipeline/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from beacon_spark.pipeline.corpus import (
    chunk_documents,
    decontaminate,
    export_shards,
)


def test_chunk_documents_exact_cover(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = chunk_documents(df, max_words=4).orderBy("chunk_id").collect()
    assert [r.text.split() for r in out] == [
        words[0:4], words[4:8], words[8:10]]
    assert [r.n_words for r in out] == [4, 4, 2]
    assert [r.chunk_id for r in out] == [0, 1, 2]


def test_chunk_documents_overlap_and_short(spark):
    words = [f"w{i}" for i in range(7)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "solo")], "doc_id long, text string"
    )
    out = chunk_documents(df, max_words=4, overlap=2)
    rows = {(r.doc_id, r.chunk_id): r.text.split() for r in out.collect()}
    # stride 2: starts at word 0, 2, 4, 6
    assert rows[(1, 0)] == words[0:4]
    assert rows[(1, 1)] == words[2:6]
    assert rows[(1, 2)] == words[4:7]
    assert rows[(1, 3)] == words[6:7]
    assert rows[(2, 0)] == ["solo"]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_words=4, overlap=4)


def test_chunk_documents_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan  # pure map stage


def test_decontaminate(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated training text about spark plans"),
            (3, "prefix words then the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "eid long, text string",
    )
    clean = decontaminate(train, eval_df, n=9)
    assert sorted(r.doc_id for r in clean.collect()) == [2]
    flags = {
        r.doc_id: r.contaminated
        for r in decontaminate(train, eval_df, n=9, mode="flag").collect()
    }
    assert flags == {1: True, 2: False, 3: True}
    # the eval side rides a broadcast — corpus payloads never shuffle
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_export_shards_deterministic(spark, tmp_path):
    df = spark.range(200).selectExpr("id AS doc_id", "concat('t', id) AS text")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_shards(df, p1, n_shards=8, seed=7)
    # different input partitioning, same seed -> identical shard contents
    export_shards(df.repartition(13), p2, n_shards=8, seed=7)
    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    assert a.count() == 200
    for s in range(8):
        ra = sorted(r.doc_id for r in a.filter(F.col("__shard") == s).collect())
        rb = sorted(r.doc_id for r in b.filter(F.col("__shard") == s).collect())
        assert ra == rb and len(ra) > 0
    # partition pruning on the shard key reaches the scan
    pruned = a.filter(F.col("__shard") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "__shard" in pf.group(1) and "3" in pf.group(1)


def test_chunk_documents_reconstructs(spark):
    """Non-overlapping chunks concatenate back to the original word
    sequence for arbitrary word counts around the stride boundaries."""
    rows = [
        (n, " ".join(f"w{n}_{i}" for i in range(n)))
        for n in [1, 3, 4, 5, 7, 8, 9, 15, 16, 17, 33]
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_words=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, _text in rows:
        chunks = sorted(by_doc[n], key=lambda r: r.chunk_id)
        words = [w for c in chunks for w in c.text.split()]
        assert words == [f"w{n}_{i}" for i in range(n)], n
        assert all(c.n_words <= 8 for c in chunks)

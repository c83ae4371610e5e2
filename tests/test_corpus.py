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
    # stride 2, starts stop at size - overlap = 5: a start at word 6
    # would emit words[6:7], a strict SUBSTRING of chunk 2 (duplicate
    # training text) — r8 review fix
    assert rows[(1, 0)] == words[0:4]
    assert rows[(1, 1)] == words[2:6]
    assert rows[(1, 2)] == words[4:7]
    assert (1, 3) not in rows
    assert rows[(2, 0)] == ["solo"]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_words=4, overlap=4)
    # every chunk past the first contributes NEW trailing words
    out2 = chunk_documents(df, max_words=4, overlap=1)
    texts = [r.text.split() for r in
             out2.filter("doc_id = 1").orderBy("chunk_id").collect()]
    for t in texts:
        assert len(" ".join(t).split()) > 0
    # full coverage: the union of chunks is the whole document
    assert sorted({w for t in texts for w in t}) == sorted(words)


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


def test_split_corpus_deterministic_and_complete(spark):
    from beacon_spark.pipeline.corpus import split_corpus

    df = spark.range(5000).selectExpr("id AS doc_id")
    out = split_corpus(df, weights={"train": 8, "val": 1, "test": 1}, seed=3)
    counts = {r.split: r.n for r in
              out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000
    # weights are relative: ~80/10/10
    assert 0.75 < counts["train"] / 5000 < 0.85
    # pure function of (id, seed): repartitioned input agrees row-for-row
    again = split_corpus(df.repartition(13), weights={"train": 8, "val": 1,
                                                      "test": 1}, seed=3)
    assert out.exceptAll(again).count() == 0
    # a different seed shuffles the assignment
    other = split_corpus(df, weights={"train": 8, "val": 1, "test": 1}, seed=4)
    assert out.exceptAll(other).count() > 0


def test_split_corpus_md5_matches_xxhash_semantics(spark):
    from beacon_spark.pipeline.corpus import split_corpus

    df = spark.range(2000).selectExpr("id AS doc_id")
    md5 = split_corpus(df, hash_fn="md5")
    frac = md5.filter("split = 'train'").count() / 2000
    assert 0.95 < frac < 1.0  # 98% default


def test_sample_deterministic(spark):
    from beacon_spark.pipeline.corpus import sample_deterministic

    df = spark.range(10_000).selectExpr("id AS doc_id")
    s = sample_deterministic(df, 0.25, seed=1)
    n = s.count()
    assert 0.22 * 10_000 < n < 0.28 * 10_000
    # membership is stable under re-evaluation and repartitioning
    assert s.exceptAll(sample_deterministic(df.repartition(7), 0.25, seed=1)) \
            .count() == 0
    # nested property: a smaller fraction is a subset of a larger one
    s10 = sample_deterministic(df, 0.10, seed=1)
    assert s10.exceptAll(s).count() == 0


def test_quantize_embeddings_roundtrip_error(spark):
    import math

    from beacon_spark.pipeline.corpus import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.5, -2.0, 1.25, 0.0]), (2, [1e-4, 3e-4, -2e-4, 5e-5]),
         (3, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = quantize_embeddings(df).collect()
    by_id = {r.vec_id: r for r in out}
    r1 = by_id[1]
    assert max(abs(q) for q in r1.embedding_q) == 127  # max maps to ±127
    # dequantized values within half a quantization step
    step = r1.embedding_q_scale
    for orig, q in zip([0.5, -2.0, 1.25, 0.0], r1.embedding_q):
        assert math.isclose(orig, q * step, abs_tol=step / 2 + 1e-9)
    # tiny magnitudes still span the int8 range (per-vector scale)
    assert max(abs(q) for q in by_id[2].embedding_q) == 127
    # all-zero vector: quantizes to zeros without dividing by zero
    assert by_id[3].embedding_q == [0, 0, 0, 0]


def test_pack_sequences_invariants(spark):
    """pack_sequences (pipeline/corpus.py): every document lands in
    exactly one sequence, no sequence exceeds the budget (except a
    singleton oversize doc), seq_tokens equals the member sum, and the
    assignment is deterministic."""
    from beacon_spark.pipeline.corpus import pack_sequences

    rows = [(i, 100 + (i * 37) % 900) for i in range(200)]
    rows.append((1000, 5000))  # oversize: alone in its sequence
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    out = pack_sequences(df, max_tokens=2048, n_bins_partitions=4).collect()
    assert len(out) == 201  # every doc exactly once
    assert len({r.doc_id for r in out}) == 201

    from collections import defaultdict

    seqs = defaultdict(list)
    for r in out:
        seqs[r.seq_id].append(r)
    for sid, members in seqs.items():
        total = sum(m.n_tokens for m in members)
        assert all(m.seq_tokens == total for m in members), sid
        if len(members) > 1:
            assert total <= 2048, (sid, total)
    # the oversize doc is alone
    (big,) = [r for r in out if r.doc_id == 1000]
    assert len(seqs[big.seq_id]) == 1 and big.seq_tokens == 5000
    # first-fit-decreasing should fill bins well on uniform-ish sizes
    multi = [sum(m.n_tokens for m in ms) for ms in seqs.values()
             if len(ms) > 1]
    assert multi and sum(multi) / (len(multi) * 2048) > 0.7
    # deterministic across runs
    out2 = pack_sequences(df, max_tokens=2048, n_bins_partitions=4).collect()
    assert {(r.doc_id, r.seq_id) for r in out2} == {
        (r.doc_id, r.seq_id) for r in out}


def test_first_fit_bins_matches_linear_scan():
    """VERDICT r7 nit: the segment-tree placement (_FirstFitBins) must
    reproduce the linear leftmost-fit scan EXACTLY — same bin for every
    doc — it only changes the cost of finding that bin."""
    import numpy as np

    from beacon_spark.pipeline.corpus import _FirstFitBins

    rng = np.random.RandomState(9)
    budget = 1000
    sizes = sorted(
        (int(s) for s in rng.randint(1, 1400, size=2000)), reverse=True)

    def linear(seq):
        remaining, assign = [], []
        for t in seq:
            for b, rem in enumerate(remaining):
                if rem >= t:
                    remaining[b] = rem - t
                    assign.append(b)
                    break
            else:
                remaining.append(max(budget - t, 0))
                assign.append(len(remaining) - 1)
        return assign

    bins = _FirstFitBins()
    got = [bins.place(t, budget) for t in sizes]
    assert got == linear(sizes)
    # zero-size and exact-fit edges
    edge = [1000, 1000, 500, 500, 0, 0, 3]
    bins2 = _FirstFitBins()
    assert [bins2.place(t, budget) for t in edge] == linear(edge)


def test_first_fit_bins_perf_is_log_not_linear():
    """Perf pin for the many-small-docs partition (bins ~ n): 20k docs
    of size 1 into budget-1 bins opens 20k bins; the tree must do
    O(n log n) node visits (~0.3M), nowhere near the linear scan's
    n^2/2 (~200M)."""
    import math

    from beacon_spark.pipeline.corpus import _FirstFitBins

    n = 20_000
    bins = _FirstFitBins()
    for _ in range(n):
        bins.place(1, 1)
    assert bins.ops < 6 * n * math.log2(n)


def test_pack_sequences_unchanged_by_tree_placement(spark):
    """End-to-end invariants hold after the placement-structure swap:
    budget respected, every doc covered exactly once, deterministic."""
    from beacon_spark.pipeline.corpus import pack_sequences

    rows = [(i, 1 + (i * 37) % 900) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, max_tokens=1024, n_bins_partitions=4).collect()
    assert len(out) == 400 and len({r.doc_id for r in out}) == 400
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r)
    for seq, members in by_seq.items():
        tot = sum(r.n_tokens for r in members)
        assert tot == members[0].seq_tokens
        assert tot <= 1024 or len(members) == 1  # oversize doc alone
    out2 = pack_sequences(df, max_tokens=1024, n_bins_partitions=4).collect()
    assert {(r.doc_id, r.seq_id) for r in out2} == \
        {(r.doc_id, r.seq_id) for r in out}

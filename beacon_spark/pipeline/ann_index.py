"""Persisted ANN index: build once, probe many (partition-pruned scans).

The inline probes in :mod:`beacon_spark.pipeline.similarity` compute the
bucket/cell column per query, which is a full-corpus scan per probe. This
module is the scale path the reference's Lance indexes play for tabular
data (reference: beacon-core/src/statement_plan/actions.rs:763-820 —
CREATE INDEX accelerating scans): the corpus is written ONCE partitioned
by coarse cell (``__cell=<k>/`` directories), and a probe reads only the
``nprobe`` nearest cells' directories. At 100 TB a probe therefore
touches ``nprobe / n_cells`` of the data — partition pruning happens at
the file-listing level, independent of Catalyst, because the probe
enumerates the pruned directories explicitly.

Cell assignment stays JVM-side (Catalyst expression) for small indexes;
past a codegen-safety threshold it switches to an Arrow-batched pandas
UDF with the centroid matrix broadcast to executors — O(batch x cells)
BLAS per batch, never a SQL literal per centroid (fixes the
O(n_cells x dim) codegen blowup of ``ivf_cell_expr``).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from beacon_spark.sources import bytesource as bs
from beacon_spark.pipeline.similarity import (
    _CODEGEN_LIMIT,  # noqa: F401  (re-export: tests pin the threshold here)
    _hyperplanes,
    assign_buckets,
    assign_cells,
    cosine_expr,
    ivf_train_centroids,
)

META_FILE = "_ann_index.json"


def ann_build(
    df: DataFrame,
    path: str,
    method: str = "ivf",
    n_cells: int = 16,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_n: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> dict[str, Any]:
    """Build the persisted index: assign a coarse cell to every vector and
    write the corpus ``partitionBy("__cell")``. One full pass over the
    data (the expensive step runs exactly once, at ingest), after which
    every probe is a pruned read.

    Returns the metadata dict, also persisted as ``_ann_index.json``
    inside the index directory (underscore-prefixed -> invisible to
    Spark's parquet listing).
    """
    if method == "ivf":
        centroids = ivf_train_centroids(
            df, n_cells, vec_col, id_col, sample_n=sample_n, iters=iters, seed=seed
        )
        cell = assign_cells(df, centroids, vec_col)
        meta: dict[str, Any] = {
            "method": "ivf",
            "n_cells": int(n_cells),
            "centroids": centroids.tolist(),
        }
    elif method == "lsh":
        sample = df.select(vec_col).first()
        if sample is None or sample[0] is None:
            raise ValueError(
                f"no vectors in column {vec_col!r} (empty corpus cannot "
                "build an LSH index)")
        dim = len(sample[0])
        planes = _hyperplanes(dim, n_planes, seed)
        cell = assign_buckets(df, planes, vec_col)
        meta = {
            "method": "lsh",
            "n_planes": int(n_planes),
            "planes": planes.tolist(),
        }
    else:
        raise ValueError(f"unknown ANN index method {method!r} (ivf|lsh)")

    # record the id column's Spark type so an all-miss probe's empty
    # frame matches a hitting probe's schema exactly (string ids etc.)
    id_type = dict(df.dtypes).get(id_col, "bigint")
    meta.update({"vec_col": vec_col, "id_col": id_col,
                 "id_type": id_type, "version": 1})
    (
        df.withColumn("__cell", cell)
        .write.mode("overwrite")
        .partitionBy("__cell")
        .parquet(bs.spark_path(path))
    )
    bs.publish_bytes(bs.join(path, META_FILE), json.dumps(meta).encode())
    return meta


def _load_meta(path: str) -> dict[str, Any]:
    return json.loads(bs.read_text(bs.join(path, META_FILE)))


def _probe_cells(meta: dict[str, Any], query: list[float], nprobe: int) -> list[int]:
    q = np.asarray(query, dtype=np.float64)
    if meta["method"] == "ivf":
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        cent = np.asarray(meta["centroids"], dtype=np.float64)
        order = np.argsort(-(cent @ qn))
        return [int(c) for c in order[:nprobe]]
    planes = np.asarray(meta["planes"], dtype=np.float64)
    base = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, q)) > 0))
    if nprobe <= 1:
        return [base]
    # multiprobe: also flip the planes the query is closest to (smallest
    # |margin|), the standard LSH multiprobe order.
    margins = np.abs(planes @ q)
    flips = np.argsort(margins)
    cells = [base]
    for i in flips:
        if len(cells) >= nprobe:
            break
        cells.append(base ^ (1 << int(i)))
    return cells


def ann_probe(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k probe against a built index: list the ``nprobe`` nearest
    cells' directories and read ONLY those (file-listing-level partition
    pruning — the scan's ``inputFiles()`` is a strict subset of the
    corpus). Exact cosine + TakeOrdered within the probed cells."""
    meta = _load_meta(path)
    cells = _probe_cells(meta, query, nprobe)
    # bytesource isdir/join cover object-store URIs too — raw os.path
    # calls on an s3:// index would silently prune EVERY cell
    dirs = [
        bs.join(path, f"__cell={c}")
        for c in cells
        if bs.isdir(bs.join(path, f"__cell={c}"))
    ]
    if not dirs:
        idc = meta["id_col"].replace("`", "``")
        return spark.createDataFrame(
            [], f"`{idc}` {meta.get('id_type', 'bigint')}, cosine double")
    df = spark.read.option("basePath", bs.spark_path(path)).parquet(
        *bs.spark_paths(dirs))
    return (
        df.select(
            F.col(meta["id_col"]),
            F.round(cosine_expr(meta["vec_col"], query), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(meta["id_col"]))
        .limit(k)
    )

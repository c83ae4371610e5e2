#!/usr/bin/env python3
"""100× scale probe: wall-clock growth of the headline shapes at 100×
rows (key-shifted replication, join keys in lockstep — the bench.py
sf1 derivation at factor 100).

The point: at sf0.1 the shapes take well under a second, so a plan
that silently degrades super-linearly (a broadcast that stops
broadcasting, a shuffle whose partitioning collapses, a sort that
spills) is invisible. 60M-row lineitem makes it visible. A healthy
engine shows sub-100× (usually ≈1-15×) wall-clock at 100× data —
fixed overheads amortize and the plans stay the plans.

Usage: python scripts/scale_probe.py [--factor 100]
Prints one JSON line: {"factor": N, "base": {...}, "scaled": {...},
"ratio": {...}, "calibration": {...}}.  Derivation is cached in the
temp dir keyed by (factor, source dir); first run pays the write.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = ["pricing_summary", "date_trunc_agg", "window_topk",
                 "top_orders", "dedup_exact", "tumbling_window"]
# r13 (r12 verdict #4): the pipeline operators whose 100-TB claims
# previously rested on plan-reading alone — now probed at 10x/100x on a
# derived documents/embeddings corpus. r14 (r13 verdict #4) adds the
# remaining unprobed trio: span_dedup (salted hot-key join), semdedup
# (mega-cell auto-split), pack_sequences (FFD segment tree).
PIPELINE_QUERIES = ["minhash_lsh_pairs", "dedup_clusters",
                    "cosine_pairs_lsh", "ann_ivf_probe",
                    "span_dedup", "semantic_dedup", "pack_sequences"]
TABLES = {
    "lineitem": {"l_orderkey": 1_000_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 100_000_000},
    "customer": {"c_custkey": 100_000_000},
    "events": {"event_id": 10_000_000_000, "user_id": 100_000_000},
    "documents": {"doc_id": 1_000_000_000},
    "embeddings": {"vec_id": 1_000_000_000},
}


def _derive(spark, src: str, factor: int) -> str:
    from pyspark.sql import functions as F

    # v2: documents text is SALTED per replica (a replica token every
    # 4 words, so word-3-gram jaccard across replicas falls to ~0.14 —
    # cloned text would make every planted duplicate group 100x larger
    # and the candidate-pair count grow QUADRATICALLY, a property of
    # the cloning, not the algorithm); embeddings are rolled by
    # (replica % dim) positions (cosine structure preserved within a
    # replica, decorrelated across). Cache key bumped accordingly.
    dst = os.path.join(
        tempfile.gettempdir(), "beacon-spark-bench",
        f"x{factor}-v2-from-{os.path.basename(src.rstrip('/'))}")
    marker = os.path.join(dst, "_READY")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    for tbl, shifts in TABLES.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        if tbl == "embeddings":
            dim = len(df.select("embedding").first()[0])
        reps = []
        for i in range(factor):
            rep = df
            for col, off in shifts.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * off))
            if tbl == "documents" and i:
                rep = rep.withColumn("text", F.regexp_replace(
                    "text", r"((\S+\s+){4})", f"$1r{i} "))
            if tbl == "embeddings" and i % dim:
                r = i % dim
                rep = rep.withColumn("embedding", F.expr(
                    f"concat(slice(embedding, {r + 1}, "
                    f"size(embedding) - {r}), slice(embedding, 1, {r}))"))
            reps.append(rep)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionAll(r)
        out.write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet")
        print(f"  derived {tbl} x{factor}", file=sys.stderr)
    open(marker, "w").close()
    return dst


def _export_probe(spark, factor: int) -> dict:
    """Regrid NetCDF-4 export wall at 1× vs factor× CELLS (sparse synth
    grid, rows = cells/200). The r14 merge-fill keeps driver memory
    O(chunk) regardless of grid size — maxrss is recorded per leg so a
    regression back to a dense per-variable grid (8 B × cells) shows up
    as a multi-GB jump on the scaled leg."""
    import resource
    import shutil

    from pyspark.sql import functions as F

    from beacon_spark.outputs import _write_netcdf_nd_streamed

    out: dict = {}
    for label, cells in (("base", 4_000_000),
                         ("scaled", 4_000_000 * factor)):
        n = int(cells ** 0.5)
        rows = max(cells // 200, 10_000)
        df = (spark.range(rows)
              .select((F.col("id") % n).alias("x"),
                      ((F.col("id") * 7919) % n).alias("y"),
                      (F.col("id").cast("double") * 0.5).alias("v")))
        d = tempfile.mkdtemp(prefix="beacon-export-probe-")
        try:
            t0 = time.perf_counter()
            _write_netcdf_nd_streamed(df, os.path.join(d, "g.h5"),
                                      ["x", "y"], flavor="netcdf4")
            out[label] = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        out[f"{label}_maxrss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
        print(f"  export {label}: {out[label]}s ({cells} cells, "
              f"maxrss {out[f'{label}_maxrss_gb']} GB)", file=sys.stderr)
    out["ratio"] = round(out["scaled"] / out["base"], 1)
    return out


def main() -> None:
    factor = 100
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from beacon_spark.session import get_spark

    spark = get_spark(app_name="beacon_scale_probe",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    import bench
    import __spark_entry__ as entry

    calibration = bench._calibration(spark)
    queries = dict(entry.queries())
    probe_list = list(PROBE_QUERIES)
    if "--no-pipeline" not in sys.argv:
        probe_list += PIPELINE_QUERIES
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
        probe_list = [q for q in probe_list if q in only]
    for q in probe_list:
        if q not in queries:
            queries[q] = getattr(entry, f"_q_{q}")

    big = _derive(spark, src, factor)

    def run(sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for _ in range(2):  # best-of-2
            for q in probe_list:
                t0 = time.perf_counter()
                n = queries[q](spark, sf_dir).count()
                e = round(time.perf_counter() - t0, 3)
                out[q] = min(out.get(q, e), e)
                print(f"  {sf_dir.rsplit('/',1)[-1]} {q}: {e:.3f}s "
                      f"({n} rows)", file=sys.stderr)
        return out

    base = run(src)
    scaled = run(big)
    result = {
        "factor": factor,
        "calibration": calibration,
        "base": base,
        "scaled": scaled,
        "ratio": {q: round(scaled[q] / base[q], 1) for q in probe_list},
    }
    if "--exports" in sys.argv:
        result["exports"] = _export_probe(spark, factor)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

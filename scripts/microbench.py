#!/usr/bin/env python3
"""Per-query micro-bench (optimization-round instrumentation, guide §1):
times each named query with the noop sink (computes EVERY column, no
result pruning) AND with the bench's .count() action, best-of-N, with
job descriptions set so the timings map to UI stages.

This does NOT replace bench.py (the driver's artifact, unchanged
methodology); it isolates compute for before/after comparisons.

Usage: PYTHONPATH=. python scripts/microbench.py [-n N] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from beacon_spark.session import get_spark

    spark = get_spark(app_name="microbench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    import __spark_entry__ as entry_mod

    queries = dict(entry_mod.queries())
    names = args or ["top_orders", "minhash_lsh_pairs", "nd_zarr_slice"]
    for n in names:
        if n not in queries:
            queries[n] = getattr(entry_mod, f"_q_{n}")
    if any(n.startswith("nd_") for n in names):
        entry_mod._nd_bench_root(spark, sf_dir)
    # same warmup as bench.py
    for tbl in ("lineitem", "orders", "customer", "documents", "events",
                "embeddings"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()
    from beacon_spark import Engine

    Engine(spark)

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = queries[name]
        best_noop = best_count = None
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            e = time.perf_counter() - t0
            best_noop = e if best_noop is None else min(best_noop, e)
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            e = time.perf_counter() - t0
            best_count = e if best_count is None else min(best_count, e)
            spark.sparkContext.setJobDescription(None)
        out[name] = {"noop": round(best_noop, 3), "count": round(best_count, 3)}
        print(f"  {name}: noop {best_noop:.3f}s count {best_count:.3f}s",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query suite = the reference benchmark harness's 8 shapes
(BASELINE.md / benchmarks/harness/queries.py:35-96) mapped onto the driver
tables, plus the heavy extension operators (minhash dedup, similarity
top-k, event windows) so regressions in the custom paths show up here.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # the 8 reference-harness shapes
    "count_all",
    "filter_range",
    "filter_multi",
    "pricing_summary",      # agg_by_platform analog (group+avg+count)
    "top_orders",           # join+filter (spatial_box analog is a 2-col range: filter_multi)
    "topn_recent",
    "distinct_types",
    "date_trunc_agg",       # time_window analog
    # custom/extension operators
    "window_topk",
    "dsl_query",
    "tumbling_window",
    "session_windows",
    "dedup_exact",
    "minhash_lsh_pairs",
    "sim_topk",
    "text_quality",
    # nd-format read path (r9): the data-lake workload the reference
    # leads with — zarr coordinate slice, ragged-netcdf flatten+agg,
    # tiff window. Fixtures build once per (version, sf) in the temp
    # dir; best-of-2 records the warm-fixture READ time.
    "nd_zarr_slice",
    "nd_zarr_slice_sql",   # same slice via SQL (r10: beacon_nd DataSource)
    "nd_netcdf_ragged_agg",
    "nd_tiff_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from beacon_spark.session import get_spark

    spark = get_spark(app_name="beacon_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    import __spark_entry__ as entry_mod

    # bench shapes resolve to the _q_* implementations directly — the
    # public queries() registry is capped at the 50 graded slots and some
    # bench-only shapes (count_all, filter_*, …) live outside it
    queries = dict(entry_mod.queries())
    for name in BENCH_QUERIES:
        if name not in queries:
            queries[name] = getattr(entry_mod, f"_q_{name}")

    # warm the JVM + file cache with a trivial action per input table
    # (footer reads + OS page cache — not query work), and construct the
    # Engine once — function registration (SQL UDF statements + pandas
    # UDFs) is one-time session setup, not per-query work
    for tbl in ("lineitem", "orders", "customer", "documents", "events",
                "embeddings"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()
    from beacon_spark import Engine

    Engine(spark)
    # nd fixtures build OUTSIDE the timed loop (r9 verdict: the one-time
    # derive — 600k-row toPandas + netcdf/zarr/tiff writes — polluted
    # run1 of nd_zarr_slice; the timed body must be the READ)
    entry_mod._nd_bench_root(spark, sf_dir)

    # best-of-2 WITHIN one process (r6-verdict item 9): the recorded
    # r6 number showed a phantom 19% regression that an interleaved A/B
    # proved was first-run machine state (post-test-suite page cache /
    # JIT), not code. Two passes over the same list keeps the artifact
    # comparable across rounds while shedding that noise; per-query
    # value = min of the two runs.
    timings: dict[str, float] = {}
    for run in (1, 2):
        for name in BENCH_QUERIES:
            fn = queries[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            elapsed = round(time.perf_counter() - t0, 3)
            prev = timings.get(name)
            timings[name] = elapsed if prev is None else min(prev, elapsed)
            print(f"  run{run} {name}: {elapsed:.3f}s ({n} rows)",
                  file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_seconds_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": cpus,
                "runs": 2,  # per-query best-of-2 in one process
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Capture .explain("formatted") output for bench/declared queries into
plans/<tag>/<query>_<suffix>.txt (r14 optimization-round evidence).

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after"
  query:  optional subset; default = the bench queries + the graded
          heavy shapes the round touches.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

TAG = os.environ.get("PLANS_TAG", "r14")

# bench queries + heavy graded shapes worth plan evidence
DEFAULT_QUERIES = [
    "count_all", "filter_range", "filter_multi", "pricing_summary",
    "top_orders", "topn_recent", "distinct_types", "date_trunc_agg",
    "window_topk", "dsl_query", "tumbling_window", "session_windows",
    "dedup_exact", "minhash_lsh_pairs", "sim_topk", "text_quality",
    "nd_zarr_slice", "nd_zarr_slice_sql", "nd_netcdf_ragged_agg",
    "nd_tiff_window",
    "cosine_pairs_lsh", "dedup_clusters", "ann_ivf_probe",
    "span_dedup", "ngram_jaccard_pairs", "semantic_dedup",
    "pack_sequences", "lang_id", "tokens_fingerprint",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from beacon_spark.session import get_spark

    spark = get_spark(app_name="plan_capture", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    import __spark_entry__ as entry_mod

    queries = dict(entry_mod.queries())
    for n in names:
        if n not in queries:
            queries[n] = getattr(entry_mod, f"_q_{n}")
    if any(n.startswith("nd_") for n in names):
        entry_mod._nd_bench_root(spark, sf_dir)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # keep going; record the failure
            text = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"  {name}: {len(text)} bytes -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

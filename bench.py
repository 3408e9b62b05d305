"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the 4-stage
pipeline at the reference's design scale (1M generated orders,
mirroring java_code/gen_1m_csv.py).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# perf-representative slice of the suite: scans+joins+aggs, windows,
# sessionization, merge, dedup (LSH path, not the quadratic verifier),
# similarity, text stats.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "run_steps_join",
    "upsert_merge",
    "running_total_per_customer",
    "tumbling_hourly_agg",
    "sliding_window_counts",
    "sessionize_users",
    "dedup_exact_fingerprint",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_cosine_bruteforce",
    "ann_rhp_lsh",
    "ann_ivf_topk",
    "text_stats",
    "lang_id_heuristic",
    "token_count_bpeish",
    "asof_click_before_purchase",
    "revenue_rollup_region_nation",
    "chargram_min_fingerprint",
    "json_props_extract",
]


def run_query(spark, fn, sf_dir) -> int:
    df = fn(spark, sf_dir)
    # count() forces the full plan without driver-side row materialization
    return df.count()


def bench_pipeline_1m(spark) -> float:
    from automated_data_pipeline_spark.runner import PipelineRunner
    from automated_data_pipeline_spark.sources.generators import generate_orders

    work = tempfile.mkdtemp(prefix="adp-bench-")
    try:
        csv_dir = os.path.join(work, "orders_1m")
        generate_orders(spark, 1_000_000).write.option("header", True).csv(csv_dir)
        runner = PipelineRunner(spark, os.path.join(work, "wh"))
        t0 = time.time()
        runner.run(source_path=csv_dir, pipeline_name="Bench1M")
        return time.time() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    from automated_data_pipeline_spark.session import get_spark
    from automated_data_pipeline_spark.suite import all_specs

    spark = get_spark("adp-bench")
    specs = {s.name: s for s in all_specs()}
    timings: dict[str, float] = {}

    for name in HEADLINE:
        fn = specs[name].fn
        run_query(spark, fn, SF_DIR)  # warm (scan caching, codegen)
        t0 = time.time()
        run_query(spark, fn, SF_DIR)
        timings[name] = round(time.time() - t0, 3)

    timings["pipeline_1m_orders"] = round(bench_pipeline_1m(spark), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    out = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Dump formatted physical plans for representative suite queries into
PLANS.md, with the scale-relevant properties called out per plan
(pushed filters, pruned read schemas, join strategies, codegen spans,
exchange counts).

This is the review artifact for "is the plan the one you'd want at
100 TB": the pytest plan assertions (tests/test_scale_plans.py) pin
the properties mechanically; this file makes them human-inspectable.

Usage: python tools/explain_suite.py [sf_dir]  (writes PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWN = [
    ("pricing_summary", "scan+filter+agg: pushdown and pruning reach the parquet scan"),
    ("shipping_priority_top10", "3-way join + top-k: broadcast dims, TakeOrderedAndProject"),
    ("small_quantity_parts_revenue", "decorrelated scalar subquery: aggregate self-join"),
    # dedup_minhash_lsh is NOT regenerable: the operator checkpoint-
    # materializes its result (cache lifecycle), so the returned frame's
    # plan is a bare ExistingRDD scan. Its real plan lives in the
    # MANUAL NOTES tail of PLANS.md, preserved across regenerations.
    ("capped_sample_per_lang", "window rank: single shuffle on the group key"),
    ("upsert_merge", "merge upsert: anti-join + union"),
    ("pack_sequences_128", "sequence packing: one shuffle on the shard key, per-shard cumsum window"),
    ("decontaminate_vs_holdout", "decontamination: corpus side map-only, benchmark n-grams broadcast"),
    ("mixture_sample_by_lang", "mixture resampling: narrow explode, no shuffle, no exchange"),
    ("scd2_status_history", "SCD2 build: two window passes over one key shuffle, no self-join"),
    ("tfidf_top_terms_per_doc", "TF-IDF: linear explode+agg, broadcast df-table join back"),
    ("embedding_int8_quantize", "int8 quantization: map-only, zero exchanges"),
    ("salted_join_priority_revenue", "salted fact-dim join: hot keys spread across salt replicas"),
    ("nation_pair_volume", "Q7-shape 6-way join: broadcast dims, two big-table shuffles"),
    ("pit_features_7d", "point-in-time features: one key shuffle, single RANGE-frame window pass"),
    ("semdedup_prune", "SemDeDup: pairwise cosine confined to cluster equi-join, no cartesian"),
    ("gopher_repetition", "Gopher repetition: two explode streams off one tokenize scan, partial aggs"),
    ("nearest_centroid_assign", "nearest centroid: 10-row centroid table broadcast to the vector scan"),
    ("data_quality_report", "expectation suite: all boolean rules in ONE scan per table, exploded report"),
    ("late_lines_priority_class", "Q12 shape: one equi-join shuffle, scans pruned to 3 columns each"),
    ("promo_revenue_share", "Q14 shape: part broadcast, single small groupBy shuffle"),
    ("disjunctive_parts_revenue", "Q19 shape: OR-of-ANDs evaluates map-side after broadcast dim join"),
    ("idle_rich_customers_by_segment", "Q22 shape: broadcast scalar + LEFT ANTI existence join"),
    ("audio_feature_extract", "audio codec loop: two chained ArrowEvalPython/mapInPandas stages, no exchange"),
    ("video_frame_sample_features", "video loop: APNG build/sample/decode as three chained mapInPandas, zero exchanges"),
    # round-5 additions
    ("regional_cheapest_supplier", "Q2 shape: region-filtered supplier dim broadcast into ONE lineitem scan, WindowGroupLimit rank pushdown"),
    ("waiting_orders_suppliers", "Q21 shape: one per-order conditional agg (no lineitem self-joins), supplier broadcast"),
    ("important_parts_by_nation", "Q11 shape: per-nation window over the aggregated frame — parallel, never global"),
    ("hourly_heavy_hitters", "per-window top-k: (hour,user) partial agg then per-hour rank window"),
    ("token_budget_prefix", "two-phase ordered cumsum: range exchange + partition-keyed windows + broadcast offsets (no single-reducer window)"),
    # round-5 second wave (hll_rollup_user_days is NOT regenerable —
    # its register frame is localCheckpoint-materialized, see the
    # manual tail)
    ("kmv_distinct_user_days", "KMV sketch: distinct-reduce on (type, hash), rank window over distinct hashes only"),
    ("hll_distinct_user_days", "HLL sketch: ONE (type,bucket) max-agg exchange; estimate is a scalar projection"),
    ("cms_heavy_users", "Count-Min: sketch from per-item counts (never raw events), 384-cell table broadcast into probes"),
    ("kmv_overlap_types", "theta set algebra: everything after the distinct-reduce runs on k-row sketch frames"),
    ("bloom_decontaminate", "Bloom decontamination: m-bit filter broadcast; probe is a row-wise bit semi join"),
    ("dup_span_detect", "span dedup: doc-spread shingle hash, HAVING-filtered dup side broadcast, island windows reuse doc partitioning"),
    ("fuzzy_supplier_match", "Hamming<=1 matching: masked-variant equi-join (precise candidates), levenshtein verify"),
    ("promo_discount_revenue_band", "Q6 shape: every predicate pushed to the scan, zero joins"),
    ("nation_market_share", "Q8 shape: ONE fact exchange, five broadcast dimension joins"),
    ("top_supplier_by_quarter", "Q15 shape: filtered fact agg; 1-row decimal max broadcast back"),
    ("large_volume_orders", "Q18 shape: HAVING-filtered per-order agg broadcasts into orders+customer"),
    ("order_priority_late_check", "Q4 shape: quarter filter pushed into orders scan, LEFT SEMI join"),
    ("temporal_cv_folds", "temporal CV: one scan -> 5-row slice agg; folds derive from 5 rows"),
    # round-6: rewritten backfill + companions (the ANN companions are
    # NOT regenerable — their encoded frames are localCheckpoint-
    # materialized like dedup_minhash_lsh; their plan story is the
    # rows-only siblings' pins in tests/test_scale_plans.py)
    ("run_number_backfill", "A5 backfill at data scale: range exchange + per-partition row_number + broadcast offsets — no single-partition global window"),
    ("bpe_top_pairs", "BPE round-0 pair counts: explode off one word-freq agg, partial aggs, TakeOrderedAndProject"),
    ("approx_agg_accuracy", "approx-vs-exact twins: one partial+final agg pass computes HLL++, exact distinct, and both percentiles"),
    # round-7 curation additions (suite/round7.py)
    ("segment_dedup_c4", "C4 segment dedup: explicit seg_hash repartition shared by survivor agg + join-back (ReusedExchange at runtime — single tokenize pass)"),
    ("dsir_importance_topk", "DSIR weights: stats re-aggregated from (id,bucket) counts, <=256-row broadcast, totals as a bounded window — two scans (pushdown beats reuse on the filtered side)"),
    ("trigram_novelty_by_source", "trigram novelty: distinct gram hashes, min-doc agg, join-back; only 64-bit hashes shuffle"),
    ("lang_vocab_overlap", "vocab overlap: rank window runs on the POST-aggregation vocab frame, never raw tokens"),
    ("length_percentile_bands", "exact percentiles: single partial+final SortAggregate pass, 3-column pruned scan"),
    ("quality_logreg_buckets", "logreg quality filter: spread, then featurize+sigmoid as ONE codegen projection feeding a 10-bucket agg"),
]


def key_properties(plan: str) -> list[str]:
    out = []
    pushed = re.findall(r"PushedFilters: \[[^\]]+\]", plan)
    if pushed:
        out.append(f"pushed filters: {len(pushed)} scan(s) with non-empty pushdown")
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if reads:
        widths = [len(r.split(",")) for r in reads if r]
        out.append(f"read schemas: {widths} column(s) per scan (pruned)")
    for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
        n = plan.count(j)
        if n:
            out.append(f"{j}: {n}")
    n_ex = plan.count("Exchange")
    out.append(f"exchanges: {n_ex} (incl. reused)")
    # formatted mode marks codegen'd operators with a leading '*'
    n_cg = len(re.findall(r"[+:]- \* ", plan))
    out.append(f"codegen'd operators: {n_cg}")
    if "TakeOrderedAndProject" in plan:
        out.append("top-k: TakeOrderedAndProject (no global sort)")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from automated_data_pipeline_spark.session import get_spark
    import __spark_entry__ as entry

    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    # everything at/after the MANUAL NOTES marker survives regeneration
    marker = "<!-- MANUAL NOTES"
    manual_tail = ""
    if os.path.exists(plans_path):
        prev = open(plans_path).read()
        if marker in prev:
            manual_tail = prev[prev.index(marker):]

    spark = get_spark("explain-suite", shuffle_partitions=8)
    qs = entry.queries()
    lines = [
        "# PLANS — formatted physical plans for representative queries",
        "",
        f"Generated by `python tools/explain_suite.py {sf_dir}`. These are the",
        "*executed* plans (AQE final) at the stated sf; the properties each plan",
        "must keep are pinned by tests/test_scale_plans.py.",
        "",
    ]
    for name, why in SHOWN:
        df = qs[name](spark, sf_dir)
        df.collect()  # let AQE finalize
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        if "Scan ExistingRDD" in plan and plan.count("\n") < 12:
            print(f"SKIP {name}: checkpoint-materialized (bare ExistingRDD "
                  "scan) — document its plan in the MANUAL NOTES tail instead")
            continue
        lines.append(f"## {name}")
        lines.append("")
        lines.append(f"*{why}*")
        lines.append("")
        for p in key_properties(plan):
            lines.append(f"- {p}")
        lines.append("")
        lines.append("```")
        # keep the operator tree, drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        lines.append(tree)
        lines.append("```")
        lines.append("")
    with open(plans_path, "w") as f:
        f.write("\n".join(lines))
        if manual_tail:
            f.write("\n" + manual_tail)
    print(f"wrote PLANS.md ({len(SHOWN)} plans at {sf_dir}; "
          f"manual tail {'preserved' if manual_tail else 'ABSENT'})")


if __name__ == "__main__":
    main()

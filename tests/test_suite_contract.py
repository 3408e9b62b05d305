"""Guards on the driver contract: suite size, gate-window composition,
and the queries()/oracle_sql() pairing. The driver's correctness gate
runs exactly the FIRST 50 ``queries()`` entries in a vanilla session —
a spec added in the wrong place silently evicts a curated window entry,
which round 2 paid for. These assertions make that a loud failure."""

from __future__ import annotations

import json
import os

from automated_data_pipeline_spark.suite import GATE_WINDOW, all_specs

DOCUMENTED_TOTAL = 140
DOCUMENTED_WITH_ORACLE = 135

# The 28 oracle queries that had no driver CORRECTNESS row in rounds
# 1-3 and were rotated into the round-4 window (VERDICT r3 item 2).
ROTATED_IN_R4 = frozenset({
    "synthetic_orders_category_agg", "shipping_priority_top10",
    "returned_revenue_by_customer", "small_quantity_parts_revenue",
    "suppliers_high_volume_semi", "revenue_rollup_region_nation",
    "cube_status_priority", "pivot_priority_counts",
    "price_percentiles_by_priority", "segments_intersect",
    "segments_except", "distinct_users_per_type",
    "customer_order_histogram", "nation_pair_volume",
    "gap_fill_hourly_locf", "mixture_sample_by_lang",
    "pack_sequences_128", "decontaminate_vs_holdout",
    "minhash_containment_pairs", "tfidf_top_terms_per_doc",
    "embedding_int8_quantize", "dedup_keep_best_quality",
    "dedup_jaccard_blocked_lang", "chargram_min_fingerprint",
    "top_terms_en", "scd2_status_history", "salted_hot_key_agg",
    "salted_join_priority_revenue",
})

# The last 3 oracle queries with no driver row after round 4 (VERDICT
# r4 item 2): embedding_near_dup_lsh failed in r1 and was never
# re-gated; the other two were added after the r4 rotation froze.
ROTATED_IN_R5 = frozenset({
    "embedding_near_dup_lsh", "ewma_hourly_forecast",
    "split_leakage_audit",
})

# Displaced in r5; each is driver-green in CORRECTNESS_r04 and its
# family keeps a window representative (see suite/__init__.py comment).
ROTATED_OUT_R5 = frozenset({
    "segments_except", "ts_pattern_match", "length_vocab_correlation",
})

# Oracle-backed queries ADDED in round 5 (no driver row yet, by
# construction; they queue for the r6 rotation).
ADDED_IN_R5 = frozenset({
    "regional_cheapest_supplier", "waiting_orders_suppliers",
    "important_parts_by_nation", "rolling_daily_zscore",
    "hourly_heavy_hitters", "quality_decile_report",
    "token_budget_prefix", "top_bigrams_per_lang",
    # second wave: sketches, span dedup, fuzzy entity matching
    "kmv_distinct_user_days", "hll_distinct_user_days",
    "cms_heavy_users", "dup_span_detect", "fuzzy_supplier_match",
    "hll_rollup_user_days", "kmv_overlap_types",
    # late wave: five more canonical TPC-H shapes
    "promo_discount_revenue_band", "nation_market_share",
    "top_supplier_by_quarter", "large_volume_orders",
    "order_priority_late_check", "temporal_cv_folds",
    "bloom_decontaminate",
})


# Oracle-backed queries ADDED in round 6: companion queries giving the
# 5 rows-only operators driver-visible value evidence (suite/round6.py).
# Unlike prior rounds' additions they do NOT queue: VERDICT r5 item 4
# asks for them "gated in r6's window", so they rotate in immediately.
ADDED_IN_R6 = frozenset({
    "ann_ivf_exact_full_probe", "ann_pq_exact_rerank",
    "ann_ivfpq_exact_full", "bpe_top_pairs", "approx_agg_accuracy",
})

# The round-6 window = ADDED_IN_R5 (22, the only driver-unwitnessed
# oracle queries after r5) + ADDED_IN_R6 (5) + run_number_backfill
# (r1-r4 green but rewritten in r6 — new plan, fresh witness) + 22
# r5-green family representatives.
ROTATED_IN_R6 = ADDED_IN_R5 | ADDED_IN_R6 | {"run_number_backfill"}

# Displaced in r6; each is driver-green in CORRECTNESS_r05 and its
# family keeps a window representative (see suite/__init__.py comment).
ROTATED_OUT_R6 = frozenset({
    "small_quantity_parts_revenue", "suppliers_high_volume_semi",
    "cube_status_priority", "price_percentiles_by_priority",
    "distinct_users_per_type", "nation_pair_volume",
    "tfidf_top_terms_per_doc", "embedding_int8_quantize",
    "dedup_keep_best_quality", "chargram_min_fingerprint",
    "top_terms_en", "salted_join_priority_revenue",
    "audio_feature_extract", "audio_fingerprint_near_dup",
    "image_dhash_near_dup", "video_frame_sample_features",
    "late_lines_priority_class", "promo_revenue_share",
    "disjunctive_parts_revenue", "idle_rich_customers_by_segment",
    "source_mix_report", "label_centroids", "lm_bigram_fluency",
    "semdedup_prune", "gopher_repetition",
    "cross_doc_ngram_repetition", "nearest_centroid_assign",
    "vocab_coverage",
})


def test_suite_counts_match_documentation():
    specs = all_specs()
    assert len(specs) == DOCUMENTED_TOTAL
    assert sum(1 for s in specs if s.oracle is not None) == DOCUMENTED_WITH_ORACLE
    names = [s.name for s in specs]
    assert len(set(names)) == len(names), "duplicate query names"


def test_gate_window_is_exactly_the_first_50():
    specs = all_specs()
    assert len(GATE_WINDOW) == 50
    assert [s.name for s in specs[:50]] == GATE_WINDOW
    # every gated query must be oracle-checkable: a rows-only entry in
    # the window burns a slot on a weaker check
    rows_only = [s.name for s in specs[:50] if s.oracle is None]
    assert rows_only == []


def test_gate_window_rotation_covers_never_gated_queries():
    """Round-6 intent: the window carries EVERY oracle-backed query
    that still lacks a driver-green CORRECTNESS row — the 22 added in
    round 5 plus the 5 round-6 companions — plus the rewritten
    run_number_backfill, so that once CORRECTNESS_r06 lands green the
    never-witnessed set is empty (derivable from the artifacts)."""
    missing = ROTATED_IN_R6 - set(GATE_WINDOW)
    assert not missing, f"rotated-in queries missing from window: {missing}"
    assert not (ROTATED_OUT_R6 & set(GATE_WINDOW)), "displaced names remain"
    # driver-green evidence from any prior round's artifact
    prev = set()
    for f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
              "CORRECTNESS_r03.json", "CORRECTNESS_r04.json",
              "CORRECTNESS_r05.json"):
        p = os.path.join(os.path.dirname(os.path.dirname(__file__)), f)
        if os.path.exists(p):
            rows = json.load(open(p))
            # only GREEN rows count as driver-witnessed (r1 recorded a
            # FAILED row for embedding_near_dup_lsh — that's exactly
            # why it had to rotate back in, in r5)
            prev |= {
                n for n, r in rows.items()
                if r.get("rows_match") and r.get("schema_match")
                and r.get("hash_match") and not r.get("err")
            }
    if prev:
        oracle_names = {s.name for s in all_specs() if s.oracle is not None}
        never_witnessed = oracle_names - prev - ADDED_IN_R6
        assert never_witnessed == ADDED_IN_R5, (
            f"never-witnessed set drifted: {never_witnessed ^ ADDED_IN_R5}"
        )
        # every never-witnessed name must be inside the r6 window
        assert (never_witnessed | ADDED_IN_R6) <= set(GATE_WINDOW)
        # displaced names must already have driver-green evidence
        assert ROTATED_OUT_R6 <= prev, "displaced a never-witnessed name"


def test_entry_module_contract():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) == DOCUMENTED_TOTAL
    assert len(o) == DOCUMENTED_WITH_ORACLE
    assert set(o) <= set(q)

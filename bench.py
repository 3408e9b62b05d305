"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the 4-stage
pipeline at the reference's design scale (1M generated orders,
mirroring java_code/gen_1m_csv.py).

Prints ONE JSON line — kept COMPACT (<1500 chars) because the driver
retains only the last 2000 chars of stdout (BENCH_r04.json came back
parsed:null when the full per-query map outgrew that): {"metric",
"value": total_sec, "unit": "sec", "sf", "n", "queries": {10 slowest},
"host_noise": {...}, "detail": "BENCH_DETAIL.json"}. The full
per-query timing map is written to BENCH_DETAIL.json alongside.

host_noise: the same fixed probe workload (a lineitem parquet
scan-count) timed at suite start and end — if the two probes disagree
by >1.5x the host was noisy during the run and cross-round timing
comparisons need salt (BASELINE.md documents 1.3-2x same-day swings
on this shared host).
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
    "dedup_clusters",
    "corpus_curation_funnel",
    "capped_sample_per_lang",
    "small_quantity_parts_revenue",
    "knn_cosine_bruteforce",
    "ann_rhp_lsh",
    "ann_ivf_topk",
    "text_stats",
    "lang_id_heuristic",
    "token_count_bpeish",
    "chunk_documents_64",
    "mixture_sample_by_lang",
    "pack_sequences_128",
    "decontaminate_vs_holdout",
    "minhash_containment_pairs",
    "tfidf_top_terms_per_doc",
    "embedding_int8_quantize",
    "scd2_status_history",
    "salted_hot_key_agg",
    "salted_join_priority_revenue",
    "pit_features_7d",
    "top_event_transitions",
    "asof_click_before_purchase",
    "conversion_funnel",
    "retention_cohorts",
    "revenue_rollup_region_nation",
    "customer_order_histogram",
    "nation_pair_volume",
    "chargram_min_fingerprint",
    "json_props_extract",
    "source_mix_report",
    "label_centroids",
    "multimodal_feature_extract",
    "semdedup_prune",
    "gopher_repetition",
    "cross_doc_ngram_repetition",
    "nearest_centroid_assign",
    "vocab_coverage",
    "data_quality_report",
    "ts_pattern_match",
    "length_vocab_correlation",
    "audio_feature_extract",
    "cluster_disjoint_split",
    "late_lines_priority_class",
    "promo_revenue_share",
    "disjunctive_parts_revenue",
    "idle_rich_customers_by_segment",
    "ann_pq_rerank_topk",
    "bpe_train_merges",
    "image_dhash_near_dup",
    "audio_fingerprint_near_dup",
    "video_frame_sample_features",
    "ewma_hourly_forecast",
    "split_leakage_audit",
    # round-5 additions
    "regional_cheapest_supplier",
    "waiting_orders_suppliers",
    "important_parts_by_nation",
    "rolling_daily_zscore",
    "hourly_heavy_hitters",
    "quality_decile_report",
    "token_budget_prefix",
    "top_bigrams_per_lang",
    # round-5 second wave: sketches, span dedup, fuzzy matching
    "kmv_distinct_user_days",
    "hll_distinct_user_days",
    "cms_heavy_users",
    "dup_span_detect",
    "fuzzy_supplier_match",
    "hll_rollup_user_days",
    "kmv_overlap_types",
    "promo_discount_revenue_band",
    "nation_market_share",
    "top_supplier_by_quarter",
    "large_volume_orders",
    "order_priority_late_check",
    "temporal_cv_folds",
    "bloom_decontaminate",
    # round-6 additions: exact-mode companions for the rows-only ops
    # (suite/round6.py) + the rewritten distributed run_number_backfill
    "ann_ivf_exact_full_probe",
    "ann_pq_exact_rerank",
    "ann_ivfpq_exact_full",
    "bpe_top_pairs",
    "approx_agg_accuracy",
    "run_number_backfill",
    # round-7 additions: published curation techniques (suite/round7.py)
    "segment_dedup_c4",
    "dsir_importance_topk",
    "trigram_novelty_by_source",
    "lang_vocab_overlap",
    "length_percentile_bands",
    "quality_logreg_buckets",
    "weighted_sample_es",
    # round-8 additions: domain/URL-level curation (suite/round8.py)
    "blocklist_filter_stats",
    "source_quality_quantile_gate",
    "ann_sq8_rerank",
    # round-9 additions: persisted-index ANN twins (suite/round9.py)
    "ann_sq8_persisted",
    "ann_pq_persisted_exact",
    "ann_ivfpq_persisted_exact",
    "ann_ivf_append_exact",
    "ann_ivfpq_append_exact",
    # round-10 additions: index lifecycle — deletion + generation
    # cutover — and the DSIR streaming twin (suite/round10.py)
    "ann_ivf_tombstone_exact",
    "ann_ivfpq_rebuild_exact",
    "dsir_weights_recovered",
    "trigram_novelty_recovered",
    "lang_vocab_overlap_recovered",
    # round-11 additions: retrieval + late curation (suite/round11.py)
    "bm25_top_docs",
    "temperature_resample_by_lang",
    "winnowing_overlap_pairs",
    "char_entropy_quality",
    "bm25_scores_recovered",
    "winnowing_pairs_recovered",
    "hard_negative_mining",
    "kneser_ney_doc_fluency",
    "kn_fluency_recovered",
    "zipf_fit_by_lang",
    "zipf_fit_recovered",
    "mmr_diversified_topk",
    "pmi_collocations_topk",
    "rrf_quality_fusion",
    # round 12
    "hybrid_rrf_retrieval",
    "pmi_collocations_recovered",
    "unimax_epoch_plan",
    # round 13
    "hybrid_rrf_ann",
    "unimax_plan_recovered",
    "margin_bitext_mine",
]


def run_query(spark, fn, sf_dir) -> int:
    df = fn(spark, sf_dir)
    # count() forces the full plan without driver-side row materialization
    return df.count()


def _gen_csv(spark, n_rows: int, path: str, offset: int = 0) -> None:
    from pyspark.sql import functions as F

    from automated_data_pipeline_spark.sources.generators import generate_orders

    df = generate_orders(spark, n_rows)
    if offset:
        df = df.withColumn(
            "OrderId",
            F.format_string(
                "ORD-%06d",
                (F.regexp_extract("OrderId", r"(\d+)", 1).cast("long") + offset).cast(
                    "int"
                ),
            ),
        )
    df.write.option("header", True).csv(path)


def _write_flat(work: str, src: str, df, name: str) -> None:
    """Stage a DataFrame as ONE flat json file inside ``src`` (the
    file-stream source doesn't recurse into part-file dirs; write,
    then hoist the single part file to a flat name). Shared by every
    streaming bench below."""
    d = os.path.join(work, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").json(d)
    part = next(f for f in os.listdir(d) if f.startswith("part-"))
    os.replace(os.path.join(d, part), os.path.join(src, name))


def bench_pipelines(spark) -> dict[str, float]:
    """B1/B2/B4: 4-stage pipeline at 100k and 1M rows, then a 1M re-run
    with 50% overlapping keys merging into the existing 1M-row target
    (invariant-checked: 1.5M rows after)."""
    from automated_data_pipeline_spark.runner import PipelineRunner

    out: dict[str, float] = {}
    # drop the query phase's persisted intermediates (shingle tables):
    # leftover cached blocks steal executor memory from the pipeline
    # shuffles and skew the measurement
    spark.catalog.clearCache()
    work = tempfile.mkdtemp(prefix="adp-bench-")
    try:
        csv_100k = os.path.join(work, "orders_100k")
        csv_1m = os.path.join(work, "orders_1m")
        csv_1m_b = os.path.join(work, "orders_1m_overlap")
        _gen_csv(spark, 100_000, csv_100k)
        _gen_csv(spark, 1_000_000, csv_1m)
        _gen_csv(spark, 1_000_000, csv_1m_b, offset=500_000)

        # warm: one tiny run compiles the whole stage/write codegen path
        # (queries above are warm-timed too)
        warm_csv = os.path.join(work, "orders_warm")
        _gen_csv(spark, 1_000, warm_csv)
        PipelineRunner(spark, os.path.join(work, "wh_warm")).run(
            source_path=warm_csv, pipeline_name="Warmup"
        )

        runner = PipelineRunner(spark, os.path.join(work, "wh_100k"))
        t0 = time.time()
        runner.run(source_path=csv_100k, pipeline_name="Bench100k")
        out["pipeline_100k_orders"] = round(time.time() - t0, 3)

        runner = PipelineRunner(spark, os.path.join(work, "wh_1m"))
        t0 = time.time()
        runner.run(source_path=csv_1m, pipeline_name="Bench1M")
        out["pipeline_1m_orders"] = round(time.time() - t0, 3)

        t0 = time.time()
        runner.run(source_path=csv_1m_b, pipeline_name="Bench1MRerun")
        out["upsert_rerun_1m"] = round(time.time() - t0, 3)
        n = runner.target.read(spark).count()
        assert n == 1_500_000, f"B4 invariant: expected 1.5M target rows, got {n}"
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def bench_stream_tumbling(spark, sf_dir: str) -> float:
    """B5: Structured Streaming micro-batch throughput — stream the
    events parquet through the watermarked tumbling-window aggregation
    (availableNow) into a memory sink."""
    from automated_data_pipeline_spark.streaming import windows as W
    from automated_data_pipeline_spark.suite import load
    from pyspark.sql import functions as F

    load(spark, sf_dir, "events")  # sets the nanosAsLong conf the schema read needs
    # the sf dir holds one parquet per table; scope to events via the
    # file name (pathGlobFilter applies to data file names)
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{sf_dir}/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = W.tumbling_counts(stream, window="1 hour", watermark="10 minutes")
    # volume-derived state width (r14): the windowed agg is state-
    # store-commit-bound — see streaming/state_sizing.py
    from automated_data_pipeline_spark.streaming.state_sizing import (
        volume_sized_shuffle,
    )

    t0 = time.time()
    with volume_sized_shuffle(spark, f"{sf_dir}/events.parquet"):
        q = (
            agg.writeStream.format("memory")
            .queryName("bench_tumbling")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="adp-bench-ckpt-"))
            .start()
        )
    q.awaitTermination()
    return round(time.time() - t0, 3)


def bench_stream_session(spark, sf_dir: str) -> float:
    """B5c: gap-based session windows (session_window + watermark) over
    the streamed events parquet — the stateful-window path, heavier than
    tumbling because sessions merge as rows arrive."""
    from automated_data_pipeline_spark.streaming import windows as W
    from automated_data_pipeline_spark.suite import load
    from pyspark.sql import functions as F

    load(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{sf_dir}/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = W.session_counts(stream, gap="30 minutes", watermark="10 minutes")
    from automated_data_pipeline_spark.streaming.state_sizing import (
        volume_sized_shuffle,
    )

    t0 = time.time()
    with volume_sized_shuffle(spark, f"{sf_dir}/events.parquet"):
        q = (
            agg.writeStream.format("memory")
            .queryName("bench_session")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="adp-bench-ckpt-"))
            .start()
        )
    q.awaitTermination()
    return round(time.time() - t0, 3)


def bench_stream_stream_join(spark, sf_dir: str) -> float:
    """B5d: watermark-bounded stream-stream join — purchases joined to
    each user's clicks within the prior hour. State on both sides is
    bounded by the watermark + time-range constraint."""
    from automated_data_pipeline_spark.streaming import windows as W
    from automated_data_pipeline_spark.suite import load
    from pyspark.sql import functions as F

    load(spark, sf_dir, "events")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def _events_stream():
        s = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        if dict(s.dtypes).get("ts") == "bigint":
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return s

    purchases = _events_stream().filter(F.col("event_type") == "purchase")
    clicks = _events_stream().filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    joined = W.stream_stream_join(
        purchases, clicks, on="user_id",
        left_ts="ts", right_ts="click_ts",
        within="1 hour", watermark="10 minutes",
    )
    from automated_data_pipeline_spark.streaming.state_sizing import (
        volume_sized_shuffle,
    )

    t0 = time.time()
    with volume_sized_shuffle(spark, f"{sf_dir}/events.parquet"):
        q = (
            joined.writeStream.format("memory")
            .queryName("bench_ssjoin")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="adp-bench-ckpt-"))
            .start()
        )
    q.awaitTermination()
    return round(time.time() - t0, 3)


def bench_stream_stateful_sessionize(spark, sf_dir: str) -> float:
    """B5e: custom keyed-state sessionization (applyInPandasWithState,
    event-time timeouts) — the Arrow-batched Python-state path, for
    session semantics session_window can't express (per-session value
    rollups with cross-batch out-of-order merge). Two sentinel batches
    push the watermark so every session's timeout fires."""
    import datetime as _dt

    from pyspark.sql import Row
    from automated_data_pipeline_spark.streaming.stateful import stateful_sessionize
    from automated_data_pipeline_spark.suite import load

    events = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    work = tempfile.mkdtemp(prefix="adp-bench-stateful-")
    src = os.path.join(work, "events")
    events.write.parquet(src)
    max_ts = events.agg({"ts": "max"}).first()[0]
    for delta_h in (2, 4):
        spark.createDataFrame(
            [Row(user_id=-1, ts=max_ts + _dt.timedelta(hours=delta_h), value=0.0)]
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 64
    ).parquet(src)
    out = stateful_sessionize(stream, gap="30 minutes", watermark="10 minutes")
    t0 = time.time()
    q = (
        out.writeStream.format("memory")
        .queryName("bench_stateful_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.awaitTermination()
    took = round(time.time() - t0, 3)
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_incremental_dedup(spark, sf_dir: str) -> float:
    """Incremental-dedup throughput: split the documents table into 4
    json micro-batch files (the 4th repeats the 1st — a full-batch
    duplicate), stream them through the fingerprint store, assert the
    curated output holds exactly the distinct-fingerprint corpus."""
    from automated_data_pipeline_spark.streaming.incremental_dedup import (
        FingerprintStore,
        start_incremental_dedup,
    )
    from automated_data_pipeline_spark.functions import text as TX
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="adp-bench-incdedup-")
    src = os.path.join(work, "in")
    parts = [
        docs.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    os.makedirs(src, exist_ok=True)


    for i, p in enumerate(parts):
        _write_flat(work, src, p, f"b{i}.json")
    _write_flat(work, src, parts[0], "b3.json")
    store = FingerprintStore(os.path.join(work, "fp"))
    out = os.path.join(work, "curated")
    t0 = time.time()
    q = start_incremental_dedup(
        spark, src, store, out, os.path.join(work, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    took = round(time.time() - t0, 3)
    n_out = spark.read.parquet(out).count()
    n_distinct = (
        docs.select(TX.fingerprint(F.col("text")).alias("f")).distinct().count()
    )
    assert n_out == n_distinct, f"incremental dedup: {n_out} != {n_distinct}"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_incremental_segments(spark, sf_dir: str) -> float:
    """Incremental segment-dedup throughput: documents in 3 json
    micro-batches + a full replay of the 1st, through the segment-hash
    store; asserts the curated corpus keeps exactly one occurrence of
    each distinct segment (the batch operator's survivor invariant,
    held incrementally)."""
    from automated_data_pipeline_spark.operators.spans import (
        segment_occurrences,
    )
    from automated_data_pipeline_spark.streaming.incremental_segments import (
        SegmentHashStore,
        start_incremental_segment_dedup,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="adp-bench-incseg-")
    src = os.path.join(work, "in")
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    os.makedirs(src, exist_ok=True)


    for i, p in enumerate(parts):
        _write_flat(work, src, p, f"b{i}.json")
    _write_flat(work, src, parts[0], "b3.json")
    store = SegmentHashStore(os.path.join(work, "seg"))
    out = os.path.join(work, "curated")
    # volume-derived shuffle width for the whole query lifetime (r14):
    # the seg-hash aggregation inside each micro-batch is shuffle-
    # bound on tiny batch data (values width-independent — the
    # survivor rule is a global min). The wrap covers awaitTermination
    # because the batch fn builds jobs from the OUTER session too.
    from automated_data_pipeline_spark.streaming.state_sizing import (
        volume_sized_shuffle,
    )

    t0 = time.time()
    with volume_sized_shuffle(spark, src):
        q = start_incremental_segment_dedup(
            spark, src, store, out, os.path.join(work, "ckpt"),
            available_now=True,
        )
        q.awaitTermination()
    took = round(time.time() - t0, 3)
    kept = spark.read.parquet(out).agg(F.sum("n_kept")).first()[0]
    n_distinct = (
        segment_occurrences(docs, "text", "doc_id")
        .select("seg_hash").distinct().count()
    )
    assert kept == n_distinct, f"incremental segments: {kept} != {n_distinct}"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_quality_scorer(spark, sf_dir: str) -> float:
    """Streaming quality-classifier throughput: documents in 3 json
    micro-batches scored at the published coefficients; asserts the
    merged per-batch summaries equal the batch scorer's whole-corpus
    histogram exactly (integer merge). No content-replay file here:
    unlike the dedup stores a scorer intentionally counts repeated
    content again — checkpoint-replay idempotence (same batch_key) is
    pytest-pinned instead (tests/test_quality_scorer_stream.py)."""
    from automated_data_pipeline_spark.streaming.quality_scorer import (
        batch_score_summary,
        start_quality_score_stream,
    )
    from automated_data_pipeline_spark.suite.round7 import _QLR
    from pyspark.sql import functions as F

    bias = _QLR["bias"]
    coefs = [_QLR["f_logtok"], _QLR["f_wlen"], _QLR["f_punct"],
             _QLR["f_stop"], _QLR["f_ttr"]]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    work = tempfile.mkdtemp(prefix="adp-bench-qscore-")
    src = os.path.join(work, "in")
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    os.makedirs(src, exist_ok=True)


    for i, p in enumerate(parts):
        _write_flat(work, src, p, f"b{i}.json")
    metrics = os.path.join(work, "metrics")
    t0 = time.time()
    q = start_quality_score_stream(
        spark, src, metrics, bias, coefs, os.path.join(work, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    took = round(time.time() - t0, 3)
    got = {
        r["bucket"]: (r["n"], r["s"]) for r in
        spark.read.parquet(metrics).groupBy("bucket")
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_p_i").alias("s"))
        .collect()
    }
    want = {
        r["bucket"]: (r["n_docs"], r["sum_p_i"]) for r in
        batch_score_summary(docs, 0, "text", bias, coefs).collect()
    }
    assert got == want, "stream quality summaries != batch histogram"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_source_stats(spark, sf_dir: str) -> float:
    """Per-source accumulator throughput: documents in 3 json
    micro-batches folded into the persistent SourceStatsStore; asserts
    the merged per-source totals equal the whole-corpus batch stats
    exactly (integer merge)."""
    from automated_data_pipeline_spark.streaming.source_stats import (
        SourceStatsStore,
        batch_source_stats,
        start_source_stats_stream,
    )
    from automated_data_pipeline_spark.suite.round7 import _QLR
    from pyspark.sql import functions as F

    bias = _QLR["bias"]
    coefs = [_QLR["f_logtok"], _QLR["f_wlen"], _QLR["f_punct"],
             _QLR["f_stop"], _QLR["f_ttr"]]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    work = tempfile.mkdtemp(prefix="adp-bench-srcstats-")
    src = os.path.join(work, "in")
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    os.makedirs(src, exist_ok=True)


    for i, p in enumerate(parts):
        _write_flat(work, src, p, f"b{i}.json")
    store = SourceStatsStore(os.path.join(work, "store"))
    t0 = time.time()
    q = start_source_stats_stream(
        spark, src, store, bias, coefs, os.path.join(work, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    took = round(time.time() - t0, 3)
    got = {
        r["source"]: (r["n"], r["c"], r["s"]) for r in
        store.read(spark).groupBy("source")
        .agg(F.sum("n_docs").alias("n"), F.sum("chars_total").alias("c"),
             F.sum("sum_p_i").alias("s"))
        .collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["chars_total"], r["sum_p_i"]) for r in
        batch_source_stats(docs, "text", bias, coefs).collect()
    }
    assert got == want, "stream source stats != batch totals"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_source_histogram(spark, sf_dir: str) -> float:
    """Quantile-gate streaming twin throughput: documents in 3 json
    micro-batches folded into the persistent per-(source, score)
    histogram store; asserts the gate report recovered from the store
    (n_total / n_kept / threshold / avg_kept per source) equals the
    batch source_quality_quantile_gate over the same corpus exactly."""
    from automated_data_pipeline_spark.operators import quality_model as QM
    from automated_data_pipeline_spark.streaming.source_histogram import (
        SourceScoreHistogramStore,
        recover_quantile_gate,
        start_source_histogram_stream,
    )
    from automated_data_pipeline_spark.suite import all_specs
    from automated_data_pipeline_spark.suite.round7 import _QLR
    from pyspark.sql import functions as F

    bias = _QLR["bias"]
    coefs = [_QLR[n] for n in QM.FEATURE_NAMES]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    work = tempfile.mkdtemp(prefix="adp-bench-srchist-")
    src = os.path.join(work, "in")
    os.makedirs(src, exist_ok=True)


    for i in range(3):
        _write_flat(work, src, docs.filter(F.col("doc_id") % 3 == i), f"b{i}.json")
    store = SourceScoreHistogramStore(os.path.join(work, "store"))
    t0 = time.time()
    q = start_source_histogram_stream(
        spark, src, store, bias, coefs, os.path.join(work, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    recovered = recover_quantile_gate(spark, store)
    got = [tuple(r) for r in recovered.collect()]
    took = round(time.time() - t0, 3)
    gate_fn = {s.name: s.fn for s in all_specs()}["source_quality_quantile_gate"]
    want = [tuple(r) for r in gate_fn(spark, sf_dir).collect()]
    assert got == want, "recovered gate != batch quantile gate"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_incremental_hll(spark, sf_dir: str) -> float:
    """Incremental distinct-count maintenance: the events table split
    into 4 json micro-batches (the 4th replaying the 1st), merged into
    the persistent HLL register store; asserts the replay left the
    estimate unchanged (the algebraic exactly-once property) and the
    estimate tracks the true per-type distinct user count."""
    from automated_data_pipeline_spark.streaming.incremental_sketch import (
        HllSketchStore,
        start_incremental_hll,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="adp-bench-inchll-")
    src = os.path.join(work, "in")
    os.makedirs(src, exist_ok=True)


    parts = [ev.filter(F.col("user_id") % 3 == i) for i in range(3)]
    for i, p in enumerate(parts):
        _write_flat(work, src, p, f"b{i}.json")
    _write_flat(work, src, parts[0], "b3.json")  # replay shard
    store = HllSketchStore(os.path.join(work, "hll"), ["event_type"], p=9)
    t0 = time.time()
    q = start_incremental_hll(
        spark, src, store, os.path.join(work, "ckpt"),
        item_expr=F.col("user_id").cast("string"),
        schema="user_id bigint, event_type string",
    )
    q.awaitTermination()
    took = round(time.time() - t0, 3)
    est = {r["event_type"]: r["hll_est"]
           for r in store.estimate(spark).collect()}
    true = {r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n")).collect()}
    for g, t in true.items():
        assert abs(est[g] - t) / t < 0.15, f"hll drift on {g}: {est[g]} vs {t}"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_incremental_lsh(spark, sf_dir: str) -> float:
    """Incremental NEAR-dup throughput: 3 json micro-batch shards of the
    documents table, the 3rd repeating the 1st (a full shard of
    near/exact dups), streamed against the persistent LSH bucket index.
    Asserts the replayed shard contributed nothing novel."""
    from automated_data_pipeline_spark.streaming.incremental_lsh import (
        LshStore,
        start_incremental_lsh_dedup,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="adp-bench-inclsh-")
    src = os.path.join(work, "in")
    os.makedirs(src, exist_ok=True)


    half = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    _write_flat(work, src, half[0], "b0.json")
    _write_flat(work, src, half[1], "b1.json")
    _write_flat(work, src, half[0].withColumn("doc_id", F.col("doc_id") + 1_000_000), "b2.json")
    store = LshStore(os.path.join(work, "lsh"))
    out = os.path.join(work, "curated")
    t0 = time.time()
    q = start_incremental_lsh_dedup(
        spark, src, store, out, os.path.join(work, "ckpt"), available_now=True
    )
    q.awaitTermination()
    took = round(time.time() - t0, 3)
    kept = spark.read.parquet(out)
    n_replayed_kept = kept.filter(F.col("doc_id") >= 1_000_000).count()
    assert n_replayed_kept == 0, f"replayed shard leaked {n_replayed_kept} docs"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_decontaminate(spark, sf_dir: str) -> float:
    """Incremental benchmark decontamination: the holdout docs'
    3-gram hashes arrive as 3 json shards (the 3rd replaying the 1st),
    merged into the persistent Bloom bit store; the whole corpus is
    then screened against the bits-so-far. Asserts no false negatives
    (every doc sharing an ingested gram is flagged — checked against
    the exact join) and that the replayed shard changed nothing."""
    from automated_data_pipeline_spark.operators.spans import shingle_positions
    from automated_data_pipeline_spark.streaming.decontamination import (
        BloomBitStore,
        decontaminate_batch,
        start_incremental_bloom,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bench_grams = (
        shingle_positions(docs.filter(F.col("doc_id") % 20 == 0), "text",
                          "doc_id", 3)
        .select(F.col("ghash").cast("string").alias("gram"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m_bits = 24 * bench_grams.count()
    work = tempfile.mkdtemp(prefix="adp-bench-decon-")
    src = os.path.join(work, "in")
    os.makedirs(src, exist_ok=True)


    shards = [
        bench_grams.filter(F.abs(F.hash("gram")) % 2 == i) for i in range(2)
    ]
    _write_flat(work, src, shards[0], "b0.json")
    _write_flat(work, src, shards[1], "b1.json")
    _write_flat(work, src, shards[0], "b2.json")  # replay shard
    store = BloomBitStore(os.path.join(work, "bloom"), m_bits=m_bits)
    t0 = time.time()
    q = start_incremental_bloom(
        spark, src, store, os.path.join(work, "ckpt"), F.col("gram")
    )
    q.awaitTermination()
    flagged = decontaminate_batch(store, docs)
    n_flagged = flagged.filter(F.col("contaminated_bloom")).count()
    took = round(time.time() - t0, 3)
    g = (
        shingle_positions(docs, "text", "doc_id", 3)
        .select("doc_id", F.col("ghash").cast("string").alias("gram"))
        .distinct()
    )
    n_exact = (
        g.join(bench_grams, "gram").select("doc_id").distinct().count()
    )
    assert n_flagged >= n_exact > 0, (n_flagged, n_exact)
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_ann_ingest(spark, sf_dir: str) -> float:
    """Streaming IVF index maintenance: build the persisted index on
    3/4 of the embeddings, stream the remaining 1/4 in as 2 json
    micro-batches, then simulate the genuine crash window — the LAST
    batch's corpus write landed but its checkpoint commit did not
    (marker + its local-FS .crc twin removed; the restart runs on a
    new session, as a restarted driver is) — then compact. Asserts the
    replay added nothing and the grown+compacted index holds exactly
    the full corpus."""
    from pyspark.sql import functions as F

    from automated_data_pipeline_spark.operators import similarity
    from automated_data_pipeline_spark.streaming.ann_ingest import (
        compact_ivf_index,
        start_incremental_ann_ingest,
        write_ivf_index_for_ingest,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_total = emb.count()
    work = tempfile.mkdtemp(prefix="adp-bench-annstream-")
    src = os.path.join(work, "in")
    os.makedirs(src, exist_ok=True)


    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    _write_flat(work, src, delta.filter(F.col("vec_id") % 8 == 0), "b0.json")
    _write_flat(work, src, delta.filter(F.col("vec_id") % 8 == 4), "b1.json")
    path = os.path.join(work, "idx")
    ckpt = os.path.join(work, "ckpt")
    t0 = time.time()
    assigned, cent_df = similarity.ivf_index(base, n_clusters=16, max_iter=1)
    write_ivf_index_for_ingest(assigned, cent_df, path)
    start_incremental_ann_ingest(spark, src, path, ckpt).awaitTermination()
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    start_incremental_ann_ingest(
        spark.newSession(), src, path, ckpt
    ).awaitTermination()
    compact_ivf_index(spark, path)
    took = round(time.time() - t0, 3)
    n = spark.read.parquet(f"{path}/corpus").count()
    assert n == n_total, f"ann ingest: {n} != {n_total}"
    shutil.rmtree(work, ignore_errors=True)
    return took


def bench_stream_dsir(spark, sf_dir: str) -> float:
    """Incremental DSIR throughput: the documents table as 3 json
    micro-batches folded into the persistent bucket store; asserts the
    merged integer statistics equal the one-shot whole-corpus counts
    exactly. No content-replay shard: like the quality scorer, DSIR
    intentionally counts repeated CONTENT again — exactly-once is per
    batch_key, and the checkpoint-replay window is pytest-pinned
    (tests/test_dsir_stream.py) instead."""
    from pyspark.sql import functions as F

    from automated_data_pipeline_spark.streaming.dsir_stream import (
        DsirBucketStore,
        batch_dsir_buckets,
        read_dsir_stats,
        start_incremental_dsir,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    work = tempfile.mkdtemp(prefix="adp-bench-dsir-")
    src = os.path.join(work, "in")
    os.makedirs(src, exist_ok=True)


    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, p in enumerate(parts):
        _write_flat(work, src, p, f"b{i}.json")
    store = DsirBucketStore(os.path.join(work, "store"))
    t0 = time.time()
    q = start_incremental_dsir(
        spark, src, store, os.path.join(work, "ckpt"),
        F.col("lang") == "en",
    )
    q.awaitTermination()
    took = round(time.time() - t0, 3)
    got = sorted(tuple(r) for r in read_dsir_stats(spark, store).collect())
    want = sorted(
        tuple(r)
        for r in batch_dsir_buckets(
            docs, "text", F.col("lang") == "en"
        ).collect()
    )
    assert got == want, "stream dsir stats != batch bucket counts"
    shutil.rmtree(work, ignore_errors=True)
    return took


def _noise_probe(spark, sf_dir: str) -> dict:
    """Fixed reference workload for host-noise detection: a pushed-down
    lineitem scan-count, 3 timed runs after up-to-10 warm rounds (warm
    stops when two consecutive timings agree within 20%).

    Returns {'sec': min, 'spread': max/min of the timed samples}.
    Measurement note (r11): the START probe sits on a ~2.4x-slower
    plateau than the END probe on a PROVABLY quiet host (four
    back-to-back full runs, totals within ±4%, end probes within
    ±8%) — the whole JVM speeds up across the 131 workloads as C2
    compiles Spark's scan stack, and no amount of single-query warm
    rounds flattens that. So the start/end ratio is a JIT artifact,
    NOT a host-noise figure; the honest noise signals are each probe's
    intra-probe 'spread' and the agreement of probe_end/totals across
    repeated runs (recorded per close in BASELINE.md)."""
    def scan():
        t0 = time.time()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        return time.time() - t0

    prev = None
    for _ in range(10):
        dt = scan()
        if prev is not None and abs(dt - prev) <= 0.2 * max(dt, prev):
            break
        prev = dt
    samples = [scan() for _ in range(3)]
    return {
        "sec": round(min(samples), 4),
        "spread": round(max(samples) / max(min(samples), 1e-9), 2),
    }


def main():
    from automated_data_pipeline_spark.session import get_spark
    from automated_data_pipeline_spark.suite import all_specs

    spark = get_spark("adp-bench")
    specs = {s.name: s for s in all_specs()}
    timings: dict[str, float] = {}

    # Bench-only shared ANN build lineage (VERDICT r10 item 8): the
    # witness queries rebuild their index per call by design, which
    # made the bench top-10 measure build lineage, not serving cost.
    # Clear any stale stamps (a previous bench run's artifacts may
    # predate code changes), then let the warm run build ONCE and the
    # timed min-of-2 measure the serve/query path. The driver gate
    # and check_oracles never set this flag — their runs keep the
    # full independent lineage.
    import glob
    import tempfile as _tf

    for st in glob.glob(
        os.path.join(_tf.gettempdir(), "adps_index_*", ".bench_build_stamp")
    ):
        os.remove(st)
    os.environ["SPARK_GRAFT_ANN_REUSE_BUILD"] = "1"
    ann_shared = [
        "ann_sq8_persisted", "ann_pq_persisted_exact",
        "ann_ivfpq_persisted_exact", "ann_ivf_append_exact",
        "ann_ivfpq_append_exact", "ann_ivf_tombstone_exact",
        "ann_ivfpq_rebuild_exact",
    ]

    probe_start = _noise_probe(spark, SF_DIR)

    # per-query intra-run spread (VERDICT r12 item 7): max/min across
    # the timed samples, recorded so the cross-round diff can separate
    # real movers from each query's own noise band instead of
    # hand-adjudicating shared-host swings.
    spreads: dict[str, float] = {}

    # r14 (VERDICT r13 item 7): when the two timed samples disagree by
    # more than TRANSIENT_SPREAD the row is mid-transient (JIT, GC, a
    # host blip) — take ONE extra sample so min-of-N sees past it.
    # Additive only: quiet rows still time exactly two samples, so
    # cross-round minima stay comparable; kn_fluency_recovered burned
    # two hand-adjudications on exactly this failure mode.
    TRANSIENT_SPREAD = 1.5

    def sample_more_if_spread(samples, take_one):
        if max(samples) / max(min(samples), 1e-9) > TRANSIENT_SPREAD:
            samples.append(take_one())
        return samples

    for name in HEADLINE:
        fn = specs[name].fn
        run_query(spark, fn, SF_DIR)  # warm (scan caching, codegen)
        # min of two timed runs: the shared host shows 2-4x run-to-run
        # noise under load (see BASELINE.md); the minimum is the stable
        # engine-cost estimate

        def one_timed():
            t0 = time.time()
            run_query(spark, fn, SF_DIR)
            return time.time() - t0

        samples = [one_timed() for _ in range(2)]
        sample_more_if_spread(samples, one_timed)
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) / max(min(samples), 1e-9), 2)

    timings.update(bench_pipelines(spark))

    # streaming paths are one-shot (fresh checkpoint/store dirs per
    # call), so a single sample eats the full shared-host noise band
    # (measured 2x swings within an hour); min-of-2 like the queries
    def min2(key, fn):
        samples = [fn(spark, SF_DIR), fn(spark, SF_DIR)]
        sample_more_if_spread(samples, lambda: fn(spark, SF_DIR))
        spreads[key] = round(
            max(samples) / max(min(samples), 1e-9), 2
        )
        timings[key] = round(min(samples), 3)

    min2("stream_tumbling_events", bench_stream_tumbling)
    min2("stream_session_events", bench_stream_session)
    min2("stream_stream_join_1h", bench_stream_stream_join)
    min2("stream_stateful_sessionize", bench_stream_stateful_sessionize)
    min2("stream_incremental_dedup", bench_stream_incremental_dedup)
    min2("stream_incremental_segments", bench_stream_incremental_segments)
    min2("stream_incremental_lsh", bench_stream_incremental_lsh)
    min2("stream_incremental_hll", bench_stream_incremental_hll)
    min2("stream_quality_scorer", bench_stream_quality_scorer)
    min2("stream_source_stats", bench_stream_source_stats)
    min2("stream_source_histogram", bench_stream_source_histogram)
    min2("stream_decontaminate", bench_stream_decontaminate)
    min2("stream_ann_ingest", bench_stream_ann_ingest)
    min2("stream_dsir_buckets", bench_stream_dsir)

    probe_end = _noise_probe(spark, SF_DIR)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    host_noise = {
        "probe_start_sec": probe_start["sec"],
        "probe_start_spread": probe_start["spread"],
        "probe_end_sec": probe_end["sec"],
        "probe_end_spread": probe_end["spread"],
        # start/end ratio is JIT-dominated (see _noise_probe) — the
        # noise figures are the two spreads above
        "start_end_ratio_jit_dominated": round(
            max(probe_start["sec"], probe_end["sec"])
            / max(min(probe_start["sec"], probe_end["sec"]), 1e-9), 2
        ),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_suite_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": sf_val,
                "n": len(timings),
                "host_noise": host_noise,
                "ann_shared_build_fixture": {
                    "note": "warm run builds the index lineage once; "
                    "timed runs measure the serve/query path "
                    "(SPARK_GRAFT_ANN_REUSE_BUILD=1, bench-only — "
                    "gate runs keep full independent lineage)",
                    "rows": ann_shared,
                },
                "queries": timings,
                "spreads": spreads,
            },
            f,
            indent=1,
        )
    # COMPACT stdout line (driver keeps only the last 2000 chars of
    # stdout — see module docstring): totals + the 10 slowest queries.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    out = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_val,
        "n": len(timings),
        "queries": {k: round(v, 2) for k, v in slowest.items()},
        "host_noise": host_noise,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(out)
    if len(line) >= 1500:
        # NEVER abort here: an oversize line must degrade, not lose
        # the round's bench evidence (the failure mode this compact
        # format exists to prevent). Drop the per-query slice and keep
        # the headline numbers.
        out.pop("queries", None)
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()

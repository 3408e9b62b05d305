"""Incremental Bloom decontamination (streaming/decontamination.py):
shard-merge equivalence with the one-shot batch filter, split
invariance, replay idempotence (distinct IS the exactly-once), the
no-false-negative screening guarantee against an exact join, batch
operator parity, compaction, and the file-source stream wiring."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import sketches as SK
from automated_data_pipeline_spark.operators.spans import shingle_positions
from automated_data_pipeline_spark.streaming.decontamination import (
    BloomBitStore,
    decontaminate_batch,
    start_incremental_bloom,
)

M_BITS = 1 << 12
K = 4


def _grams(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("gram-"), F.col("id")).alias("gram")
    )


def _bits(df):
    return {r["bit"] for r in df.collect()}


@pytest.fixture()
def store(tmp_path):
    return BloomBitStore(str(tmp_path / "bloom_store"), m_bits=M_BITS, k_hashes=K)


def test_shard_merge_equals_batch_filter_any_split(spark, tmp_path):
    """Ingesting the benchmark in shards — under EITHER split — must
    land on the exact bit set the one-shot batch build computes on
    the union: sparse-set union is Bloom merge."""
    whole = _grams(spark, 0, 600)
    expected = _bits(
        SK.bloom_build(whole, F.col("gram"), m_bits=M_BITS, k_hashes=K)
    )
    splits = [
        [(0, 200), (200, 450), (450, 600)],
        [(0, 500), (300, 600)],  # overlapping shards too
    ]
    for i, split in enumerate(splits):
        s = BloomBitStore(str(tmp_path / f"s{i}"), m_bits=M_BITS, k_hashes=K)
        for lo, hi in split:
            s.merge_batch(_grams(spark, lo, hi), F.col("gram"))
        assert _bits(s.read_bits(spark)) == expected


def test_replayed_shard_changes_nothing(spark, store):
    a, b = _grams(spark, 0, 300), _grams(spark, 300, 500)
    store.merge_batch(a, F.col("gram"))
    store.merge_batch(b, F.col("gram"))
    before = _bits(store.read_bits(spark))
    store.merge_batch(b, F.col("gram"))  # replay
    assert _bits(store.read_bits(spark)) == before


def test_compact_preserves_bits_and_probe(spark, store):
    for lo, hi in [(0, 200), (200, 400), (400, 500)]:
        store.merge_batch(_grams(spark, lo, hi), F.col("gram"))
    before = _bits(store.read_bits(spark))
    probe_items = _grams(spark, 450, 550)
    hits_before = {
        (r["gram"], r["bloom_hit"])
        for r in store.probe(probe_items, "gram").collect()
    }
    store.compact(spark)
    assert _bits(store.read_bits(spark)) == before
    files = [f for f in os.listdir(store.path) if f.endswith(".parquet")]
    assert len(files) == 1
    hits_after = {
        (r["gram"], r["bloom_hit"])
        for r in store.probe(probe_items, "gram").collect()
    }
    assert hits_after == hits_before


def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "beta gamma delta zeta eta"),  # shares 'beta gamma delta'
        (2, "one two three four five"),
        (3, "totally unrelated words here now"),
        (4, "alpha beta gamma"),  # exactly one shared 3-gram
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bench_grams(spark, docs, residue):
    return (
        shingle_positions(docs.filter(F.col("doc_id") % 2 == residue), "text",
                          "doc_id", 3)
        .select(F.col("ghash").cast("string").alias("gram"))
        .distinct()
    )


def test_decontaminate_no_false_negatives_and_batch_parity(spark, store):
    """Every doc sharing an ingested benchmark gram MUST be flagged
    (exact-join ground truth), and the per-doc output must equal the
    batch operator pipeline (build-once filter) on the same data."""
    docs = _docs(spark)
    bench = _bench_grams(spark, docs, 0)  # docs 0, 2, 4 are 'benchmark'
    # ingest in two shards
    store.merge_batch(bench.limit(3), F.col("gram"))
    store.merge_batch(bench, F.col("gram"))
    out = {r["doc_id"]: (r["n_flagged"], r["contaminated_bloom"])
           for r in decontaminate_batch(store, docs).collect()}

    g = (
        shingle_positions(docs, "text", "doc_id", 3)
        .select("doc_id", F.col("ghash").cast("string").alias("gram"))
        .distinct()
    )
    exact = {
        r["doc_id"]: r["n"]
        for r in g.join(bench, "gram").groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for doc_id, n_exact in exact.items():
        n_flagged, contaminated = out[doc_id]
        assert contaminated and n_flagged >= n_exact  # no false negatives

    # parity with the one-shot batch filter on the union
    batch_bloom = SK.bloom_build(bench, F.col("gram"), m_bits=M_BITS, k_hashes=K)
    batch_hits = SK.bloom_probe(
        batch_bloom, g.select("gram"), "gram", m_bits=M_BITS, k_hashes=K
    )
    batch_flagged = {
        r["doc_id"]: r["n"]
        for r in g.join(batch_hits.filter(F.col("bloom_hit")), "gram")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for doc_id in [r["doc_id"] for r in docs.collect()]:
        assert out[doc_id][0] == batch_flagged.get(doc_id, 0)


def test_stream_wiring_end_to_end(spark, store, tmp_path):
    """File-source shards through start_incremental_bloom: the merged
    filter equals the batch build over all shards' items."""
    src = tmp_path / "shards"
    src.mkdir()
    all_items = [f"gram-{i}" for i in range(120)]
    for s, chunk in enumerate([all_items[:50], all_items[40:90], all_items[90:]]):
        with open(src / f"shard{s}.json", "w") as f:
            for it in chunk:
                f.write(json.dumps({"gram": it}) + "\n")
    q = start_incremental_bloom(
        spark, str(src), store, str(tmp_path / "ckpt"), F.col("gram")
    )
    q.awaitTermination(120)
    expected = _bits(
        SK.bloom_build(
            spark.createDataFrame([(g,) for g in all_items], "gram string"),
            F.col("gram"), m_bits=M_BITS, k_hashes=K,
        )
    )
    assert _bits(store.read_bits(spark)) == expected


def test_suggest_m_bits_hits_target_fp(spark, tmp_path):
    """The sizing formula must deliver (at most) the target gram-level
    FP rate when the forecast holds — measured empirically: ingest n
    items into a store sized by the helper, probe n_probe DISJOINT
    items, and check the hit rate against the target (with slack for
    the power-of-two rounding making it conservative)."""
    from automated_data_pipeline_spark.streaming.decontamination import (
        suggest_m_bits,
    )

    n = 2000
    m = suggest_m_bits(n, target_fp=0.01, k_hashes=K)
    assert m & (m - 1) == 0  # power of two
    store = BloomBitStore(str(tmp_path / "sized"), m_bits=m, k_hashes=K)
    store.merge_batch(_grams(spark, 0, n), F.col("gram"))
    probes = spark.range(n, n + 4000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("gram")
    )
    hits = store.probe(probes, "gram").filter(F.col("bloom_hit")).count()
    assert hits / 4000 <= 0.01, hits

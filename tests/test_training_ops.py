"""Unit oracles for the training-data mechanics added in round 2:
domain-mixture resampling, sequence packing, benchmark decontamination.
"""

from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import dedup, sampling


def test_mixture_sample_integer_and_fractional_weights(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")

    # integer weight -> exact replication, no randomness involved
    out = sampling.mixture_sample(df, "lang", "doc_id", {"en": 2.0, "de": 3.0})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 200, "de": 300}

    # copy indices are 1..n per row
    copies = out.filter(F.col("doc_id") == 1).select("copy").collect()
    assert sorted(r["copy"] for r in copies) == [1, 2, 3]

    # fractional weight keeps roughly frac share, deterministically
    out1 = sampling.mixture_sample(df, "lang", "doc_id", {"en": 0.5, "de": 0.0})
    out2 = sampling.mixture_sample(df, "lang", "doc_id", {"en": 0.5, "de": 0.0})
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    assert ids1 == ids2  # same hash draw every run
    assert all(i % 2 == 0 for i in ids1)  # de dropped entirely at w=0
    assert 20 <= len(ids1) <= 80  # ~50 of 100 en docs


def test_pack_sequences_contiguous_spans(spark):
    rows = [(i, " ".join(["tok"] * (5 + i % 7))) for i in range(50)] + [
        (97, ""),  # empty doc -> dropped
        (98, "   "),  # whitespace-only -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sampling.pack_sequences(df, "doc_id", "text", budget=16, n_shards=4)
    got = out.collect()
    assert {r["doc_id"] for r in got} == set(range(50))

    # within each shard: spans are contiguous from 0, no gaps/overlaps
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["tok_start"])
        pos = 0
        for r in rs:
            assert r["tok_start"] == pos
            assert r["tok_end"] - r["tok_start"] == r["n_tokens"]
            assert r["pack_first"] == r["tok_start"] // 16
            assert r["pack_last"] == (r["tok_end"] - 1) // 16
            pos = r["tok_end"]


def test_decontaminate_flags_overlap_only(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id bigint, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "look at the quick brown dog"),  # shares "the quick brown"
            (2, "completely unrelated words here today"),
            (3, "fox jumps"),  # only 2 tokens -> no trigram, clean
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup.decontaminate(docs, bench, n=3).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"]


def test_forward_chain_folds_empty_test_slice_keeps_train_count(spark):
    """A fold whose test slice holds zero rows must still report the
    full training count of everything before its boundary (the
    cumulative-on-test-row formulation reported n_train=0)."""
    from datetime import datetime

    from automated_data_pipeline_spark.operators.sampling import (
        forward_chain_folds,
    )

    # 10 equal-duration slices of 1h each over [00:00, 05:00); rows
    # only in slices 0, 1, and 4 -> folds 2,3 have EMPTY test slices
    rows = []
    for h, n in [(0, 3), (1, 2), (4, 1)]:
        for i in range(n):
            rows.append((datetime(2026, 1, 1, h, i, 0),))
    # pin the range so slices are exactly hours: add the max endpoint
    rows.append((datetime(2026, 1, 1, 4, 59, 59),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {
        r["fold"]: (r["n_train"], r["n_test"])
        for r in forward_chain_folds(df, "ts", n_folds=4).collect()
    }
    # slice layout (5 slices of ~1h): s0=3, s1=2, s2=0, s3=0, s4=2
    assert out[1] == (3, 2)
    assert out[2] == (5, 0), "empty test slice zeroed the train count"
    assert out[3] == (5, 0)
    assert out[4] == (5, 2)

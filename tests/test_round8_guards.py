"""Round-8 hardening regressions (VERDICT r7 items 3/7, ADVICE r7):

- reserved temp-column guards raise loudly instead of silently
  clobbering user data (ordered_cumsum / distributed_row_number /
  weighted_sample_topk / hash_ranked_sample)
- the skew probe samples EVERY partition, so a hot key concentrated
  at the tail of a clustered scan is still detected
- NULL quality labels are rejected from training, not silently mapped
  to the negative class
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import (
    quality_model as QM,
    sampling,
    skew,
)


def test_ordered_cumsum_rejects_reserved_columns(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(1).alias("v"), F.lit(0).alias("_pid")
    )
    with pytest.raises(ValueError, match="_pid"):
        sampling.ordered_cumsum(df, "v", ["id"])


def test_distributed_row_number_rejects_reserved_columns(spark):
    df = spark.range(10).select(F.col("id"), F.lit(1).alias("_one"))
    with pytest.raises(ValueError, match="_one"):
        sampling.distributed_row_number(df, ["id"])


def test_weighted_sample_topk_rejects_reserved_columns(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(1.0).alias("w"), F.lit(0).alias("_es_key")
    )
    with pytest.raises(ValueError, match="_es_key"):
        sampling.weighted_sample_topk(df, "w", "id", k=3)


def test_hash_ranked_sample_rejects_reserved_columns(spark):
    df = spark.range(10).select(F.col("id"), F.lit(0).alias("_r"))
    with pytest.raises(ValueError, match="_r"):
        sampling.hash_ranked_sample(df, ["id"], cap=5)


def test_skew_probe_sees_hot_key_clustered_at_scan_tail(spark):
    # 20k rows, 60% on key 999 — the LARGEST key. repartitionByRange on
    # the key clusters the hot key entirely into the LAST partitions,
    # the exact layout where the old sample().limit(cap) probe (which
    # takes rows from whichever partitions answer first, i.e. the
    # head of the scan) could return a slice with no hot rows at all
    # and report ~uniform (ADVICE r7). The per-partition-capped probe
    # must still report a dominant share.
    n = 20_000
    fact = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 5 < 3, F.lit(999))
            .otherwise(F.col("id") % 100)
            .alias("k")
        )
        .repartitionByRange(8, "k")
    )
    # cap far below the row count forces the bounding path; fraction=1
    # removes sampling noise so the assertion is deterministic
    share = skew.estimate_top_key_share(fact, "k", fraction=1.0, cap=2_000)
    assert share > 0.3, share


def test_skew_probe_empty_input_is_zero(spark):
    empty = spark.range(0).select(F.col("id").alias("k"))
    assert skew.estimate_top_key_share(empty, "k", fraction=1.0) == 0.0


def test_train_quality_logreg_ignores_null_labels(spark):
    good = [
        "the cat sat on the mat and looked to the door in a calm way",
        "a dog ran to the park and the children played in the sun",
    ]
    bad = [
        "$$$ ### !!! @@@ %%% ^^^ &&& *** ((( ))) ---",
        "xxxxxx yyyyyy zzzzzz xxxxxx yyyyyy zzzzzz !!!!",
    ]
    rows = [(i, t, True) for i, t in enumerate(good)] + [
        (100 + i, t, False) for i, t in enumerate(bad)
    ]
    clean = spark.createDataFrame(
        rows, "doc_id long, text string, good boolean"
    )
    # the poison rows carry good-looking text with an UNDEFINED label;
    # the old code trained them as negatives, shifting the weights
    poisoned = clean.unionByName(
        spark.createDataFrame(
            [(200 + i, t, None) for i, t in enumerate(good)],
            "doc_id long, text string, good boolean",
        )
    )
    b0, w0 = QM.train_quality_logreg(clean, "text", F.col("good"))
    b1, w1 = QM.train_quality_logreg(poisoned, "text", F.col("good"))
    assert b0 == b1 and w0 == w1


def test_per_query_topk_rejects_reserved_columns(spark):
    from automated_data_pipeline_spark.operators.similarity import (
        per_query_topk,
    )

    df = spark.range(10).select(
        F.col("id"), F.lit(0).alias("qid"), F.lit(0).alias("_pqk_pid")
    )
    with pytest.raises(ValueError, match="_pqk_pid"):
        per_query_topk(df, "qid", [F.col("id")], 3)


def test_per_query_topk_matches_bare_window(spark):
    """The two-phase prune must produce exactly the rows a bare
    per-query window produces, over a multi-partition input."""
    from pyspark.sql import Window

    from automated_data_pipeline_spark.operators.similarity import (
        per_query_topk,
    )

    df = (
        spark.range(5_000)
        .repartition(16)
        .select(
            (F.col("id") % 4).alias("qid"),
            F.col("id").alias("vid"),
            # rounded score with collisions — exercises the tie-break
            (F.pmod(F.xxhash64("id"), F.lit(50))).alias("score"),
        )
    )
    order = [F.col("score").desc(), F.col("vid")]
    got = {
        (r["qid"], r["vid"], r["rank"])
        for r in per_query_topk(df, "qid", order, 7).collect()
    }
    w = Window.partitionBy("qid").orderBy(*order)
    want = {
        (r["qid"], r["vid"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
        .collect()
    }
    assert got == want

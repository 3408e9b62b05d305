"""Round-9 hardening regressions (ADVICE r8):

- per_query_topk's reserved-column guard covers the OUTPUT rank
  column too — an input that already has a column named ``rank`` was
  silently overwritten, unlike the loud-clash convention
- hash_ranked_sample selection is total-order stable regardless of
  partitioning: rows that TIE on the hash_cols content hash at the
  cap boundary are broken by a full-row hash, so which one survives
  no longer depends on defaultParallelism (machine-dependent samples
  would mean machine-dependent trained codebooks)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import sampling
from automated_data_pipeline_spark.operators.similarity import per_query_topk


def test_per_query_topk_rejects_existing_rank_column(spark):
    df = spark.range(10).select(
        F.lit(1).alias("qid"), F.col("id"), F.lit(0).alias("rank")
    )
    with pytest.raises(ValueError, match="rank"):
        per_query_topk(df, "qid", [F.col("id")], 3)
    # a non-default rank_col that clashes is equally loud
    df2 = spark.range(10).select(
        F.lit(1).alias("qid"), F.col("id"), F.lit(0).alias("myrank")
    )
    with pytest.raises(ValueError, match="myrank"):
        per_query_topk(df2, "qid", [F.col("id")], 3, rank_col="myrank")
    # and renaming clears it
    assert per_query_topk(
        df.withColumnRenamed("rank", "old_rank"), "qid", [F.col("id")], 3
    ).count() == 3


def test_hash_ranked_sample_stable_across_partitioning(spark):
    # 200 rows in 100 hash-tie pairs: hash_cols = ["k"] where both
    # members of a pair share k but differ in payload. With cap=99 the
    # boundary lands INSIDE tie groups, the exact spot where the old
    # orderBy("_r") selection depended on partition layout. Selection
    # must now be identical for 1-partition and 16-partition inputs.
    rows = [(i // 2, f"payload_{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "k int, payload string")
    picked = [
        sorted(
            (r.k, r.payload)
            for r in sampling.hash_ranked_sample(
                df.repartition(p), ["k"], cap=99, seed=7
            ).collect()
        )
        for p in (1, 4, 16)
    ]
    assert picked[0] == picked[1] == picked[2]
    assert len(picked[0]) == 99

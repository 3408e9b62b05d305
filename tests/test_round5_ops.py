"""Round-5 operator tests: the two-phase distributed ordered cumsum
(the plan that replaces a single-partition global window), the
token-budget prefix semantics built on it, and the cutpoint-based
decile report."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators.sampling import ordered_cumsum

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.01"


def test_ordered_cumsum_matches_sequential_scan(spark):
    """The distributed two-phase cumsum must equal the sequential
    definition: sort by the keys, running-total the values."""
    df = spark.range(0, 1000).select(
        F.col("id"),
        # non-monotone order key with duplicates; id is the tie-break
        (F.col("id") * 37 % 100).alias("k"),
        (F.col("id") % 7 + 1).alias("v"),
    )
    out = ordered_cumsum(
        df, "v", [F.desc("k"), F.asc("id")], out_col="cum", num_partitions=8
    ).collect()
    rows = sorted(out, key=lambda r: (-r["k"], r["id"]))
    acc = 0
    for r in rows:
        acc += r["v"]
        assert r["cum"] == acc, (r["id"], r["cum"], acc)
    assert acc == sum(r["v"] for r in out)


def test_ordered_cumsum_plan_has_no_global_window(spark):
    """The point of the operator: a range exchange + per-partition
    windows, never WindowExec over one global partition. The physical
    plan must show rangepartitioning and a window keyed on the
    partition id."""
    df = spark.range(0, 100).select(
        F.col("id"), F.lit(1).alias("v")
    )
    out = ordered_cumsum(df, "v", [F.asc("id")], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every window is keyed on the partition id — none is global (the
    # range exchange itself sits behind the localCheckpoint and shows
    # as Scan ExistingRDD, so assert on the window spec instead)
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no window in plan?"
    assert all(s.startswith("_pid") for s in specs), specs
    # and the offsets join back via broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ordered_cumsum_empty_input(spark):
    df = spark.range(0).select(F.col("id"), F.lit(1).alias("v"))
    assert ordered_cumsum(df, "v", [F.asc("id")]).count() == 0


def test_ordered_cumsum_double_and_decimal_values(spark):
    """The offsets frame must carry sum(value)'s own type — a
    hardcoded bigint schema rejected double/decimal value columns."""
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") * 0.5).alias("v")
    )
    out = ordered_cumsum(df, "v", [F.asc("id")], num_partitions=4).collect()
    rows = sorted(out, key=lambda r: r["id"])
    acc = 0.0
    for r in rows:
        acc += r["v"]
        assert abs(r["cum"] - acc) < 1e-9

    dec = spark.range(0, 50).select(
        F.col("id"), F.col("id").cast("decimal(10,2)").alias("v")
    )
    out = ordered_cumsum(dec, "v", [F.asc("id")], num_partitions=4).collect()
    assert max(r["cum"] for r in out) == sum(range(50))


def test_token_budget_prefix_is_maximal(spark):
    """selected must be exactly the maximal quality-first prefix: every
    selected row fits under the budget, and the first unselected row in
    order would overflow it."""
    from automated_data_pipeline_spark.suite.round5 import (
        TOKEN_BUDGET,
        token_budget_prefix,
    )

    rows = token_budget_prefix(spark, SF).collect()
    rows.sort(key=lambda r: (-r["quality"], r["doc_id"]))
    seen = 0
    boundary_crossed = False
    for r in rows:
        seen += r["n_tokens"]
        assert r["cum_tokens"] == seen
        assert r["selected"] == (seen <= TOKEN_BUDGET)
        if not r["selected"]:
            boundary_crossed = True
    assert boundary_crossed, "budget must bite at sf0.01 (27k tokens total)"
    selected_total = max(
        (r["cum_tokens"] for r in rows if r["selected"]), default=0
    )
    assert 0 < selected_total <= TOKEN_BUDGET


def test_quality_decile_report_partitions_the_corpus(spark):
    from automated_data_pipeline_spark.suite.round5 import quality_decile_report

    rows = quality_decile_report(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["decile"] for r in rows} <= set(range(1, 11))
    # deciles are ordered by quality: min of a higher decile can't
    # exceed the max of a lower one... (decile 1 = LOWEST quality
    # since bucket = 1 + #cuts below)
    by_d = sorted(rows, key=lambda r: r["decile"])
    for lo, hi in zip(by_d, by_d[1:]):
        assert lo["max_quality"] <= hi["min_quality"] + 1e-9

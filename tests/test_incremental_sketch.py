"""Streaming HLL register store (streaming/incremental_sketch.py):
batch-merge equivalence with the one-shot batch sketch, replay
idempotence (the algebraic exactly-once property), compaction, and the
file-source stream wiring end-to-end."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import sketches as SK
from automated_data_pipeline_spark.streaming.incremental_sketch import (
    HllSketchStore,
    start_incremental_hll,
)


def _items(spark, lo, hi, group="g"):
    return spark.range(lo, hi).select(
        F.lit(group).alias("grp"),
        F.concat(F.lit("item-"), F.col("id")).alias("item"),
    )


@pytest.fixture()
def store(tmp_path):
    return HllSketchStore(str(tmp_path / "hll_store"), ["grp"], p=9)


def test_incremental_merge_equals_batch_sketch(spark, store):
    """Merging micro-batches must land on the EXACT registers (and so
    the exact estimate) the one-shot batch sketch computes on the
    union — the associativity that makes per-batch maintenance sound."""
    a, b, c = _items(spark, 0, 800), _items(spark, 500, 1500), _items(spark, 1400, 2000)
    for batch in (a, b, c):
        store.merge_batch(batch, F.col("item"))
    whole = a.union(b).union(c)
    expected = {
        (r["bucket"], r["rho"])
        for r in SK.hll_registers(whole, F.col("item"), ["grp"], p=9).collect()
    }
    got = {
        (r["bucket"], r["rho"])
        for r in store.read_registers(spark).collect()
    }
    assert got == expected
    est = store.estimate(spark).first()
    one_shot = SK.hll_estimate(
        SK.hll_registers(whole, F.col("item"), ["grp"], p=9), ["grp"], p=9
    ).first()
    assert est["hll_est"] == one_shot["hll_est"]
    # 2000 true distinct, ~4.6% std error at p=9
    assert abs(est["hll_est"] - 2000) / 2000 < 0.14


def test_replay_is_algebraically_idempotent(spark, store):
    """Re-merging the SAME batch (an at-least-once replay) must leave
    the registers bit-identical: per-bucket MAX absorbs duplicates, so
    the store needs no batch_key bookkeeping at all."""
    batch = _items(spark, 0, 600)
    store.merge_batch(batch, F.col("item"))
    before = sorted(
        (r["bucket"], r["rho"])
        for r in store.read_registers(spark).collect()
    )
    est_before = store.estimate(spark).first()["hll_est"]
    store.merge_batch(batch, F.col("item"))  # replay
    after = sorted(
        (r["bucket"], r["rho"])
        for r in store.read_registers(spark).collect()
    )
    assert after == before
    assert store.estimate(spark).first()["hll_est"] == est_before


def test_compact_preserves_registers_and_bounds_files(spark, store):
    for lo in range(0, 1000, 200):
        store.merge_batch(_items(spark, lo, lo + 200), F.col("item"))
    before = sorted(
        (r["bucket"], r["rho"])
        for r in store.read_registers(spark).collect()
    )
    n_files_before = sum(
        1 for _, _, fs in os.walk(store.path) for f in fs
        if f.endswith(".parquet")
    )
    store.compact(spark, n_files=2)
    after = sorted(
        (r["bucket"], r["rho"])
        for r in store.read_registers(spark).collect()
    )
    n_files_after = sum(
        1 for _, _, fs in os.walk(store.path) for f in fs
        if f.endswith(".parquet")
    )
    assert after == before
    assert n_files_after <= 2 < n_files_before


def test_file_stream_end_to_end(spark, tmp_path, store):
    """Three dropped JSON files -> three micro-batches merged into the
    store; per-group estimates reflect the union."""
    src = tmp_path / "src"
    src.mkdir()
    rows = []
    for day in range(3):
        path = src / f"day{day}.json"
        with open(path, "w") as f:
            for uid in range(day * 40, day * 40 + 60):  # 20 overlap
                rec = {
                    "user_id": uid,
                    "event_type": "click" if uid % 2 == 0 else "view",
                    "ts": f"2026-01-0{day + 1}T00:00:00Z",
                }
                f.write(json.dumps(rec) + "\n")
                rows.append(rec)
    grouped_store = HllSketchStore(
        str(tmp_path / "hll_grouped"), ["event_type"], p=9
    )
    q = start_incremental_hll(
        spark,
        str(src),
        grouped_store,
        str(tmp_path / "ckpt"),
        item_expr=F.col("user_id").cast("string"),
    )
    q.awaitTermination(120)
    est = {
        r["event_type"]: r["hll_est"]
        for r in grouped_store.estimate(spark).collect()
    }
    true = {
        g: len({r["user_id"] for r in rows if r["event_type"] == g})
        for g in ("click", "view")
    }
    assert set(est) == {"click", "view"}
    for g in est:  # 70 distinct per group -> linear counting, near-exact
        assert abs(est[g] - true[g]) / true[g] < 0.06

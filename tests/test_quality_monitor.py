"""Streaming per-micro-batch quality monitoring: each batch's rule
report lands in the metrics table with batch lineage; violations appear
within the batch that introduced them."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from automated_data_pipeline_spark.streaming.quality_monitor import (
    attach_quality_monitor,
    read_quality_metrics,
)


def test_monitor_reports_per_batch_violations(spark, tmp_path):
    src = str(tmp_path / "src")
    metrics = str(tmp_path / "metrics")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    clean = [Row(k=1, amount=10.0), Row(k=2, amount=20.0)]
    dirty = [Row(k=3, amount=-7.0), Row(k=None, amount=1.0), Row(k=5, amount=2.0)]
    schema = "k int, amount double"
    spark.createDataFrame(clean, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(dirty, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    seen_batches = []

    def downstream(df, bid):
        seen_batches.append(int(bid))
        df.write.mode("append").parquet(sink)

    rules = [
        ("not_null(k)", F.col("k").isNull()),
        ("non_negative(amount)", F.col("amount") < 0),
    ]
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            attach_quality_monitor(downstream, metrics, "orders_stream", rules)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    rep = read_quality_metrics(spark, metrics).collect()
    # 2 batches x 2 rules
    assert len(rep) == 4
    by_key = {(r["batch_id"], r["check_name"]): r for r in rep}
    batches = sorted({r["batch_id"] for r in rep})
    b_clean, b_dirty = batches
    # find which batch carried the dirty file (file order is not
    # guaranteed): the dirty batch has 3 rows
    if by_key[(b_clean, "not_null(k)")]["n_rows"] == 3:
        b_clean, b_dirty = b_dirty, b_clean
    assert by_key[(b_clean, "not_null(k)")]["n_violations"] == 0
    assert by_key[(b_clean, "non_negative(amount)")]["n_violations"] == 0
    assert by_key[(b_dirty, "not_null(k)")]["n_violations"] == 1
    assert by_key[(b_dirty, "non_negative(amount)")]["n_violations"] == 1
    assert by_key[(b_dirty, "not_null(k)")]["n_rows"] == 3

    # downstream handler still ran for every batch, rows all delivered
    assert sorted(seen_batches) == batches
    assert spark.read.parquet(sink).count() == 5


def test_monitor_without_downstream_handler(spark, tmp_path):
    src = str(tmp_path / "src")
    metrics = str(tmp_path / "metrics")
    spark.createDataFrame(
        [Row(k=1, amount=1.0)], "k int, amount double"
    ).write.parquet(src)

    q = (
        spark.readStream.schema("k int, amount double")
        .parquet(src)
        .writeStream.foreachBatch(
            attach_quality_monitor(
                None, metrics, "t", [("not_null(k)", F.col("k").isNull())]
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rep = read_quality_metrics(spark, metrics).collect()
    assert len(rep) == 1
    assert rep[0]["n_violations"] == 0


def test_monitor_replay_same_batch_id_is_idempotent(spark, tmp_path):
    """foreachBatch redelivers a batch_id after a failure between the
    metrics append and the checkpoint commit. A replay always arrives
    as the FIRST batch after a restart (fresh handler closure), so the
    probe only runs there; the monitor must not double-report."""
    metrics = str(tmp_path / "metrics")
    rules = [("not_null(k)", F.col("k").isNull())]
    batch = spark.createDataFrame([Row(k=1, amount=1.0)], "k int, amount double")
    wrapped = attach_quality_monitor(None, metrics, "t", rules, run_key="ckptA")
    wrapped(batch, 7)
    # crash + restart: the replay runs under a NEW handler instance
    replayed = attach_quality_monitor(None, metrics, "t", rules, run_key="ckptA")
    replayed(batch, 7)
    rep = read_quality_metrics(spark, metrics).collect()
    assert len(rep) == 1
    replayed(batch, 8)  # a genuinely new batch still lands
    assert len(read_quality_metrics(spark, metrics).collect()) == 2


def test_monitor_checkpoint_reset_reports_again(spark, tmp_path):
    """Restarting batch ids at 0 under a DIFFERENT run scope (checkpoint
    reset / second query sharing the metrics table) must NOT be
    mistaken for a replay."""
    metrics = str(tmp_path / "metrics")
    rules = [("not_null(k)", F.col("k").isNull())]
    batch = spark.createDataFrame([Row(k=1, amount=1.0)], "k int, amount double")
    attach_quality_monitor(None, metrics, "t", rules, run_key="ckptA")(batch, 0)
    attach_quality_monitor(None, metrics, "t", rules, run_key="ckptB")(batch, 0)
    assert len(read_quality_metrics(spark, metrics).collect()) == 2

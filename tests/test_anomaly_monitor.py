"""Streaming volume-anomaly monitor: per-batch window counts land with
lineage and sum correctly across batch-straddling windows; anomaly
scoring matches a hand-computed trailing z-score; replays never
double-count."""

from __future__ import annotations

import datetime as dt
import math
import os

from pyspark.sql import Row

from automated_data_pipeline_spark.streaming.anomaly import (
    attach_volume_monitor,
    read_anomalies,
    read_window_volumes,
)


def _rows(day_counts: dict[int, int]):
    """n events on 2024-03-<day> at an hourly-bucketed timestamp."""
    out = []
    eid = 0
    for day, n in day_counts.items():
        for i in range(n):
            out.append(
                Row(
                    event_id=eid,
                    ts=dt.datetime(2024, 3, day, 12, 0, 0)
                    + dt.timedelta(seconds=i),
                )
            )
            eid += 1
    return out


SCHEMA = "event_id bigint, ts timestamp"


def test_volume_monitor_counts_and_flags_spike(spark, tmp_path):
    src = str(tmp_path / "src")
    metrics = str(tmp_path / "metrics")
    os.makedirs(src)
    # 6 calm-but-noisy days (sd ~2.3), then a 40-event spike; the
    # spike is split across TWO micro-batch files so its window must
    # sum across batches
    calm = {1: 10, 2: 14, 3: 8, 4: 11, 5: 13, 6: 9}
    spark.createDataFrame(_rows(calm), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(_rows({7: 25}), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spike_b = _rows({7: 40})[25:]  # remaining 15 events of day 7
    spark.createDataFrame(spike_b, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            attach_volume_monitor(
                None, metrics, ts_col="ts", window="1 day",
                run_key=str(tmp_path / "ckpt"),
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    vols = {
        r["window_start"].day: r["n_events"]
        for r in read_window_volumes(spark, metrics).collect()
    }
    assert vols == {**calm, 7: 40}, vols  # straddled window summed

    anoms = {
        r["window_start"].day: r
        for r in read_anomalies(spark, metrics, history=6).collect()
    }
    # day 7 vs trailing 6 calm days: hand-computed z
    xs = list(calm.values())
    n, mean = len(xs), sum(xs) / len(xs)
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    want_z = round((40 - mean) / sd, 4)
    assert anoms[7]["z"] == want_z
    assert anoms[7]["is_anomaly"]
    # calm days never flag; day 1 has no trailing history -> NULL z
    assert anoms[1]["z"] is None and not anoms[1]["is_anomaly"]
    assert not any(anoms[d]["is_anomaly"] for d in calm)


def test_volume_monitor_replay_is_idempotent(spark, tmp_path):
    metrics = str(tmp_path / "metrics")
    batch = spark.createDataFrame(_rows({1: 5}), SCHEMA)
    attach_volume_monitor(None, metrics, window="1 day", run_key="A")(batch, 3)
    # crash + restart: replay under a fresh handler instance
    attach_volume_monitor(None, metrics, window="1 day", run_key="A")(batch, 3)
    vols = read_window_volumes(spark, metrics).collect()
    assert len(vols) == 1 and vols[0]["n_events"] == 5
    # a different run scope with the same batch id is NOT a replay
    attach_volume_monitor(None, metrics, window="1 day", run_key="B")(batch, 3)
    assert read_window_volumes(spark, metrics).collect()[0]["n_events"] == 10

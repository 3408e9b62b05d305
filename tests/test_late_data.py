"""Late-data accounting: the watermark policy's drop counters are
observable per batch (LateDataAuditor) and cumulatively
(watermark_policy_metrics) — a 100 TB stream must KNOW how much the
watermark is silently discarding."""

from __future__ import annotations

import time as _time
from datetime import datetime, timedelta

from pyspark.sql import Row

from automated_data_pipeline_spark.streaming import windows as SW
from automated_data_pipeline_spark.streaming.late_data import (
    LateDataAuditor,
    watermark_policy_metrics,
)
from automated_data_pipeline_spark.suite import load

SF = "/root/testdata/sf0.001"


def test_late_drop_counters_report_dropped_rows(spark, tmp_path):
    base = datetime(2024, 6, 1, 12, 0, 0)
    schema_src = load(spark, SF, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "late_events")

    def write_batch(rows):
        spark.createDataFrame(
            [Row(**r) for r in rows], schema_src.schema
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    # same choreography as test_watermark_drops_late_data: advance the
    # watermark far past the base hour, then deliver a late row
    write_batch([dict(user_id=1, ts=base, event_type="click", value=1.0)])
    write_batch(
        [dict(user_id=1, ts=base + timedelta(hours=3), event_type="click", value=1.0)]
    )
    write_batch(
        [dict(user_id=1, ts=base + timedelta(hours=4), event_type="click", value=1.0)]
    )
    write_batch(
        [
            dict(user_id=1, ts=base + timedelta(minutes=1), event_type="click", value=1.0),
            dict(user_id=1, ts=base + timedelta(hours=6), event_type="click", value=1.0),
        ]
    )

    auditor = LateDataAuditor()
    spark.streams.addListener(auditor)
    try:
        stream = (
            spark.readStream.schema(schema_src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            SW.tumbling_counts(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("late_audit_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        m = watermark_policy_metrics(q)
        assert m["input_rows"] == 5
        assert m["dropped_by_watermark"] == 1
        assert m["watermark"] is not None

        # listener path agrees (it saw the same progress events)
        t = auditor.totals(q.id)
        assert t["dropped_by_watermark"] == 1
        assert t["input_rows"] == 5
    finally:
        spark.streams.removeListener(auditor)


def test_no_drops_reported_for_in_order_stream(spark, tmp_path):
    schema_src = load(spark, SF, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    base = datetime(2024, 6, 1, 12, 0, 0)
    src = str(tmp_path / "ordered_events")
    rows = [
        Row(user_id=1, ts=base + timedelta(hours=h), event_type="click", value=1.0)
        for h in range(4)
    ]
    spark.createDataFrame(rows, schema_src.schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema_src.schema).parquet(src)
    q = (
        SW.tumbling_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ordered_audit_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    m = watermark_policy_metrics(q)
    assert m["input_rows"] == 4
    assert m["dropped_by_watermark"] == 0

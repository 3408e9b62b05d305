"""File-drop trigger (SURVEY.md §2.8 ST1): new files in a landing
directory fire the 4-stage pipeline per micro-batch.

Reference behavior: upload saved to data/landing/ then pipeline spawned
on it (python_code/api/server.js:172-200; ApiServlet.java:595-661).
Spark-native: a Structured Streaming file source watches the directory;
``foreachBatch`` runs the same stage transformations and control-table
lifecycle as the batch runner — one run per micro-batch.

Checkpointing makes the trigger exactly-once per file across restarts
(the reference gets at-most-once via filesystem moves).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession, functions as F, types as T

from ..runner import PipelineRunner

UPLOAD_SCHEMA = T.StructType(
    [
        T.StructField("OrderId", T.StringType()),
        T.StructField("CustomerId", T.StringType()),
        T.StructField("Amount", T.StringType()),
        T.StructField("OrderDate", T.StringType()),
    ]
)


def batch_run_id(checkpoint_key: str, batch_id: int) -> str:
    """Deterministic run id per (checkpoint, batch): foreachBatch is
    at-least-once, so a replayed micro-batch must map to the SAME run."""
    return str(uuid.uuid5(uuid.NAMESPACE_URL, f"adp://{checkpoint_key}#{batch_id}"))


def run_batch_idempotent(
    runner: PipelineRunner,
    batch_df,
    batch_id: int,
    checkpoint_key: str,
    source_type: str,
    pipeline_name: str,
) -> str | None:
    """Run one micro-batch through the pipeline exactly once per
    batch_id: a replay after a crash-between-run-and-checkpoint finds
    the deterministic run_id already Succeeded and skips, instead of
    appending a duplicate run (and duplicate stage rows)."""
    rid = batch_run_id(checkpoint_key, batch_id)
    existing = (
        runner.control.runs(runner.spark)
        .filter((F.col("run_id") == rid) & (F.col("status") == "Success"))
        .take(1)
    )
    if existing:
        return None
    runner.run(
        source_df=batch_df,
        source_type=source_type,
        pipeline_name=pipeline_name,
        run_id=rid,
    )
    return rid


def start_file_trigger(
    spark: SparkSession,
    runner: PipelineRunner,
    landing_dir: str,
    checkpoint_dir: str | None = None,
    pipeline_name: str = "FileTriggerPipeline",
    fmt: str = "csv",
):
    """Start the streaming trigger; returns the StreamingQuery.

    Each discovered file's rows arrive as one micro-batch; the batch is
    pushed through pull->extract->transform->migrate with full control-
    table bookkeeping via ``runner.run(source_df=...)``.
    """
    os.makedirs(landing_dir, exist_ok=True)
    checkpoint_dir = checkpoint_dir or os.path.join(
        runner.workdir, "checkpoints", "file_trigger"
    )
    reader = spark.readStream.schema(UPLOAD_SCHEMA)
    if fmt == "csv":
        stream = reader.option("header", True).csv(landing_dir)
    elif fmt == "json":
        stream = reader.json(landing_dir)
    else:
        raise ValueError(f"unsupported stream format: {fmt} (.csv/.json only)")

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        run_batch_idempotent(
            runner,
            batch_df,
            batch_id,
            checkpoint_key=checkpoint_dir,
            source_type=f"Stream-{fmt.upper()}",
            pipeline_name=pipeline_name,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

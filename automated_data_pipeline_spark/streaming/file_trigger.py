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

from pyspark.sql import SparkSession, types as T

from ..runner import PipelineRunner

UPLOAD_SCHEMA = T.StructType(
    [
        T.StructField("OrderId", T.StringType()),
        T.StructField("CustomerId", T.StringType()),
        T.StructField("Amount", T.StringType()),
        T.StructField("OrderDate", T.StringType()),
    ]
)


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
        runner.run(
            source_df=batch_df,
            source_type=f"Stream-{fmt.upper()}",
            pipeline_name=pipeline_name,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

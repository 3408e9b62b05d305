"""The four pipeline stages as pure DataFrame transformations
(SURVEY.md §3.1; reference: python_code/orchestrator/steps/{pull,extract,
transform,migrate}.js and java_code/.../steps/*.java).

Each stage is DataFrame-in/DataFrame-out; materialization (stage-table
writes, partitioned by run_id for partition-pruned per-run reads) is the
runner's job. That separation is what makes the same stage code usable in
batch, in foreachBatch streaming, and in tests without I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import business, cleaning


def pull(resolved: DataFrame, run_id: str, source_type: str) -> DataFrame:
    """Stage 1 — Data Pull: tag resolved input rows with the run and keep
    the stringly landing shape (pull.js:29 RunId tag, :55-61 landing insert).

    ``ingest_seq`` preserves intra-file row order (monotonic within and
    across file partitions in file-read order) so duplicate business keys
    can resolve last-row-wins at Migrate like the reference's row-at-a-time
    upsert loop (migrate.js:10-16). Not a business key — never used as one.
    """
    return resolved.select(
        F.lit(run_id).alias("run_id"),
        F.lit(source_type).alias("source_type"),
        F.col("OrderId").alias("order_id"),
        F.col("CustomerId").alias("customer_id"),
        F.col("Amount").alias("amount"),
        F.col("OrderDate").alias("order_date"),
        F.col("raw_payload"),
        F.monotonically_increasing_id().alias("ingest_seq"),
    )


def extract(landing: DataFrame) -> DataFrame:
    """Stage 2 — Extract: landing -> typed staging (P1 typed projection,
    P2 invalid-row filter, F1-F5 coercions).

    Reference: 003_sp_extract.sql:15-24; extract.js:11-17;
    ExtractStep.java:31-63.
    """
    return landing.filter(cleaning.valid_order_id(F.col("order_id"))).select(
        F.col("run_id"),
        F.trim("order_id").alias("order_id"),
        cleaning.default_customer(F.col("customer_id")).alias("customer_id"),
        cleaning.safe_amount(F.col("amount")).alias("amount"),
        cleaning.safe_date(F.col("order_date")).alias("order_date"),
        F.col("ingest_seq"),
    )


def transform(staging: DataFrame, fail_on_negative: bool = False) -> DataFrame:
    """Stage 3 — Transform: add the amount_category business rule (F6).

    Reference: transform.js:13; 004_sp_transform.sql:21-25. With
    ``fail_on_negative`` the Java reference's deliberate error path
    (TransformStep.java:33-35) raises before any rows flow.
    """
    if fail_on_negative:
        business.check_no_negative_amounts(staging, "amount")
    return staging.withColumn(
        "amount_category", business.amount_category(F.col("amount"))
    )


def dedup_last_wins(updates: DataFrame, key: str = "order_id", order_col: str = "ingest_seq") -> DataFrame:
    """Pre-merge dedup: keep the last row per business key, matching the
    reference's row-at-a-time ON CONFLICT loop where later rows overwrite
    earlier ones within a batch (migrate.js:10-16). SQL Server MERGE would
    *fail* on duplicate source keys (005_sp_migrate.sql) — canonical
    decision: last-row-wins (both runnable impls agree).
    """
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def migrate_updates(transformed: DataFrame, run_id_col: str = "run_id") -> DataFrame:
    """Stage 4 prep — shape the transformed rows as target-table updates
    (005_sp_migrate.sql:14-24 column list), stamped migrated_at."""
    deduped = dedup_last_wins(transformed)
    return deduped.select(
        "order_id",
        "customer_id",
        "amount",
        "order_date",
        "amount_category",
        F.col(run_id_col).alias("run_id"),
        F.current_timestamp().alias("migrated_at"),
    )

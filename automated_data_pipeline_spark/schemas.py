"""Canonical schemas for the orders dataflow and the control plane.

Stage-table semantics follow the reference DDL:
- landing: raw, stringly, retains raw payload
  (reference: python_code/database/sqlite_schema.sql:49-60)
- staging: typed + NOT NULL business key
  (reference: python_code/database/sqlite_schema.sql:63-72,
   python_code/database/sqlserver/002_landing_staging_target.sql:23-36)
- staging_transformed: staging + amount_category
  (reference: python_code/database/sqlite_schema.sql:75-85)
- target: upsert-merged on order_id, stamped migrated_at
  (reference: python_code/database/sqlite_schema.sql:88-96)
- control tables (pipeline_runs/step_runs/pipeline_logs/pipeline_schedules):
  python_code/database/sqlite_schema.sql:5-46,
  java_code/src/main/resources/sqlserver_schema.sql:105-119

Money is DecimalType(18,2) — the SQL-Server-intent canonical
(002_landing_staging_target.sql:12) — rather than the REAL/FLOAT the
runnable impls use; exact decimal arithmetic is also what survives
distributed, order-nondeterministic summation.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical input columns, matched case-insensitively at ingest
# (reference: python_code/orchestrator/steps/pull.js:30-33).
CANONICAL_INPUT_COLUMNS = ["OrderId", "CustomerId", "Amount", "OrderDate"]

LANDING_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("source_type", T.StringType(), True),
        T.StructField("order_id", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("amount", T.StringType(), True),
        T.StructField("order_date", T.StringType(), True),
        T.StructField("raw_payload", T.StringType(), True),
        T.StructField("ingest_seq", T.LongType(), True),
    ]
)

STAGING_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("order_id", T.StringType(), False),
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("amount", T.DecimalType(18, 2), True),
        T.StructField("order_date", T.DateType(), True),
        T.StructField("ingest_seq", T.LongType(), True),
    ]
)

TRANSFORMED_SCHEMA = T.StructType(
    STAGING_SCHEMA.fields
    + [T.StructField("amount_category", T.StringType(), True)]
)

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), False),
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("amount", T.DecimalType(18, 2), True),
        T.StructField("order_date", T.DateType(), True),
        T.StructField("amount_category", T.StringType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("migrated_at", T.TimestampType(), True),
    ]
)

PIPELINE_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("run_number", T.LongType(), True),
        T.StructField("pipeline_name", T.StringType(), True),
        T.StructField("adf_run_id", T.StringType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

STEP_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("step_number", T.IntegerType(), False),
        T.StructField("step_name", T.StringType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("rows_affected", T.LongType(), True),
        T.StructField("rows_processed", T.LongType(), True),
        T.StructField("rows_total", T.LongType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

PIPELINE_LOGS_SCHEMA = T.StructType(
    [
        T.StructField("log_id", T.LongType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("pipeline_name", T.StringType(), True),
        T.StructField("log_at", T.TimestampType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("step_number", T.IntegerType(), True),
        T.StructField("step_name", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("details", T.StringType(), True),
    ]
)

PIPELINE_SCHEDULES_SCHEMA = T.StructType(
    [
        T.StructField("schedule_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("schedule_type", T.StringType(), True),  # daily|weekly|monthly
        T.StructField("run_at_time", T.StringType(), True),  # "HH:mm"
        T.StructField("day_of_week", T.IntegerType(), True),  # 1=Mon..7=Sun
        T.StructField("day_of_month", T.IntegerType(), True),
        T.StructField("source_path", T.StringType(), True),
        T.StructField("enabled", T.BooleanType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("last_run_at", T.TimestampType(), True),
        T.StructField("next_run_at", T.TimestampType(), True),
    ]
)

# Step names, in order (reference: python_code/orchestrator/index.js:43).
STEP_NAMES = ["Data Pull", "Extract", "Transform", "Migrate"]

"""The declared query suite: every operator from SURVEY.md §2 plus the
LLM-pipeline extensions, each as a (spark_fn, duckdb_oracle_sql) pair.

Cross-engine determinism conventions (the driver hash-compares values):
- money/double aggregates: cast to DECIMAL before SUM (exact, order-
  independent), round + cast to double for output
- timestamps: output as formatted strings or dates, never raw
  timestamps (tz-awareness differs across engines' pandas conversion)
- rankings: rank on the *rounded* score with an id tie-break
- hashing: md5-derived ``stable_hash64`` (identical in both engines)
- LIMIT queries: fully deterministic ORDER BY (unique key suffix)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries TIMESTAMP(NANOS) which the Spark parquet
    # reader rejects; read as long ns and convert to a microsecond
    # timestamp (integer div — double division would lose precision on
    # ns-epoch magnitudes).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def all_specs() -> list[QuerySpec]:
    from . import events, extra, llm, parity

    return parity.SPECS + events.SPECS + llm.SPECS + extra.SPECS


def queries_dict():
    return {s.name: s.fn for s in all_specs()}


def oracles_dict():
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}

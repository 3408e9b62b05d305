"""Bucketed-table helpers for co-located (shuffle-free) joins.

At 100 TB the dominant cost of the repeated target-merge and of any
fact-fact join is re-shuffling both sides on the join key every run.
Writing both sides bucketed by that key (`DISTRIBUTE BY` into a fixed
bucket count via ``bucketBy`` + ``saveAsTable``) lets Spark plan a
SortMergeJoin with NO Exchange on either side — the join reads
co-located buckets directly. The reference's analogue is its B-tree
index on every RunId/OrderId column (SURVEY.md §4): both trade write
cost for read/join locality; buckets are the shuffle-free variant.

These helpers need a metastore-backed table (``saveAsTable``); plain
``.parquet(path)`` writes cannot record bucketing metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``.
    Joins/aggregations on ``key`` between tables bucketed with the same
    count then plan without an Exchange."""
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (used by
    tests to prove bucketed joins are co-located)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan

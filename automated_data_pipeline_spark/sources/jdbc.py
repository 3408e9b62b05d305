"""JDBC source/sink wrapper (SURVEY.md §2.1 S6) — optional connector.

The Java reference does all stage I/O over JDBC with 2000-row batches
(java_code/.../Database.java:91-114; PullStep.java:66). Spark's JDBC
data source subsumes that; this thin wrapper pins the reference's batch
size and the options that matter for parallel reads (partitionColumn
bounds) so a SQL Server deployment gets a partitioned scan, not a
single-threaded one. No driver jar ships in this image — calls fail
with Spark's own CLASS_NOT_FOUND at `.load()`, which is the correct
lazy behavior for an optional connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

REFERENCE_BATCH_SIZE = 2000  # PullStep.java:66


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires explicit lower_bound and upper_bound "
                "(Spark needs the numeric range to split the scan)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = REFERENCE_BATCH_SIZE,
    **options: str,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()

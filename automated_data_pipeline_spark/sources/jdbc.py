"""JDBC source/sink wrapper (SURVEY.md §2.1 S6) — optional connector.

The Java reference does all stage I/O over JDBC with 2000-row batches
(java_code/.../Database.java:91-114; PullStep.java:66). Spark's JDBC
data source subsumes that; this thin wrapper pins the reference's batch
size and the options that matter for parallel reads (partitionColumn
bounds) so a SQL Server deployment gets a partitioned scan, not a
single-threaded one.

Live coverage: no SQL Server driver ships in this image, but Spark
bundles Apache Derby (its Hive-metastore dependency), so the
round-trip IS exercised end-to-end against an embedded Derby database
in tests/test_jdbc_roundtrip.py — write, plain read, and partitioned
read. For other engines, calls fail with Spark's own CLASS_NOT_FOUND
at `.load()`, the correct lazy behavior for an optional connector.

``JdbcConfig`` + ``resolve_overrides`` port the reference's
per-request DB override plumbing (ApiServlet.java:608-651 accepts
dbHost/dbPort/dbUser/dbPassword form fields; Database.java:104-114
builds the URL, applying overrides only when host, port, or user is
explicitly provided — password alone is ignored).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

REFERENCE_BATCH_SIZE = 2000  # PullStep.java:66

# Derby ships in Spark's jars/ — the always-available embedded engine
# for tests and local deployments.
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@dataclass(frozen=True)
class JdbcConfig:
    """Connection settings with reference-default semantics
    (Database.java:60-88: env-or-default host/port/db/user/password)."""

    host: str = "localhost"
    port: int = 1433
    database: str = "PipelineDB"
    user: str | None = None
    password: str | None = None
    scheme: str = "sqlserver"

    def url(self) -> str:
        """Database.java:buildJdbcUrl — sqlserver keeps the reference's
        encrypt/trust flags; other schemes get the plain form."""
        if self.scheme == "sqlserver":
            return (
                f"jdbc:sqlserver://{self.host}:{self.port};"
                f"databaseName={self.database};"
                "encrypt=true;trustServerCertificate=true"
            )
        return f"jdbc:{self.scheme}://{self.host}:{self.port}/{self.database}"

    def spark_options(self) -> dict[str, str]:
        opts: dict[str, str] = {"url": self.url()}
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        return opts


def resolve_overrides(
    base: JdbcConfig,
    host: str | None = None,
    port: int | None = None,
    user: str | None = None,
    password: str | None = None,
) -> JdbcConfig:
    """Per-request override rule (ApiServlet.java:645-651): overrides
    apply only when host, port, or user is EXPLICITLY provided;
    a password by itself is discarded (it belongs to an override
    credential set, not the configured one). Blank strings count as
    not-provided, mirroring the servlet's trim/isEmpty checks."""
    host = host.strip() if host and host.strip() else None
    user = user.strip() if user and user.strip() else None
    # password gets the same blank-is-absent rule: a form that always
    # POSTs the field as '' must not override the configured credential
    password = password if password and password.strip() else None
    if host is None and port is None and user is None:
        return base
    return replace(
        base,
        host=host or base.host,
        port=port if port is not None else base.port,
        user=user or base.user,
        password=password if password is not None else base.password,
    )


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

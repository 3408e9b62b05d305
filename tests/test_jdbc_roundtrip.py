"""Live JDBC round-trip (VERDICT r3 item 7): Spark bundles Apache
Derby, so the S6 connector is exercised against a real embedded
database — write with the reference's 2000-row batching, read back
plain and partitioned, and the per-request override plumbing
(ApiServlet.java:608-651 / Database.java:104-114 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.sources import jdbc


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def test_write_then_read_roundtrip(spark, derby_url):
    df = spark.range(1000).select(
        F.col("id").alias("order_key"),
        (F.col("id") % 7).cast("double").alias("amount"),
        F.concat(F.lit("cust-"), (F.col("id") % 13).cast("string")).alias(
            "customer"
        ),
    )
    jdbc.write_jdbc(df, derby_url, "orders_t", mode="overwrite",
                    driver=jdbc.DERBY_DRIVER)
    back = jdbc.read_jdbc(spark, derby_url, "orders_t", driver=jdbc.DERBY_DRIVER)
    assert back.count() == 1000
    assert set(c.lower() for c in back.columns) == {
        "order_key", "amount", "customer",
    }
    got = back.agg(F.sum("amount").alias("s")).first()["s"]
    want = df.agg(F.sum("amount").alias("s")).first()["s"]
    assert got == want


def test_partitioned_read_splits_scan(spark, derby_url):
    df = spark.range(500).select(F.col("id").alias("k"),
                                 (F.col("id") * 3).alias("v"))
    jdbc.write_jdbc(df, derby_url, "part_t", mode="overwrite",
                    driver=jdbc.DERBY_DRIVER)
    back = jdbc.read_jdbc(
        spark, derby_url, "part_t",
        partition_column="k", lower_bound=0, upper_bound=500,
        num_partitions=4, driver=jdbc.DERBY_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 500
    # bounds only split the scan — rows outside [lower, upper) must
    # still arrive (Spark puts them in the edge partitions)
    assert back.agg(F.max("v")).first()[0] == 499 * 3


def test_partition_column_requires_bounds(spark, derby_url):
    with pytest.raises(ValueError, match="lower_bound"):
        jdbc.read_jdbc(spark, derby_url, "t", partition_column="k")


def test_override_resolution_reference_semantics():
    base = jdbc.JdbcConfig(host="dbhost", port=1433, database="PipelineDB",
                           user="svc", password="secret")
    # no explicit host/port/user -> password alone is DISCARDED
    assert jdbc.resolve_overrides(base, password="other") == base
    assert jdbc.resolve_overrides(base, host="  ", user="") == base
    # explicit host activates the override set; unset fields fall back
    o = jdbc.resolve_overrides(base, host="replica", password="r-pass")
    assert (o.host, o.port, o.user, o.password) == (
        "replica", 1433, "svc", "r-pass"
    )
    o2 = jdbc.resolve_overrides(base, port=14330, user="ro")
    assert (o2.host, o2.port, o2.user) == ("dbhost", 14330, "ro")
    assert base.url().startswith("jdbc:sqlserver://dbhost:1433;databaseName=")
    assert "trustServerCertificate=true" in base.url()

"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship 4-stage dataflow (Pull->Extract->Transform
  semantics) + category revenue rollup over sf0.001.
- ``queries()``: 134 named queries — every implemented operator from
  SURVEY.md §2 (parity), event-time analytics, temporal/OLAP extensions,
  and the LLM-pipeline family (dedup, similarity, text analysis,
  multimodal) — see automated_data_pipeline_spark/suite/ and the
  coverage matrix in README.md. The first 50 (the driver's gate window,
  suite.GATE_WINDOW) all carry oracles; tests/test_suite_contract.py
  asserts the counts and the window composition.
- ``oracle_sql()``: DuckDB twins for 129 of them — including the SimHash
  band join (pigeonhole-exact vs the quadratic spec), the RHP-LSH
  queries (deterministic md5-derived hyperplanes re-derived in SQL),
  and the mapInPandas featurization (integer byte-bucket accumulators
  re-derived from hex(encode(text)) in SQL). The 5 rows-only entries
  (IVF / PQ / IVF-PQ ANN: k-means quantizers; BPE training:
  iterative; approx aggregates: HLL++/t-digest) are
  non-SQL-expressible by construction and are pinned by pytest unit
  oracles instead (tests/test_pq.py: encode parity, ADC==LUT-sum,
  recall floors; tests/test_text_hashes.py, tests/test_multimodal.py,
  tests/test_scale_plans.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    Extract+Transform semantics applied to the orders fixture, rolled up
    into the category/revenue summary the monitoring GUI would chart."""
    from automated_data_pipeline_spark.functions import business, cleaning
    from automated_data_pipeline_spark.suite import load

    o = load(spark, "/root/testdata/sf0.001", "orders")
    landing = o.select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("customer_id"),
        # scale prices into the reference's order-of-magnitude so the
        # Low/Medium/High rule produces a real spread
        F.round(F.col("o_totalprice") / 1000, 2).cast("string").alias("amount"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )
    staged = landing.filter(cleaning.valid_order_id(F.col("order_id"))).select(
        F.trim("order_id").alias("order_id"),
        cleaning.default_customer(F.col("customer_id")).alias("customer_id"),
        cleaning.safe_amount(F.col("amount")).alias("amount"),
        cleaning.safe_date(F.col("order_date")).alias("order_date"),
    )
    transformed = staged.withColumn(
        "amount_category", business.amount_category(F.col("amount"))
    )
    return transformed.groupBy("amount_category").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("amount"), 2).cast("double").alias("total_amount"),
        F.countDistinct("customer_id").alias("n_customers"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from automated_data_pipeline_spark.suite import queries_dict

    return queries_dict()


def oracle_sql() -> dict[str, str]:
    from automated_data_pipeline_spark.suite import oracles_dict

    return oracles_dict()

"""DuckDB baseline for BASELINE.md: times the single-node DuckDB
equivalent of every headline workload bench.py measures on Spark.

- headline queries: each suite query's own oracle SQL (the DuckDB twin
  of the Spark plan) over the same sf parquet, warm-timed like bench.py
- pipeline_{100k,1m}: the 4-stage dataflow (landing -> staging ->
  transformed -> ON CONFLICT upsert target) as DuckDB tables over the
  same generated CSV bytes
- upsert_rerun_1m: B4 — re-merge 1M rows with 50% overlapping keys into
  an existing 1M-row target

Usage: python tools/duck_baseline.py [sf_dir]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# dedup_jaccard_pairs is excluded by default: its oracle is deliberately
# the naive all-pairs formulation (the *specification*, not a tuned
# implementation) and needs >30min at sf0.1. Pass --all to include it.
SLOW_ORACLES = {"dedup_jaccard_pairs"}

PIPELINE_SQL = [
    # Pull: CSV -> landing (stringly, run-tagged, raw payload NULL for CSV)
    """CREATE TABLE landing AS
       SELECT 'run-1' AS run_id, 'CSV' AS source_type,
              CAST(OrderId AS VARCHAR) AS order_id,
              CAST(CustomerId AS VARCHAR) AS customer_id,
              CAST(Amount AS VARCHAR) AS amount,
              CAST(OrderDate AS VARCHAR) AS order_date,
              NULL AS raw_payload
       FROM read_csv('{csv}/*.csv', header=true, all_varchar=true)""",
    # Extract: trim/filter/coerce (canonical semantics: default-0 amount,
    # UNKNOWN customer, null-on-bad-date)
    """CREATE TABLE staging AS
       SELECT run_id, trim(order_id) AS order_id,
              CASE WHEN nullif(trim(customer_id), '') IS NULL THEN 'UNKNOWN'
                   ELSE trim(customer_id) END AS customer_id,
              coalesce(try_cast(trim(amount) AS DECIMAL(18,2)), 0) AS amount,
              try_cast(trim(order_date) AS DATE) AS order_date
       FROM landing
       WHERE run_id = 'run-1' AND nullif(trim(order_id), '') IS NOT NULL""",
    # Transform: amount bucketing business rule
    """CREATE TABLE staging_t AS
       SELECT *, CASE WHEN amount < 50 THEN 'Low'
                      WHEN amount < 200 THEN 'Medium'
                      ELSE 'High' END AS amount_category
       FROM staging WHERE run_id = 'run-1'""",
    # Migrate: last-wins pre-dedup + upsert keyed on order_id
    """CREATE TABLE IF NOT EXISTS target (
         order_id VARCHAR PRIMARY KEY, customer_id VARCHAR,
         amount DECIMAL(18,2), order_date DATE,
         amount_category VARCHAR, migrated_at TIMESTAMP)""",
    """INSERT INTO target
       SELECT order_id, customer_id, amount, order_date, amount_category,
              now()::TIMESTAMP
       FROM (SELECT *, row_number() OVER (PARTITION BY order_id
                                          ORDER BY rowid DESC) rn
             FROM staging_t WHERE run_id = 'run-1')
       WHERE rn = 1
       ON CONFLICT (order_id) DO UPDATE SET
         customer_id = excluded.customer_id, amount = excluded.amount,
         order_date = excluded.order_date,
         amount_category = excluded.amount_category,
         migrated_at = excluded.migrated_at""",
]


def _gen_orders_csv(spark, n_rows: int, path: str, offset: int = 0) -> None:
    from pyspark.sql import functions as F

    from automated_data_pipeline_spark.sources.generators import generate_orders

    df = generate_orders(spark, n_rows)
    if offset:
        df = df.withColumn(
            "OrderId",
            F.format_string(
                "ORD-%06d",
                (F.regexp_extract("OrderId", r"(\d+)", 1).cast("long") + offset).cast(
                    "int"
                ),
            ),
        )
    df.write.option("header", True).mode("overwrite").csv(path)


def time_pipeline(con: duckdb.DuckDBPyConnection, csv_dir: str) -> float:
    for t in ["landing", "staging", "staging_t", "target"]:
        con.execute(f"DROP TABLE IF EXISTS {t}")
    t0 = time.time()
    for sql in PIPELINE_SQL:
        con.execute(sql.format(csv=csv_dir))
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.1"
    include_slow = "--all" in sys.argv

    from automated_data_pipeline_spark.session import get_spark
    from automated_data_pipeline_spark.suite import all_specs

    import bench

    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = {s.name: s for s in all_specs()}
    timings: dict[str, float | None] = {}
    for name in bench.HEADLINE:
        s = specs[name]
        if s.oracle is None or (name in SLOW_ORACLES and not include_slow):
            timings[name] = None  # approximate-by-construction: no SQL twin
            continue
        con.execute(s.oracle).fetchall()  # warm
        t0 = time.time()
        con.execute(s.oracle).fetchall()
        timings[name] = round(time.time() - t0, 3)

    # pipeline workloads over generated CSV (same bytes Spark ingests)
    spark = get_spark("duck-baseline-gen", shuffle_partitions=16)
    work = tempfile.mkdtemp(prefix="duck-baseline-")
    try:
        csv_100k = os.path.join(work, "orders_100k")
        csv_1m = os.path.join(work, "orders_1m")
        csv_1m_b = os.path.join(work, "orders_1m_overlap")
        _gen_orders_csv(spark, 100_000, csv_100k)
        _gen_orders_csv(spark, 1_000_000, csv_1m)
        # 50% overlapping keys: ids shifted by half the range (B4)
        _gen_orders_csv(spark, 1_000_000, csv_1m_b, offset=500_000)
        spark.stop()

        pcon = duckdb.connect(os.path.join(work, "pipe.db"))
        pcon.execute("SET threads=32")
        timings["pipeline_100k_orders"] = time_pipeline(pcon, csv_100k)
        pcon2 = duckdb.connect(os.path.join(work, "pipe2.db"))
        pcon2.execute("SET threads=32")
        timings["pipeline_1m_orders"] = time_pipeline(pcon2, csv_1m)
        # B4: rerun the merge with 50% overlap into the existing target
        for t in ["landing", "staging", "staging_t"]:
            pcon2.execute(f"DROP TABLE IF EXISTS {t}")
        t0 = time.time()
        for sql in PIPELINE_SQL:
            pcon2.execute(sql.format(csv=csv_1m_b))
        timings["upsert_rerun_1m"] = round(time.time() - t0, 3)
        n = pcon2.execute("SELECT count(*) FROM target").fetchone()[0]
        assert n == 1_500_000, f"B4 invariant: expected 1.5M target rows, got {n}"
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out = {
        "metric": "duckdb_baseline_total",
        "value": round(sum(v for v in timings.values() if v is not None), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Reference-operator parity queries (SURVEY.md §2) over the driver's
TPC-H-ish fixtures, each with a DuckDB oracle twin.

The orders/lineitem/customer tables stand in for the reference's
control/data tables: every query shape the reference implements —
typed extraction with coercions, bucketing, conjunctive filters, point
lookups, top-N, 1:N joins, upsert-merge, run numbering — is expressed
here Spark-first (citations to the reference behavior in each spec).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import business, cleaning
from ..operators import upsert
from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


# --------------------------------------------------------------------
# P1/P2/F1-F5: typed extraction with the canonical coercion semantics
# (003_sp_extract.sql:15-24; extract.js:11-17). The orders table is
# roughed up deterministically (blanks/junk injected by key modulus) so
# every coercion rule actually fires.
@spec(
    "extract_typed_projection",
    """
    WITH landing AS (
      SELECT
        CASE WHEN o_orderkey % 41 = 0 THEN '  ' ELSE '  ORD-' || CAST(o_orderkey AS VARCHAR) || ' ' END AS order_id_raw,
        CASE WHEN o_custkey % 7 = 0 THEN ' ' ELSE 'C' || CAST(o_custkey AS VARCHAR) END AS customer_raw,
        CASE WHEN o_orderkey % 13 = 0 THEN 'junk' ELSE CAST(o_totalprice AS VARCHAR) END AS amount_raw,
        CASE WHEN o_orderkey % 17 = 0 THEN 'not-a-date' ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_raw
      FROM orders
    )
    SELECT
      trim(order_id_raw) AS order_id,
      coalesce(nullif(trim(customer_raw), ''), 'UNKNOWN') AS customer_id,
      CAST(coalesce(TRY_CAST(trim(amount_raw) AS DECIMAL(18,2)), 0) AS DOUBLE) AS amount,
      TRY_CAST(trim(date_raw) AS DATE) AS order_date
    FROM landing
    WHERE order_id_raw IS NOT NULL AND trim(order_id_raw) <> ''
    """,
    "P1+P2+F1-F5 extraction semantics",
)
def extract_typed_projection(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    landing = o.select(
        F.when(F.col("o_orderkey") % 41 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit("  ORD-"), F.col("o_orderkey").cast("string"), F.lit(" ")))
        .alias("order_id_raw"),
        F.when(F.col("o_custkey") % 7 == 0, F.lit(" "))
        .otherwise(F.concat(F.lit("C"), F.col("o_custkey").cast("string")))
        .alias("customer_raw"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("junk"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("amount_raw"),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("not-a-date"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("date_raw"),
    )
    return landing.filter(cleaning.valid_order_id(F.col("order_id_raw"))).select(
        F.trim("order_id_raw").alias("order_id"),
        cleaning.default_customer(F.col("customer_raw")).alias("customer_id"),
        cleaning.safe_amount(F.col("amount_raw")).cast("double").alias("amount"),
        cleaning.safe_date(F.col("date_raw")).alias("order_date"),
    )


# --------------------------------------------------------------------
# F6 + A2: the Low/Medium/High business rule as a grouped aggregation
# (transform.js:13; 004_sp_transform.sql:21-25) over customer balances.
@spec(
    "transform_amount_category",
    """
    SELECT
      CASE WHEN c_acctbal < 50 THEN 'Low' WHEN c_acctbal < 200 THEN 'Medium' ELSE 'High' END AS amount_category,
      count(*) AS n,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY 1
    """,
    "F6 bucketing + A2 counts",
)
def transform_amount_category(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return (
        c.withColumn("amount_category", business.amount_category(F.col("c_acctbal")))
        .groupBy("amount_category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_balance"),
        )
    )


# --------------------------------------------------------------------
# P3 + O1: conjunctive equality filters + ORDER BY ... LIMIT 100
# (api/server.js:47-57: pipeline/status filters, top-100 recent).
@spec(
    "list_runs_filtered_top100",
    """
    SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 100
    """,
    "P3 conjunctive filters + O1 top-100",
)
def list_runs_filtered_top100(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT"))
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(100)
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total"),
        )
    )


# --------------------------------------------------------------------
# P5: point lookup by key (GET /runs/:id; api/server.js:86-88).
@spec(
    "run_point_lookup",
    """
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)
    """,
    "P5 key lookup",
)
def run_point_lookup(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    # lazy scalar-subquery shape: the min key rides as a broadcast
    # 1-row frame instead of an eager .first() at build time (which ran
    # a separate job per invocation and froze a stale literal into the
    # returned plan)
    mk = o.agg(F.min("o_orderkey").alias("_mk"))
    return (
        o.join(F.broadcast(mk), o["o_orderkey"] == mk["_mk"])
        .select(
            "o_orderkey", "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"),
        )
    )


# --------------------------------------------------------------------
# P6 + A2: status predicate sweep + counts (ApiServlet.java:414-427).
@spec(
    "status_sweep_counts",
    "SELECT o_orderstatus AS status, count(*) AS n FROM orders GROUP BY 1",
    "P6 status sweep",
)
def status_sweep_counts(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------
# P7: due-schedule predicate (Enabled AND NextRunAt <= now;
# ScheduleRunner.java:39) over the events fixture.
@spec(
    "due_schedule_predicate",
    """
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
    FROM events
    WHERE event_type = 'signup' AND value IS NOT NULL
      AND ts <= TIMESTAMP '2024-01-15 00:00:00'
    """,
    "P7 due-schedule shape",
)
def due_schedule_predicate(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.filter(
        (F.col("event_type") == "signup")
        & F.col("value").isNotNull()
        & (F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    ).select("event_id", "user_id", F.unix_millis("ts").alias("ts_ms"))


# --------------------------------------------------------------------
# O2: recent-N clamped (logs list; api/server.js:157-158).
@spec(
    "recent_logs_clamped",
    """
    SELECT event_id, event_type, epoch_ms(ts) AS ts_ms
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 500
    """,
    "O2 recent-N clamp",
)
def recent_logs_clamped(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(500)
        .select("event_id", "event_type", F.unix_millis("ts").alias("ts_ms"))
    )


# --------------------------------------------------------------------
# O3: ordered scan of one parent's children (steps by step_number;
# api/server.js:100).
@spec(
    "ordered_steps_scan",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey = (SELECT min(o_orderkey) FROM orders)
    ORDER BY l_linenumber
    """,
    "O3 ordered scan",
)
def ordered_steps_scan(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    mk = o.agg(F.min("o_orderkey").alias("_mk"))
    return (
        li.join(F.broadcast(mk), li["l_orderkey"] == mk["_mk"])
        .orderBy("l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --------------------------------------------------------------------
# A1: MAX+1 run numbering (index.js:36).
@spec(
    "max_plus_one_run_number",
    "SELECT coalesce(max(o_orderkey), 0) + 1 AS next_run_number FROM orders",
    "A1 run numbering",
)
def max_plus_one_run_number(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .agg((F.coalesce(F.max("o_orderkey"), F.lit(0)) + 1).alias("next_run_number"))
    )


# --------------------------------------------------------------------
# A4: derived overall status from step states (projectplan.md:254-255):
# any error -> Failed, else any view -> Running, else Success — per user.
@spec(
    "derived_run_status",
    """
    SELECT user_id,
      CASE max(CASE WHEN event_type = 'error' THEN 2 WHEN event_type = 'view' THEN 1 ELSE 0 END)
        WHEN 2 THEN 'Failed' WHEN 1 THEN 'Running' ELSE 'Success' END AS derived_status
    FROM events GROUP BY user_id
    """,
    "A4 derived status",
)
def derived_run_status(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    rank = (
        F.when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "view", 1)
        .otherwise(0)
    )
    return (
        e.withColumn("_r", rank)
        .groupBy("user_id")
        .agg(F.max("_r").alias("_m"))
        .select(
            "user_id",
            F.when(F.col("_m") == 2, "Failed")
            .when(F.col("_m") == 1, "Running")
            .otherwise("Success")
            .alias("derived_status"),
        )
    )


# --------------------------------------------------------------------
# A5/A1-backfill: run-number synthesis via row_number over created order
# (api/server.js:63-69; db.js:30-34).
@spec(
    "run_number_backfill",
    """
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS run_number
    FROM orders
    """,
    "A5 window enumeration",
)
def run_number_backfill(spark, sf_dir):
    """Globally-ordered enumeration at DATA scale (reference semantics:
    api/server.js:63-69, db.js:30-34). Rewritten in round 6 from a bare
    ``row_number() OVER (ORDER BY ...)`` — which Spark executes as an
    Exchange SinglePartition + one-reducer WindowExec — to the
    two-phase distributed enumeration (range exchange, per-partition
    row_number, O(partitions) broadcast offsets). Same answer, no
    single-partition stage; plan pinned by tests/test_scale_plans.py.
    """
    from ..operators.sampling import distributed_row_number

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    out = distributed_row_number(
        o, ["o_orderdate", "o_orderkey"], out_col="run_number"
    )
    return out.select("o_orderkey", "run_number")


# --------------------------------------------------------------------
# J1 (flattened): run ⋈ steps 1:N (api/server.js:80-108). Left join so
# parents without children survive, like runs with zero steps.
@spec(
    "run_steps_join",
    """
    SELECT o.o_orderkey, o.o_orderstatus, l.l_linenumber, l.l_quantity,
           round(l.l_extendedprice, 2) AS price
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    "J1 1:N join",
)
def run_steps_join(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey",
        "o_orderstatus",
        "l_linenumber",
        "l_quantity",
        F.round("l_extendedprice", 2).alias("price"),
    )


# --------------------------------------------------------------------
# J4: referential existence checks as semi/anti joins
# (FK guards; api/server.js:95-98).
@spec(
    "customers_with_orders_semi",
    "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    "J4 semi join",
)
def customers_with_orders_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@spec(
    "customers_without_orders_anti",
    "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
    "J4 anti join",
)
def customers_without_orders_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


# --------------------------------------------------------------------
# S7/J3: the upsert merge, as the anti-join+union rewrite the Migrate
# stage uses (migrate.js:7-17; 005_sp_migrate.sql:14-24). Target =
# even keys, updates = keys divisible by 3 with doubled amounts.
@spec(
    "upsert_merge",
    """
    WITH target AS (
      SELECT o_orderkey AS order_id, round(o_totalprice, 2) AS amount
      FROM orders WHERE o_orderkey % 2 = 0
    ), updates AS (
      SELECT o_orderkey AS order_id, round(o_totalprice * 2, 2) AS amount
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT order_id, amount FROM updates
    UNION ALL
    SELECT t.order_id, t.amount FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.order_id = t.order_id)
    """,
    "S7 upsert via anti-join+union",
)
def upsert_merge(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("order_id"), F.round("o_totalprice", 2).alias("amount")
    )
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.round(F.col("o_totalprice") * 2, 2).alias("amount"),
    )
    return upsert.upsert_replace(target, updates, key="order_id")


# --------------------------------------------------------------------
# Scalar function showcase F12-F17 (date format, date add, concat,
# format_string, modulo) — generator recipes (generate-large-csv.mjs).
@spec(
    "scalar_function_suite",
    """
    SELECT
      o_orderkey,
      printf('ORD-%06d', CAST(o_orderkey % 1000000 AS INT)) AS order_ref,
      'C' || CAST(o_custkey % 2000 + 1 AS VARCHAR) AS customer_ref,
      strftime(o_orderdate, '%Y-%m-%d') AS order_date_iso,
      CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INT) AS ship_by,
      CAST(o_orderkey % 14 AS INT) AS amount_cycle_idx
    FROM orders
    """,
    "F12-F17 scalar functions",
)
def scalar_function_suite(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("ORD-%06d", (F.col("o_orderkey") % 1000000).cast("int")).alias(
            "order_ref"
        ),
        F.concat(F.lit("C"), (F.col("o_custkey") % 2000 + 1).cast("string")).alias(
            "customer_ref"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_iso"),
        F.date_add(F.col("o_orderdate").cast("date"), (F.col("o_orderkey") % 30).cast("int")).alias(
            "ship_by"
        ),
        (F.col("o_orderkey") % 14).cast("int").alias("amount_cycle_idx"),
    )


# --------------------------------------------------------------------
# F13: duration = finished - started (RunDetail.jsx:26-29) — per user
# over events, in exact milliseconds.
@spec(
    "duration_per_user",
    """
    SELECT user_id, count(*) AS n_events,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
    FROM events GROUP BY user_id
    """,
    "F13 duration",
)
def duration_per_user(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
    )


# --------------------------------------------------------------------
# Beyond-parity OLAP: pricing summary (TPC-H Q1 shape) with exact
# decimal aggregation — the generic agg surface Spark gives for free.
@spec(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      count(*) AS n,
      CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base,
      CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 shape, decimal-exact",
)
def pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_base"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_disc_price"),
        )
    )


# --------------------------------------------------------------------
# Beyond-parity OLAP: revenue by nation — the multi-join star query;
# small dims broadcast, fact co-shuffles once.
@spec(
    "revenue_by_nation",
    """
    SELECT n.n_name AS nation,
      count(DISTINCT o.o_orderkey) AS n_orders,
      CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY n.n_name
    """,
    "star join + agg",
)
def revenue_by_nation(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# Window surface: running revenue per customer (§2.7 — exposed as
# generic capability; semantics = A1 backfill generalized).
@spec(
    "running_total_per_customer",
    """
    SELECT o_custkey, o_orderkey,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
    FROM orders
    """,
    "window running sum",
)
def running_total_per_customer(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )

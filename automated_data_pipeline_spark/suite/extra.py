"""Advanced relational operators beyond the reference's own surface
(SURVEY.md §2.5 'absent' list + §2.7): as-of join, range join,
rollup/cube/pivot, set operations, exploded top-k, exact percentiles,
JSON extraction, synthetic-source parity, char-gram fingerprints.

Each query has a DuckDB oracle twin; cross-engine conventions per
suite/__init__.py (decimal sums, formatted timestamps, deterministic
orderings).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import joins
from ..sources.generators import AMOUNT_CYCLE, generate_orders
from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name, oracle, doc=""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# --------------------------------------------------------------------
@spec(
    "asof_click_before_purchase",
    f"""
    WITH cp AS (
      SELECT event_id, user_id, ts, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_left
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT *,
        last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, is_left, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, is_left, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
      FROM cp
    )
    SELECT event_id AS purchase_id, user_id,
           strftime(ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           click_id,
           strftime(click_ts, '{_TS_FMT_DUCK}') AS click_ts
    FROM w WHERE is_left = 1
    """,
    "backward as-of join: each purchase to the user's latest prior click",
)
def asof_click_before_purchase(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    out = joins.asof_join_backward(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload={"event_id": "click_id", "ts": "click_ts"},
        left_seq="purchase_id",
        right_seq="event_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("purchase_ts"),
        "click_id",
        F.date_format("click_ts", _TS_FMT_SPARK).alias("click_ts"),
    )


# --------------------------------------------------------------------
_BANDS = [
    ("budget", 0, 10_000),
    ("mid", 10_000, 40_000),
    ("premium", 40_000, 80_000),
    ("luxury", 80_000, 200_000),
]
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS band, {lo} AS lo, {hi} AS hi" for n, lo, hi in _BANDS
)


@spec(
    "range_join_price_bands",
    f"""
    WITH bands AS ({_BANDS_SQL})
    SELECT b.band,
           count(*) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM lineitem l JOIN bands b
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band
    """,
    "range join onto broadcast price bands + aggregate",
)
def range_join_price_bands(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    joined = joins.range_join_bands(li, bands, "l_extendedprice")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# --------------------------------------------------------------------
@spec(
    "revenue_rollup_region_nation",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           GROUPING(r.r_name) AS g_region, GROUPING(n.n_name) AS g_nation,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    "hierarchical rollup over region/nation with grouping flags",
)
def revenue_rollup_region_nation(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "o_totalprice",
        )
    )
    return joined.rollup("region_name", "nation_name").agg(
        F.grouping("region_name").cast("long").alias("g_region"),
        F.grouping("nation_name").cast("long").alias("g_nation"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------
@spec(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "full cube over order status x priority",
)
def cube_status_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@spec(
    "pivot_priority_counts",
    "SELECT o_orderstatus, "
    + ", ".join(
        f"""count(*) FILTER (WHERE o_orderpriority = '{p}') AS "{p}" """
        for p in _PRIORITIES
    )
    + " FROM orders GROUP BY o_orderstatus",
    "pivot: order counts by status x priority (explicit value list)",
)
def pivot_priority_counts(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PRIORITIES)
    )


# --------------------------------------------------------------------
@spec(
    "top_terms_en",
    """
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS term
      FROM documents WHERE lang = 'en'
    )
    SELECT term, count(*) AS n
    FROM toks GROUP BY term
    ORDER BY n DESC, term LIMIT 25
    """,
    "explode tokens -> frequency top-k (deterministic ordering)",
)
def top_terms_en(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("lang") == "en")
        .select(F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(25)
    )


# --------------------------------------------------------------------
@spec(
    "price_percentiles_by_priority",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
    "exact linear-interpolated percentiles per group",
)
def price_percentiles_by_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
    )


# --------------------------------------------------------------------
@spec(
    "segments_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 7000
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "INTERSECT of two customer segments",
)
def segments_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 7000)
        .select("c_custkey")
        .intersect(c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    )


@spec(
    "segments_except",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 7000
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    "EXCEPT of two customer segments",
)
def segments_except(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 7000)
        .select("c_custkey")
        # subtract IS SQL EXCEPT (distinct) — exceptAll+distinct did the
        # same thing via wasted multiset bookkeeping
        .subtract(
            c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
        )
    )


# --------------------------------------------------------------------
@spec(
    "json_props_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type
    """,
    "JSON payload extraction (F9 surface) + aggregate",
)
def json_props_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


# --------------------------------------------------------------------
@spec(
    "distinct_users_per_type",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    "distinct aggregation per group",
)
def distinct_users_per_type(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_value"),
    )


# --------------------------------------------------------------------
@spec(
    "chargram_min_fingerprint",
    """
    SELECT doc_id,
      list_aggregate(
        list_transform(range(1, greatest(length(text) - 4, 1) + 1),
          i -> CAST(('0x' || substr(md5(substr(text, i, 5)), 1, 15)) AS BIGINT)),
        'min') AS fp
    FROM documents
    """,
    "rolling char-5-gram min-hash document fingerprint",
)
def chargram_min_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    fp = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 4, F.lit(1))),
            lambda i: TX.stable_hash64(F.substr(F.col("text"), i, F.lit(5))),
        )
    )
    return d.select("doc_id", fp.alias("fp"))


# --------------------------------------------------------------------
_CYCLE_SQL = "[" + ", ".join(str(a) for a in AMOUNT_CYCLE) + "]"


@spec(
    "synthetic_orders_category_agg",
    f"""
    WITH gen AS (
      SELECT i,
        {_CYCLE_SQL}[CAST(i % 14 AS INT) + 1] AS amount
      FROM (SELECT unnest(range(10000)) AS i)
    )
    SELECT CASE WHEN amount < 50 THEN 'Low'
                WHEN amount < 200 THEN 'Medium'
                ELSE 'High' END AS amount_category,
           count(*) AS n,
           CAST(round(sum(CAST(amount AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM gen GROUP BY 1
    """,
    "S11 synthetic generator parity: deterministic cycle -> F6 bucketing",
)
def synthetic_orders_category_agg(spark, sf_dir):
    from ..functions import business

    g = generate_orders(spark, 10_000)
    amt = F.col("Amount").cast("double")
    return (
        g.select(business.amount_category(amt).alias("amount_category"), amt.alias("a"))
        .groupBy("amount_category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("a").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


# --------------------------------------------------------------------
@spec(
    "shipping_priority_top10",
    """
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-03-15'
      AND l.l_shipdate > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    "TPC-H Q3 shape: join-filter-agg-topk on unshipped revenue",
)
def shipping_priority_top10(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
@spec(
    "returned_revenue_by_customer",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    "TPC-H Q10 shape: returned-item revenue per customer, top 20",
)
def returned_revenue_by_customer(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
@spec(
    "window_function_family",
    """
    SELECT o_custkey, o_orderkey,
      rank()       OVER w AS rnk,
      dense_rank() OVER w AS drnk,
      row_number() OVER w AS rn,
      ntile(4)     OVER w AS quartile,
      lag(o_orderkey)  OVER w AS prev_order,
      lead(o_orderkey) OVER w AS next_order,
      CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * (count(*) OVER (PARTITION BY o_custkey))
        - sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey), 2) AS DOUBLE)
        AS dev_x_n
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "rank/dense_rank/row_number/ntile/lag/lead/windowed-avg family",
)
def window_function_family(spark, sf_dir):
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wp = Window.partitionBy("o_custkey")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    # deviation-from-mean scaled by n: exact decimal arithmetic (a
    # windowed AVG's division scale differs between engines)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.round(
            price * F.count(F.lit(1)).over(wp) - F.sum(price).over(wp), 2
        ).cast("double").alias("dev_x_n"),
    )


# --------------------------------------------------------------------
@spec(
    "snapshot_diff_cdc",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 != 0
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 != 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
           WHEN n.o_orderkey IS NULL THEN 'deleted'
           WHEN o.o_orderstatus != n.o_orderstatus
             OR o.o_totalprice != n.o_totalprice THEN 'changed'
           ELSE 'unchanged' END AS change_type,
      o.o_totalprice AS old_o_totalprice,
      n.o_totalprice AS new_o_totalprice
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE NOT (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
               AND o.o_orderstatus = n.o_orderstatus
               AND o.o_totalprice = n.o_totalprice)
    """,
    "CDC snapshot diff: inserted/deleted/changed between keyed versions",
)
def snapshot_diff_cdc(spark, sf_dir):
    from ..operators.diff import snapshot_diff

    o = load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    out = snapshot_diff(old, new, "o_orderkey")
    return out.select(
        "o_orderkey",
        "change_type",
        F.col("old_o_totalprice"),
        F.col("new_o_totalprice"),
    )


# --------------------------------------------------------------------
# Approximate aggregates (HLL++ distinct counts, t-digest-style
# percentiles): approximate by construction, so rows-only; accuracy vs
# the exact aggregates is pinned by tests/test_scale_plans.py.
@spec(
    "approx_aggregates",
    None,
    "approx_count_distinct + approx_percentile per event_type",
)
def approx_aggregates(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------
@spec(
    "small_quantity_parts_revenue",
    """
    WITH lim AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small_orders,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN lim ON lim.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4' AND l.l_quantity < lim.qty_limit
    """,
    "TPC-H Q17 shape: small-quantity orders vs per-part average demand "
    "(correlated scalar subquery decorrelated into an aggregate self-join)",
)
def small_quantity_parts_revenue(spark, sf_dir):
    """Q17's correlated subquery (l_quantity < 0.2 * per-part AVG) as
    the decorrelated plan Catalyst would produce anyway: one aggregate
    over lineitem grouped by partkey, joined back. The part filter is
    broadcast (tiny dim slice); the lineitem scan appears twice but AQE
    reuses the exchange. Quantities are integer-valued doubles, so the
    per-part average is order-independent bit-for-bit; the revenue sum
    is cast to DECIMAL pre-aggregation so it is exact across engines."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    lim = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("qty_limit"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(lim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.count(F.lit(1)).alias("n_small_orders"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly"),
        )
    )


# --------------------------------------------------------------------
@spec(
    "priority_status_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus))
    """,
    "explicit GROUPING SETS with grouping() disambiguation — the "
    "general form of rollup/cube, via the SQL surface",
)
def priority_status_grouping_sets(spark, sf_dir):
    """Runs through spark.sql: GROUPING SETS has no DataFrame-API
    equivalent, and the engine exposes the full SQL surface anyway
    (one partial-agg pass, Expand feeds all three sets from a single
    scan — no per-set rescan)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gsets")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
        """
    )


# --------------------------------------------------------------------
@spec(
    "suppliers_high_volume_semi",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      GROUP BY l_suppkey HAVING sum(l_quantity) > 2250
    )
    """,
    "TPC-H Q20 shape: semi-join against an aggregated+filtered "
    "subquery (suppliers shipping >2250 units in 1997)",
)
def suppliers_high_volume_semi(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    heavy = (
        li.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 2250)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(heavy, "s_suppkey", "left_semi").select("s_suppkey", "s_name")


# --------------------------------------------------------------------
@spec(
    "top_spenders_per_nation",
    """
    WITH rev AS (
      SELECT c.c_nationkey, c.c_custkey, c.c_name,
             CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY c_nationkey ORDER BY revenue DESC, c_custkey ASC
      ) AS rnk
      FROM rev
    )
    SELECT c_nationkey, c_custkey, c_name, revenue, CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= 3
    """,
    "top-k per group: 3 highest-revenue customers per nation "
    "(deterministic tiebreak on custkey)",
)
def top_spenders_per_nation(spark, sf_dir):
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rev = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("revenue"), F.asc("c_custkey")
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------
@spec(
    "local_supplier_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    """,
    "TPC-H Q5 shape: 6-way join with the cyclic local-supplier "
    "constraint (supplier nation = customer nation)",
)
def local_supplier_revenue_by_nation(spark, sf_dir):
    """Q5's join graph is cyclic — supplier joins lineitem on suppkey
    AND customer on nationkey — so join *order* matters more than in
    the tree-shaped Q3/Q10. Declared declaratively and left to
    Catalyst/AQE: dims (nation, region, the nation-filtered supplier
    slice) broadcast, the fact-to-fact chain shuffles once per key."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------
@spec(
    "scd2_status_history",
    f"""
    WITH ordered AS (
      SELECT o_custkey AS custkey, o_orderstatus AS status,
             o_orderdate AS ts, o_orderkey AS tb,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ),
    chg AS (
      -- null-safe change detection, mirroring the engine's eqNullSafe:
      -- a NULL attr is a legal state distinct from every non-NULL one,
      -- and the first observation always opens an interval
      SELECT custkey, status, ts, tb
      FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM status
    ),
    iv AS (
      SELECT custkey, status, ts AS vf,
             lead(ts) OVER (PARTITION BY custkey ORDER BY ts, tb) AS vt,
             row_number() OVER (PARTITION BY custkey ORDER BY ts, tb) AS version
      FROM chg
    )
    SELECT custkey, status,
           strftime(vf, '{_TS_FMT_DUCK}') AS valid_from,
           strftime(vt, '{_TS_FMT_DUCK}') AS valid_to,
           CAST(version AS BIGINT) AS version,
           vt IS NULL AS is_current
    FROM iv
    """,
    "SCD Type-2 history build: each customer's order-status change "
    "stream collapsed into effective-dated (valid_from, valid_to) "
    "intervals — the Type-2 companion to the reference's Type-1 "
    "upsert sink (005_sp_migrate.sql:14-24 overwrites; this preserves "
    "every version). Two window passes on the business key, no "
    "self-join, no driver loop",
)
def scd2_status_history(spark, sf_dir):
    from ..operators import scd

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )
    h = scd.scd2_history(o, "custkey", "status", "ts", tiebreak_col="tb")
    return h.select(
        "custkey",
        "status",
        F.date_format("valid_from", _TS_FMT_SPARK).alias("valid_from"),
        F.date_format("valid_to", _TS_FMT_SPARK).alias("valid_to"),
        F.col("version").cast("long").alias("version"),
        "is_current",
    )


# --------------------------------------------------------------------
@spec(
    "salted_hot_key_agg",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
    "skew-safe two-phase aggregation: events grouped by event_type "
    "(5 hot keys — the worst-case reducer skew) via salted partial "
    "aggregation on (key, salt) then merge on key; the oracle is the "
    "plain GROUP BY, proving salting changes the plan, not the result. "
    "Decimal partial sums keep the two-phase sum exact",
)
def salted_hot_key_agg(spark, sf_dir):
    from ..operators import skew

    e = load(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,6)")
    )
    out = skew.salted_aggregate(
        e,
        ["event_type"],
        {
            "n_events": ("*", "count"),
            "_sum_dec": ("value_dec", "sum"),
            "max_value": ("value", "max"),
        },
        n_salts=16,
        salt_cols=["event_id"],
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("_sum_dec"), 2).cast("double").alias("total_value"),
        "max_value",
    )


# --------------------------------------------------------------------
@spec(
    "salted_join_priority_revenue",
    """
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    "skew-AWARE fact-dim equi-join (auto mode, the recommended usage): "
    "salted_join samples lineitem's key histogram first; when the "
    "hottest key's share exceeds the threshold it salts (fact hashed, "
    "orders dim replicated 8 ways, join on (key, salt)), otherwise it "
    "runs the plain AQE-handled join. TPC-H orderkeys are uniform, so "
    "here the bypass fires — salting uniform data was measured at "
    "15.5x a plain join at the x10 fixture (BASELINE.md); the salted "
    "path's correctness + its win on actually-skewed data are pinned "
    "by tests/test_scale_plans.py and the SCALE_VALIDATION skew demo. "
    "Oracle is the plain join — identical result either way",
)
def salted_join_priority_revenue(spark, sf_dir):
    from ..operators import skew

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    od = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    j = skew.salted_join(li, od, "okey", n_salts=8,
                         salt_cols=["okey", "price"],
                         auto_threshold=0.05)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("price"), 2).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------
@spec(
    "customer_order_histogram",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    "TPC-H Q13 shape: two-level aggregation — orders per customer "
    "(left join keeps zero-order customers), then the histogram of "
    "those counts. The outer groupBy key space is tiny (distinct "
    "counts), so the second shuffle is negligible; the first is one "
    "shuffle on custkey with map-side partial counts",
)
def customer_order_histogram(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------
@spec(
    "nation_pair_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           count(*) AS n_items,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_nationkey != n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
    """,
    "TPC-H Q7 shape: cross-border trade volume per (supplier nation, "
    "customer nation) pair. Two big-table shuffles (lineitem->orders on "
    "orderkey, ->customer on custkey); supplier and both nation copies "
    "broadcast — the discounted-price product folds into a decimal "
    "BEFORE summing so the two engines agree exactly",
)
def nation_pair_volume(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("n1_key") != F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("volume"),
        )
    )

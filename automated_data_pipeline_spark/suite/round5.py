"""Round-5 additions: three classic OLAP join/agg shapes the suite
didn't cover yet (TPC-H Q2/Q11/Q21 analogues over the fixture star
schema), two event-stream analytics (rolling z-score anomaly flagging,
per-window heavy hitters), and three training-data curation mechanics
(quantile-cutpoint curriculum deciles, token-budget prefix selection
on a two-phase distributed cumsum, per-language top bigrams).

Reference parity note: none of these exist in the reference (an ETL
orchestrator — SURVEY.md §2.7 records that it has no window/set-op
surface); they extend the engine the way BASELINE.json mandates, and
every query here follows the suite's cross-engine determinism
conventions (decimal-exact sums, single IEEE division of exact
integers, rank-on-rounded with id tie-breaks — suite/__init__.py
docstring).

Scale notes are per-query; the one deliberately global structure
(token_budget_prefix's ordered cumsum) runs through
operators/sampling.ordered_cumsum — a range-exchange two-phase scan,
NOT a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.stats import anomaly_flag, portable_round, trailing_zscore
from ..operators.sampling import ordered_cumsum
from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name, oracle, doc=""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


_WORDS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"

# DuckDB twin of functions.text.quality_score (same formula as the
# doc_quality_score oracle in suite/llm.py — third SQL copy of the
# contract in functions/text.py:101; kept literal because each oracle
# must be a self-contained DuckDB string. Drift between the copies is
# caught loudly: whichever query's copy lags the Spark formula fails
# its own hash gate)
_QUALITY_CTE = f"""
w AS (SELECT doc_id, lang, text, n_chars, {_WORDS_SQL} AS ws FROM documents),
c AS (
  SELECT doc_id, lang, n_chars, len(ws) AS nw,
    length(regexp_replace(text, '[\\pL\\pN\\s]', '', 'g')) * 1.0
      / greatest(length(text), 1) AS pr,
    len(list_filter(ws, x -> x IN ('the','a','and','of','to','in','is'))) * 1.0
      / greatest(len(ws), 1) AS swr,
    ws
  FROM w
),
q AS (
  SELECT doc_id, lang, n_chars, nw, ws,
    floor((0.4 * least(nw / 100.0, 1.0)
        + 0.3 * (1.0 - least(pr * 5, 1.0))
        + 0.3 * least(swr * 5, 1.0)) * 10000 + 0.5) / 10000 AS quality
  FROM c
)
"""


# --------------------------------------------------------------------
@spec(
    "regional_cheapest_supplier",
    """
    WITH eur AS (
      SELECT s.s_suppkey, s.s_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    unit AS (
      -- floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): the quotient
      -- can land exactly on a .5 rounding boundary, where Spark's
      -- BigDecimal HALF_UP and DuckDB's float rounding disagree; the
      -- floor formula is identical double arithmetic on both engines
      SELECT l.l_partkey, l.l_suppkey,
        floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            * 10000 + 0.5) / 10000
          AS unit_price
      FROM lineitem l JOIN eur e ON l.l_suppkey = e.s_suppkey
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    ranked AS (
      SELECT u.*, row_number() OVER (
        PARTITION BY l_partkey ORDER BY unit_price ASC, l_suppkey ASC
      ) AS rn
      FROM unit u
    )
    SELECT p.p_partkey, p.p_name, e.s_suppkey, e.s_name, r.unit_price
    FROM ranked r
    JOIN part p ON r.l_partkey = p.p_partkey
    JOIN eur e ON r.l_suppkey = e.s_suppkey
    WHERE r.rn = 1
    """,
    "TPC-H Q2 shape over the fixture schema: per part, the EUROPE "
    "supplier with the lowest observed unit price (decimal-exact "
    "sums, one IEEE division, rank on the rounded price with suppkey "
    "tie-break). Plan: the region-filtered supplier dim is tiny and "
    "BROADCAST into the lineitem scan (no fact shuffle for the "
    "filter), the (part, supp) agg is one shuffle with map-side "
    "partials, and the per-part rank windows on the already-small "
    "aggregate — at 100 TB the fact table is touched exactly once",
)
def regional_cheapest_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    p = load(spark, sf_dir, "part")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    unit = (
        li.join(F.broadcast(eur), li.l_suppkey == eur.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            # engine-portable rounding: see the oracle's comment
            (
                F.floor(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                    .cast("double")
                    / F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                    .cast("double")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_price"), F.asc("l_suppkey")
    )
    best = unit.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(F.broadcast(eur), best.l_suppkey == eur.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_price")
    )


# --------------------------------------------------------------------
@spec(
    "waiting_orders_suppliers",
    """
    WITH per_order AS (
      SELECT l.l_orderkey,
        count(DISTINCT l.l_suppkey) AS n_supp,
        count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                            THEN l.l_suppkey END) AS n_late_supp,
        min(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                 THEN l.l_suppkey END) AS late_supp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_waiting
    FROM per_order p JOIN supplier s ON p.late_supp = s.s_suppkey
    WHERE p.n_supp >= 2 AND p.n_late_supp = 1
    GROUP BY s.s_suppkey, s.s_name
    """,
    "TPC-H Q21 shape: suppliers who were the SOLE late shipper "
    "(shipdate > orderdate + 60d) in finalized multi-supplier orders. "
    "The classic formulation is EXISTS + NOT EXISTS self-joins on "
    "lineitem; this plan folds both into ONE per-order aggregation "
    "(conditional distinct-count), so the fact table is scanned once "
    "and shuffled once on orderkey — the self-join-free form is the "
    "one that survives at 100 TB",
)
def waiting_orders_suppliers(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late_supp"
            ),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_waiting"))
    )


# --------------------------------------------------------------------
@spec(
    "important_parts_by_nation",
    """
    WITH rev AS (
      SELECT n.n_name, l.l_partkey,
        sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10)))
          AS r
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name, l.l_partkey
    ),
    shared AS (
      SELECT n_name, l_partkey, r,
        sum(r) OVER (PARTITION BY n_name) AS nation_total
      FROM rev
    )
    SELECT n_name, l_partkey,
      CAST(round(r, 2) AS DOUBLE) AS revenue,
      -- portable rounding (floor(x*1e6+0.5)/1e6): the share is a
      -- rounded QUOTIENT and also the filter predicate — a .5-boundary
      -- disagreement between the engines' round() would flip rows in
      -- and out of the result set, not just drift a value
      floor(CAST(r AS DOUBLE) / CAST(nation_total AS DOUBLE) * 1000000 + 0.5)
        / 1000000 AS share
    FROM shared
    WHERE floor(CAST(r AS DOUBLE) / CAST(nation_total AS DOUBLE) * 1000000 + 0.5)
        / 1000000 >= 0.002
    """,
    "TPC-H Q11 shape: parts whose revenue share within their "
    "supplier's nation clears a threshold. The global scalar of Q11 "
    "becomes a per-nation window sum over the ALREADY-AGGREGATED "
    "(nation, part) frame — exact decimal partials, one fact shuffle, "
    "and the window partitions by nation so it parallelizes (never a "
    "single-reducer global window)",
)
def important_parts_by_nation(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,10)"
                )
            ).alias("r")
        )
    )
    total = F.sum("r").over(Window.partitionBy("n_name"))
    share = portable_round(
        F.col("r").cast("double") / total.cast("double"), 6
    )
    return (
        rev.withColumn("share", share)
        .filter(F.col("share") >= 0.002)
        .select(
            "n_name",
            "l_partkey",
            F.round("r", 2).cast("double").alias("revenue"),
            "share",
        )
    )


# --------------------------------------------------------------------
@spec(
    "rolling_daily_zscore",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT day, n_events,
        count(*) OVER w AS cw,
        sum(n_events) OVER w AS s,
        sum(n_events * n_events) OVER w AS ss
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT day, n_events,
        CASE WHEN cw >= 4 AND cw * ss - s * s > 0 THEN
          floor(((CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / cw)
                / sqrt(CAST(cw * ss - s * s AS DOUBLE) / (cw * (cw - 1))))
                * 10000 + 0.5) / 10000
        END AS z
      FROM stats
    )
    SELECT day, CAST(n_events AS BIGINT) AS n_events, z,
      coalesce(abs(z) >= 2.0, false) AS is_anomaly
    FROM scored
    """,
    "time-series anomaly flagging: per-day event volume vs the "
    "trailing 7 days EXCLUDING the day itself (a spike must not "
    "inflate its own baseline — the inclusive frame caps |z| at "
    "(h-1)/sqrt(h) and flags any blip over a flat baseline), |z| >= 2 "
    "flagged, >= 4 trailing samples required (same warm-up contract "
    "as the streaming twin streaming/anomaly.py). Cross-engine-exact "
    "by construction: the window carries only INTEGER sums (count, "
    "sum, sum of squares — all exact), mean/variance/z derive from "
    "them in identical double arithmetic, and the rounding is the "
    "engine-portable floor(x*1e4+0.5)/1e4 form. Plan: the heavy step "
    "(events -> daily counts) is a distributed agg; the window then "
    "runs over one row per calendar day — bounded by the date range, "
    "not the data volume",
)
def rolling_daily_zscore(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    stats = daily.select(
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).alias("cw"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss"),
    )
    z = trailing_zscore(
        F.col("n_events"), F.col("cw"), F.col("s"), F.col("ss"),
        min_samples=4,
    )
    return stats.select(
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        z.alias("z"),
        anomaly_flag(z).alias("is_anomaly"),
    )


# --------------------------------------------------------------------
@spec(
    "hourly_heavy_hitters",
    """
    WITH hourly AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             user_id, count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT hour, user_id, CAST(n_events AS BIGINT) AS n_events, rnk
    FROM (
      SELECT hourly.*, row_number() OVER (
        PARTITION BY hour ORDER BY n_events DESC, user_id ASC
      ) AS rnk
      FROM hourly
    )
    WHERE rnk <= 3
    """,
    "per-window heavy hitters: top-3 users by event count in every "
    "hour (rank on count with user-id tie-break). Plan: one "
    "shuffle-agg on (hour, user), then the rank window partitions by "
    "hour — thousands of independent partitions, embarrassingly "
    "parallel; at 100 TB the (hour, user) agg's map-side partials do "
    "the heavy lifting and the window sees only the aggregated frame",
)
def hourly_heavy_hitters(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
            "hour"
        ),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("hour").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        hourly.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "hour", "user_id",
            F.col("n_events").cast("bigint").alias("n_events"), "rnk",
        )
    )


# --------------------------------------------------------------------
@spec(
    "quality_decile_report",
    f"""
    WITH {_QUALITY_CTE},
    cuts AS (
      -- portable rounding on the interpolated cutpoints: the two
      -- engines' quantile interpolation can differ in op ORDER, so
      -- round through the shared floor(x*1e6+0.5)/1e6 form
      SELECT list_transform(
        quantile_cont(quality, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        x -> floor(x * 1000000 + 0.5) / 1000000) AS cs
      FROM q
    ),
    bucketed AS (
      SELECT q.doc_id, q.n_chars, q.quality,
        1 + len(list_filter(cuts.cs, c -> q.quality > c)) AS decile
      FROM q, cuts
    )
    SELECT decile,
      CAST(count(*) AS BIGINT) AS n_docs,
      floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 100 + 0.5) / 100
        AS avg_chars,
      min(quality) AS min_quality,
      max(quality) AS max_quality
    FROM bucketed GROUP BY decile
    """,
    "curriculum binning by quality score WITHOUT a global sort: exact "
    "decile cutpoints come from a distributed percentile aggregation "
    "(rounded to 6 decimals on both engines), then bucket assignment "
    "is a narrow comparison pass — the scalable alternative to "
    "ntile(10), whose global window would serialize the corpus "
    "through one reducer. The 9 cutpoints are the only driver-side "
    "data. Per-decile output: count, mean length (exact integer sum, "
    "one IEEE division), min/max quality",
)
def quality_decile_report(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        "n_chars",
        TX.quality_score(F.col("text")).alias("quality"),
    )
    cuts = q.agg(
        F.expr(
            "transform(percentile(quality, "
            "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)), "
            "x -> floor(x * 1000000 + 0.5) / 1000000)"
        ).alias("cs")
    ).first()["cs"]
    decile = F.lit(1)
    for c in cuts:
        decile = decile + F.when(F.col("quality") > F.lit(float(c)), 1).otherwise(0)
    return (
        q.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            portable_round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_chars"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
        )
        .select(
            "decile",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "avg_chars", "min_quality", "max_quality",
        )
    )


# --------------------------------------------------------------------
TOKEN_BUDGET = 10_000


@spec(
    "token_budget_prefix",
    f"""
    WITH {_QUALITY_CTE},
    t AS (SELECT doc_id, quality, len(ws) AS n_tokens FROM q)
    SELECT doc_id, n_tokens, quality,
      CAST(sum(n_tokens) OVER (
        ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING
      ) AS BIGINT) AS cum_tokens,
      (sum(n_tokens) OVER (
        ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING
      ) <= {TOKEN_BUDGET}) AS selected
    FROM t
    """,
    "token-budget curation: take documents best-quality-first until "
    "the cumulative token count exceeds the budget — the 'top-N "
    "tokens, not top-N docs' selection every pretraining data order "
    "uses. The oracle's global ordered window is the SPEC; the Spark "
    "plan is operators/sampling.ordered_cumsum — a repartitionByRange "
    "exchange, per-partition parallel cumsum, and an O(partitions) "
    "driver offset list — so no single-reducer window touches the "
    "corpus (plan-asserted by tests/test_round5_ops.py)",
)
def token_budget_prefix(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
    )
    cum = ordered_cumsum(
        base,
        "n_tokens",
        [F.desc("quality"), F.asc("doc_id")],
        out_col="cum_tokens",
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        "quality",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        (F.col("cum_tokens") <= TOKEN_BUDGET).alias("selected"),
    )


# --------------------------------------------------------------------
@spec(
    "top_bigrams_per_lang",
    f"""
    WITH w AS (SELECT doc_id, lang, {_WORDS_SQL} AS ws FROM documents),
    bg AS (
      SELECT lang, ws[i] || ' ' || ws[i+1] AS bigram
      FROM w, unnest(range(1, len(ws))) t(i) WHERE len(ws) >= 2
    ),
    counted AS (
      SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2
    )
    SELECT lang, bigram, CAST(n AS BIGINT) AS n, rnk
    FROM (
      SELECT counted.*, row_number() OVER (
        PARTITION BY lang ORDER BY n DESC, bigram ASC
      ) AS rnk
      FROM counted
    )
    WHERE rnk <= 5
    """,
    "per-language top-5 bigrams (the collocation signal a tokenizer/"
    "mixture audit reads). Plan: tokenize scan -> bigram explode -> "
    "(lang, bigram) agg with map-side partials -> per-lang rank "
    "window over the aggregated counts; raw text shuffles never, "
    "bigram streams shuffle once",
)
def top_bigrams_per_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", TX.tokens(F.col("text")).alias("ws"))
    grams = toks.filter(F.size("ws") >= 2).select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.concat(
                    F.element_at("ws", i), F.lit(" "), F.element_at("ws", i + 1)
                ),
            )
        ).alias("bigram"),
    )
    counted = grams.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "bigram", F.col("n").cast("bigint").alias("n"), "rnk")
    )


# --------------------------------------------------------------------
# Late-round-5 additions: five more canonical TPC-H query shapes
# (Q6/Q8/Q15/Q18 and a Q4 adaptation) over the fixture star schema.
# --------------------------------------------------------------------
@spec(
    "promo_discount_revenue_band",
    """
    SELECT
      CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))), 2)
           AS DOUBLE) AS revenue_delta,
      CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "TPC-H Q6 shape: the what-if revenue delta of dropping a discount "
    "band for a year — a pure scan-filter-aggregate. Plan: every "
    "predicate pushes to the parquet scan (shipdate min/max prune row "
    "groups at scale), decimal-exact product sum, single partial/final "
    "agg — the cheapest possible shape, included as the pushdown "
    "sentinel for the family",
)
def promo_discount_revenue_band(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(28,10)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue_delta"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


# --------------------------------------------------------------------
@spec(
    "nation_market_share",
    """
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS yr, n2.n_name AS supp_nation,
        CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10)) AS vol
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    )
    SELECT yr,
      floor(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol
                          ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
            / CAST(sum(vol) AS DOUBLE) * 1000000 + 0.5) / 1000000
        AS mkt_share,
      CAST(round(sum(vol), 2) AS DOUBLE) AS total_volume
    FROM base GROUP BY yr
    """,
    "TPC-H Q8 shape: NATION_7's share of the ASIA-market revenue per "
    "order year. Plan: the four dimension joins (customer, nation x2, "
    "region, supplier) all BROADCAST into the single fact pass, the "
    "region filter prunes before the share math, and the share is one "
    "IEEE division of two exact decimal sums (engine-portable floor "
    "rounding — a .5 disagreement would corrupt the output value, so "
    "the shared form matters)",
)
def nation_market_share(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("c_rkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,10)"
            ).alias("vol"),
        )
    )
    zero = F.lit(0).cast("decimal(28,10)")
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("vol")).otherwise(zero)
    )
    den = F.sum("vol")
    return base.groupBy("yr").agg(
        portable_round(num.cast("double") / den.cast("double"), 6).alias(
            "mkt_share"
        ),
        F.round(den, 2).cast("double").alias("total_volume"),
    )


# --------------------------------------------------------------------
@spec(
    "top_supplier_by_quarter",
    """
    WITH rev AS (
      SELECT l_suppkey,
        sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)))
          AS total
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
      CAST(round(r.total, 2) AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total = (SELECT max(total) FROM rev)
    """,
    "TPC-H Q15 shape: the quarter's top revenue supplier(s) — the "
    "classic view + scalar-subquery formulation, kept EXACT by "
    "comparing decimal totals (ties all surface; a double max-equality "
    "would be engine-lottery). Plan: one filtered fact agg, the "
    "one-row max broadcast back over the tiny per-supplier frame",
)
def top_supplier_by_quarter(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,10)"
                )
            ).alias("total")
        )
    )
    top = rev.agg(F.max("total").alias("mx"))
    return (
        rev.join(F.broadcast(top), rev.total == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round("total", 2).cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------
@spec(
    "large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey,
        sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
      strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
      CAST(round(CAST(o.o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
        AS total_price,
      CAST(b.qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "TPC-H Q18 shape: large-volume orders (total quantity > 300) with "
    "their customers. Plan: the HAVING-filtered per-order agg is the "
    "small side and BROADCASTS into orders; at 100 TB the first agg's "
    "map-side partials carry the load and only qualifying orderkeys "
    "cross the join",
)
def large_volume_orders(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 300)
    )
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round(F.col("o_totalprice").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("total_price"),
            F.col("qty").cast("double").alias("total_qty"),
        )
    )


# --------------------------------------------------------------------
@spec(
    "order_priority_late_check",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    "TPC-H Q4 shape (adapted to the fixture's columns: the "
    "commit-vs-receipt lateness becomes ship > order + 45 days): "
    "order-priority counts of quarter orders with at least one late "
    "line — the canonical EXISTS -> LEFT SEMI JOIN translation. Plan: "
    "the quarter filter pushes into the orders scan FIRST, the semi "
    "join shuffles only qualifying orderkeys, and no lineitem column "
    "survives past the join",
)
def order_priority_late_check(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )

"""Event-stream operator queries (SURVEY.md §2.8 extensions): tumbling /
sliding windows and batch sessionization over the events fixture. The
same transformations run under Structured Streaming (see
``streaming/``); here they execute in batch with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name, oracle, doc=""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


@spec(
    "tumbling_hourly_agg",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    "tumbling event-time window (F.window 1h)",
)
def tumbling_hourly_agg(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@spec(
    "sliding_window_counts",
    """
    WITH slotted AS (
      SELECT event_type,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS window_start
      FROM events
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n
    FROM slotted GROUP BY 1, 2
    """,
    "sliding window 1h/30m (F.window)",
)
def sliding_window_counts(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


@spec(
    "sessionize_users",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id,
        CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_ms(min(ts)) AS session_start_ms, epoch_ms(max(ts)) AS session_end_ms
    FROM s GROUP BY user_id, session_id
    """,
    "batch sessionization: lag+cumsum gap>30min",
)
def sessionize_users(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("ts").cast("double") - F.lag(F.col("ts")).over(w).cast("double") > 1800,
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("new_session", gap)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_millis(F.min("ts")).alias("session_start_ms"),
            F.unix_millis(F.max("ts")).alias("session_end_ms"),
        )
    )


# --------------------------------------------------------------------
@spec(
    "conversion_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase
    """,
    "sequential conversion funnel view -> click -> purchase (strict "
    "event-time ordering per user)",
)
def conversion_funnel(spark, sf_dir):
    """Funnel in ONE shuffle and O(1) state per row: running-min window
    functions walk the stages in event-time order — no re-scan or
    re-join of the events table per stage (the SQL twin's 3-join
    formulation), and no per-user arrays (the previous collect_list
    version: a hyperactive bot user at 100x scale made one unbounded
    straggler task; tests/test_properties.py pins the skewed-user case).

    Exactness: the oracle qualifies a click iff ts > t_view (GLOBAL min
    view). The running min of view-ts at a click row equals the global
    min whenever the global min lies at or before the click — and when
    it doesn't, the strict > comparison fails either way, so the
    running-min qualification is identical to the global one. The same
    argument applies to purchases over qualified-click running mins.
    Both window passes share one partitioning (user_id) and one sort
    (ts) — Catalyst plans them in a single exchange + sort. The default
    RANGE frame includes same-ts peers; strict > makes tie order moot.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    run_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    staged = e.withColumn(
        "_qclick_ts",
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > run_view),
            F.col("ts"),
        ),
    )
    run_qclick = F.min("_qclick_ts").over(w)
    staged = staged.withColumn(
        "_qpurchase",
        (F.col("event_type") == "purchase") & (F.col("ts") > run_qclick),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("event_type") == "view").alias("has_view"),
        F.max(F.col("_qclick_ts").isNotNull()).alias("has_click"),
        F.max("_qpurchase").alias("has_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("has_view"), 1)).alias("n_view"),
        F.count(F.when(F.col("has_click"), 1)).alias("n_click"),
        F.count(F.when(F.col("has_purchase"), 1)).alias("n_purchase"),
    )


# --------------------------------------------------------------------
@spec(
    "retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY 1
    ),
    a AS (
      SELECT DISTINCT e.user_id, f.cohort,
        CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7 AS INT) AS week_offset
      FROM events e JOIN f ON f.user_id = e.user_id
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM a GROUP BY 1, 2
    """,
    "weekly retention cohorts: users grouped by first-activity week, "
    "counted per week-offset of subsequent activity",
)
def retention_cohorts(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = (
        e.select("user_id", F.date_trunc("week", "ts").alias("wk"))
        .join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return active.groupBy(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"), "week_offset"
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------
@spec(
    "value_outliers_by_type",
    """
    WITH r AS (
      SELECT event_id, event_type, value,
             percent_rank() OVER (
               PARTITION BY event_type ORDER BY value ASC, event_id ASC
             ) AS pr
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, event_type, value, round(pr, 6) AS pr
    FROM r WHERE pr >= 0.99
    """,
    "distribution-free outlier flags: top 1% of value per event type "
    "via percent_rank (rank arithmetic — exact across engines, unlike "
    "mean/stddev z-scores whose float sums are order-dependent)",
)
def value_outliers_by_type(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    # NULL values carry no rank position and the engines disagree on
    # where they sort (Spark NULLS FIRST, DuckDB NULLS LAST — opposite
    # extremes of the distribution); exclude them symmetrically
    e = e.filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    return (
        e.select(
            "event_id", "event_type", "value",
            F.percent_rank().over(w).alias("_pr"),
        )
        .filter(F.col("_pr") >= 0.99)
        .select(
            "event_id", "event_type", "value", F.round("_pr", 6).alias("pr")
        )
    )


def dense_hourly_grid(e, *, with_value_sum: bool = False):
    """Zero-filled (event_type, h, n[, sv]) over the complete hourly
    grid spanning the events' bounds — the densification every rolling
    computation needs (missing hours must exist as rows). The grid is
    tiny (|types| x |hours|), generated with sequence+explode; the fact
    side contributes one aggregation pass. Shared by
    gap_fill_hourly_locf (here) and ewma_hourly_forecast
    (suite/curation.py) so the grid semantics cannot diverge.
    With ``with_value_sum`` the per-hour decimal value sum rides along
    (NULL n marks an empty slot BEFORE the zero-fill; callers that need
    to distinguish observed-zero use the sv/NULL columns)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if with_value_sum:
        aggs.append(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv")
        )
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(*aggs)
    bounds = e.agg(
        F.min(F.date_trunc("hour", "ts")).alias("h0"),
        F.max(F.date_trunc("hour", "ts")).alias("h1"),
    )
    types = e.select("event_type").distinct()
    slots = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    return slots.join(hourly, ["event_type", "h"], "left")


# --------------------------------------------------------------------
@spec(
    "gap_fill_hourly_locf",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1
      FROM events
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    slots AS (
      SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
      FROM types t CROSS JOIN bounds b
    ),
    j AS (
      SELECT s.event_type, s.h, coalesce(hh.n, 0) AS n,
             CASE WHEN hh.n IS NOT NULL THEN round(hh.sv / hh.n, 4) END AS avg_v
      FROM slots s LEFT JOIN hourly hh
        ON hh.h = s.h AND hh.event_type = s.event_type
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(n AS BIGINT) AS n,
           last_value(avg_v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
    FROM j
    """,
    "time-series densification: complete hourly grid per event type "
    "(explode a sequence over the global bounds), zero-filled counts, "
    "last-observation-carried-forward hourly average",
)
def gap_fill_hourly_locf(spark, sf_dir):
    """Gap filling is the op dashboards/forecasters need before any
    rolling computation: missing hours must exist as rows. The grid is
    tiny relative to the fact table (|types| x |hours|), so it is
    generated with sequence+explode and the fact side joins to it —
    the events scan stays a single aggregation pass; no Python, no
    driver loop. LOCF = last(ignorenulls) over an ordered window."""
    e = load(spark, sf_dir, "events")
    j = dense_hourly_grid(e, with_value_sum=True).select(
        "event_type",
        "h",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.when(
            F.col("n").isNotNull(), F.round(F.col("sv") / F.col("n"), 4)
        ).alias("avg_v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        F.last("avg_v", ignorenulls=True).over(w).alias("filled_avg"),
    )


# --------------------------------------------------------------------
@spec(
    "pit_features_7d",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             epoch_ms(ts) AS ms
      FROM events
    )
    SELECT event_id, user_id, ms AS ts_ms,
           count(*) OVER w AS n_events_7d,
           CAST(round(sum(CAST(coalesce(value, 0) AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE)
             AS value_sum_7d,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w
             AS n_purchases_7d
    FROM e
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ms
      RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW
    )
    """,
    "no-future-data point-in-time features: for every event, the "
    "user's trailing-7-day event count / value sum / purchase count "
    "computed with a RANGE frame on event time — each row sees only "
    "data at or before its own timestamp. NOTE the frame ends at "
    "CURRENT ROW, so a row's own value (and same-timestamp peers) is "
    "included; if `value` feeds the label, subtract the row's own "
    "contribution (or use RANGE ... 1 PRECEDING) before training on "
    "these. One shuffle on user_id; the range frame is a single "
    "codegen'd window pass, no self-join",
)
def pit_features_7d(spark, sf_dir):
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_millis("ts").alias("ts_ms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-604800000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.count(F.lit(1)).over(w).alias("n_events_7d"),
        F.round(
            F.sum(F.coalesce(F.col("value"), F.lit(0)).cast("decimal(18,6)")).over(w),
            2,
        )
        .cast("double")
        .alias("value_sum_7d"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).over(w).alias(
            "n_purchases_7d"
        ),
    )


# --------------------------------------------------------------------
@spec(
    "top_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n DESC, from_type, to_type
    LIMIT 20
    """,
    "user-journey transition mining: each user's time-ordered event "
    "stream decomposed into consecutive (from, to) event-type bigrams, "
    "counted corpus-wide, top-20 — the first-order Markov transition "
    "table behind session modeling and next-event prediction features. "
    "One shuffle on user_id for the lead window, map-side partial agg "
    "on the tiny (type, type) key space, TakeOrdered for the top-k",
)
def top_event_transitions(spark, sf_dir):
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return (
        seq.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "from_type", "to_type")
        .limit(20)
    )


# --------------------------------------------------------------------
@spec(
    "ts_pattern_match",
    """
    WITH b AS (
      SELECT min(date_trunc('hour', ts)) AS h0,
             CAST((epoch(max(date_trunc('hour', ts))) - epoch(min(date_trunc('hour', ts)))) / 3600 + 1 AS BIGINT) AS n_hours
      FROM events
    ),
    hc AS (
      SELECT user_id,
             CAST((epoch(date_trunc('hour', ts)) - epoch(b.h0)) / 3600 AS BIGINT) AS idx,
             count(*) AS c
      FROM events CROSS JOIN b GROUP BY 1, 2
    ),
    u AS (SELECT DISTINCT user_id FROM events),
    g AS (SELECT u.user_id, unnest(range(b.n_hours)) AS idx FROM u CROSS JOIN b),
    s AS (
      SELECT g.user_id, g.idx, coalesce(hc.c, 0) AS c
      FROM g LEFT JOIN hc ON g.user_id = hc.user_id AND g.idx = hc.idx
    ),
    pat AS (SELECT * FROM (VALUES (0, 0), (1, 4), (2, 0), (3, 0)) p(j, pv)),
    offs AS (SELECT unnest(range(b.n_hours - 3)) AS o FROM b),
    d AS (
      SELECT s.user_id, offs.o AS off,
             sum((s.c - pat.pv) * (s.c - pat.pv)) AS dist
      FROM offs JOIN pat ON true
      JOIN s ON s.idx = offs.o + pat.j
      GROUP BY 1, 2
    ),
    pick AS (
      SELECT user_id, off, dist,
             row_number() OVER (PARTITION BY user_id ORDER BY dist, off) AS rn
      FROM d
    )
    SELECT user_id, CAST(off AS BIGINT) AS best_offset,
           CAST(dist AS BIGINT) AS best_dist
    FROM pick WHERE rn = 1
    """,
    "Time-series pattern matching (the subsequence-similarity-search "
    "shape of EDBT'19 'Time Series Similarity Search for Streaming "
    "Data'): per user, build the dense hourly event-count series "
    "(zero-filled grid) and slide a 4-hour burst pattern [0,4,0,0] "
    "across it under squared Euclidean distance; report each user's "
    "best-matching offset. All-integer arithmetic -> exact cross-"
    "engine. Plan: one (user, hour) count shuffle, one user shuffle "
    "to assemble the series map, then the whole slide is per-row "
    "array HOFs (codegen, zero additional shuffle, no explode of the "
    "users x offsets x window product the SQL twin materializes)",
)
def ts_pattern_match(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    PAT = [0, 4, 0, 0]
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = e.select(
        F.unix_timestamp(F.min(hour)).alias("e0"),
        (
            (F.unix_timestamp(F.max(hour)) - F.unix_timestamp(F.min(hour)))
            / 3600 + 1
        ).cast("bigint").alias("n_hours"),
    )
    hc = (
        e.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            ((F.unix_timestamp(hour) - F.col("e0")) / 3600)
            .cast("bigint")
            .alias("idx"),
            "n_hours",
        )
        .groupBy("user_id", "idx", "n_hours")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    series = hc.groupBy("user_id", "n_hours").agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "c"))).alias("m")
    )
    counts = F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("n_hours") - 1),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0)),
    )
    # guard the degenerate span: with n_hours < len(PAT) there is no
    # valid window — F.sequence(0, n_hours-4) would otherwise generate
    # a DESCENDING run of negative offsets (Spark steps -1 when
    # start > stop) and element_at(cs, 0) raises under ANSI mode. The
    # SQL twin's range(n_hours-3) is empty there, so emptiness matches.
    series = series.filter(F.col("n_hours") >= len(PAT))
    series = series.select("user_id", "n_hours", counts.alias("cs"))
    pat = F.array(*[F.lit(v) for v in PAT])
    wins = F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("n_hours") - len(PAT)),
        lambda o: F.struct(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(len(PAT))),
                F.lit(0).cast("bigint"),
                # exact integer multiply — pow() goes through double
                # and a truncating cast, which loses exactness once
                # (c - p)^2 exceeds 2^53
                lambda acc, j: acc
                + (
                    (
                        F.element_at(F.col("cs"), (o + j).cast("int"))
                        - F.element_at(pat, j)
                    ).cast("bigint")
                    * (
                        F.element_at(F.col("cs"), (o + j).cast("int"))
                        - F.element_at(pat, j)
                    ).cast("bigint")
                ),
            ).alias("dist"),
            o.alias("off"),
        ),
    )
    best = F.aggregate(
        wins,
        F.struct(
            F.lit(None).cast("bigint").alias("dist"),
            F.lit(None).cast("bigint").alias("off"),
        ),
        lambda acc, x: F.when(
            acc["dist"].isNull()
            | (x["dist"] < acc["dist"])
            | ((x["dist"] == acc["dist"]) & (x["off"] < acc["off"])),
            x,
        ).otherwise(acc),
    )
    return series.select(
        "user_id",
        best["off"].alias("best_offset"),
        best["dist"].alias("best_dist"),
    )

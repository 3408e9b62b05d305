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
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
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

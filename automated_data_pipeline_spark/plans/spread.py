"""Conditional hash-spread before per-row-CPU stages.

The recurring "one-file-scan disease" (rounds 7/11/12): a compact
parquet fixture lands as one part file, the scan plans one task, and a
CPU-heavy projection (tokenize, cosine scoring) serializes on it. The
r12 fix repartitioned unconditionally — correct for the one-file case
but a pure-overhead full-corpus shuffle whenever the scan is already
parallel (at 100 TB a scan has thousands of tasks and the LAST thing
you want before a map-only scoring stage is an extra exchange; r12's
hybrid-retrieval weak row was exactly two such shuffles).

``spread_if_narrow`` keeps the guard and drops the waste: repartition
only when the frame plans fewer partitions than half the cluster's
parallelism. Values must be partition-independent at every call site
(rounded scores + total-order ranks — the suite convention), which is
also what makes the conditional safe: the SAME results either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def planned_partitions(df: DataFrame) -> int:
    """Partition count the frame would execute with (physical planning
    only — no job runs). Falls back to 1 on any planning hiccup so the
    caller conservatively spreads."""
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return 1


def spread_if_narrow(df: DataFrame, *key_cols: str, min_ratio: float = 0.5) -> DataFrame:
    """Hash-repartition ``df`` to ``defaultParallelism`` on
    ``key_cols`` ONLY if it currently plans fewer than
    ``min_ratio * defaultParallelism`` partitions. The downstream
    stage must be partition-independent (map-side CPU work feeding an
    aggregation/rank that fixes a total order)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if planned_partitions(df) >= max(2, int(par * min_ratio)):
        return df
    return df.repartition(par, *key_cols) if key_cols else df.repartition(par)

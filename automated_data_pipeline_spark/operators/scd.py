"""Slowly-changing-dimension (Type 2) history build.

The reference's upsert sink (SURVEY.md S7, `005_sp_migrate.sql:14-24`)
keeps only the latest version of each key — a Type-1 overwrite. A
training-data / analytics warehouse usually also needs the Type-2 form:
every attribute change preserved as an effective-dated row
(valid_from, valid_to, is_current), so any historical point-in-time
state can be reconstructed with `valid_from <= t < valid_to`.

Plan shape (100 TB form): one shuffle on the business key for the
change-point window, one more narrow window pass for the interval
close — both whole-stage-codegen window operators, no self-join and no
driver loop. The input is the raw change/event stream; at cluster
scale partition the output by is_current so the "current" slice (the
Type-1 view) prunes to a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an ordered change stream into SCD2 intervals.

    Input: one row per observation (key, attr, ts). Output: one row per
    *run* of consecutive equal attr values per key, with
    (key, attr, valid_from, valid_to, version, is_current); valid_to is
    NULL on the open (current) interval. Consecutive duplicate
    observations of the same value collapse into one interval.

    ``tiebreak_col`` makes the ordering total when ts has duplicates —
    required for deterministic output (and mirrored in the oracle).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    # change points: first observation, or attr differs from previous
    prev = F.lag(attr_col).over(w)
    changed = df.withColumn(
        "_is_change",
        # null-safe: first row per key opens an interval; a NULL attr is
        # a legal state distinct from every non-NULL one
        F.row_number().over(w) == 1,
    ).withColumn(
        "_is_change",
        F.col("_is_change") | ~F.col(attr_col).eqNullSafe(prev),
    ).filter(F.col("_is_change"))
    # the same window spec applied to the filtered frame now ranges
    # over change points only: each one opens an interval closed by the
    # next change's timestamp
    return (
        changed.withColumn("_valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .select(
            F.col(key_col),
            F.col(attr_col),
            F.col(ts_col).alias("valid_from"),
            F.col("_valid_to").alias("valid_to"),
            "version",
            F.col("_valid_to").isNull().alias("is_current"),
        )
    )

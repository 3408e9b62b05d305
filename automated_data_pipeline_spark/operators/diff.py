"""Snapshot diff (CDC-style): compare two keyed table versions and
classify every key as inserted / deleted / changed / unchanged.

Complements the runner's versioned TargetTable (runner.py): computing
what changed between v=N and v=N+1 is one full-outer join on the key —
the plain-parquet analogue of a Delta CDF read. Change detection
compares a configurable column subset hashed JVM-side, so wide rows
don't serialize through the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Full-outer join diff keyed on ``key``. Output: key, change_type
    ('inserted' | 'deleted' | 'changed' | 'unchanged'), plus old_/new_
    prefixed compare columns. One shuffle per side on the key.

    ``compare_cols`` semantics: None (default) compares the non-key
    columns present in BOTH snapshots — a schema-evolved snapshot
    (column added in v+1) still diffs instead of crashing on the
    missing column, with the added column excluded from change
    detection. An EXPLICIT empty list means key-presence-only diff
    (every matched key is 'unchanged'); explicit columns missing from
    either side raise with a clear message."""
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c != key and c in set(old.columns)
        ]
    else:
        missing = [
            c for c in compare_cols
            if c not in new.columns or c not in old.columns
        ]
        if missing:
            raise ValueError(
                f"compare_cols not present in both snapshots: {missing}"
            )

    def tagged(df: DataFrame, side: str) -> DataFrame:
        cols = [F.col(key)] + [
            F.col(c).alias(f"{side}_{c}") for c in compare_cols
        ]
        # hash a JSON array, not concat_ws: concat_ws silently skips
        # NULLs (NULL vs '' would collide, and values could smuggle the
        # separator); a JSON array keeps null entries and quotes values.
        # Zero compare columns -> constant fingerprint (F.array() types
        # as array<null>, which to_json rejects) = presence-only diff.
        fp = (
            F.md5(
                F.to_json(
                    F.array(*[F.col(c).cast("string") for c in compare_cols])
                )
            )
            if compare_cols
            else F.lit("∅")
        )
        return df.select(*cols, fp.alias(f"{side}_fp"))

    o = tagged(old, "old")
    n = tagged(new, "new")
    joined = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("inserted"))
        .when(F.col("new_fp").isNull(), F.lit("deleted"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.withColumn("change_type", change).drop("old_fp", "new_fp")
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out

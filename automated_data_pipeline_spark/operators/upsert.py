"""Upsert / merge operator (SURVEY.md §2.1 S7, §2.5 J3).

Reference semantics: Staging -> Target keyed on the business key; update
matched rows, insert new ones (SQLite ``ON CONFLICT(OrderId) DO UPDATE``
python_code/orchestrator/steps/migrate.js:7-17; T-SQL ``MERGE``
python_code/database/sqlserver/005_sp_migrate.sql:14-24).

Spark-first design: without Delta Lake in the image, MERGE is expressed
as the equivalent join rewrite. For "updates fully replace matched rows"
semantics (what the reference does — every target column is overwritten
on match), the cheapest correct plan is an **anti-join + union**:

    target'  =  updates  UNION ALL  (target ANTI JOIN updates ON key)

which shuffles each side once on the key and avoids the wide
coalesce-per-column projection of a full-outer-join rewrite. At 100 TB,
both sides hash-partition on the key; with bucketed storage the shuffle
disappears entirely. A generic full-outer MERGE (partial column updates)
is provided too for completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_replace(target: DataFrame | None, updates: DataFrame, key: str) -> DataFrame:
    """MERGE where matched rows are fully replaced by the update row.

    ``updates`` must already be deduped on ``key`` (last-wins — see
    operators.stages.dedup_last_wins).
    """
    if target is None:
        return updates
    updates = updates.select(*target.columns)  # align column order
    kept = target.join(updates.select(key), on=key, how="left_anti")
    return updates.unionByName(kept)


def upsert_merge(
    target: DataFrame | None,
    updates: DataFrame,
    key: str,
    set_columns: list[str] | None = None,
) -> DataFrame:
    """Generic MERGE via full-outer join: update only ``set_columns`` on
    match (others keep target values), insert unmatched update rows.
    Matches Delta ``MERGE INTO ... WHEN MATCHED UPDATE SET ... WHEN NOT
    MATCHED INSERT *`` without requiring Delta."""
    if target is None:
        return updates
    if set_columns is None:
        set_columns = [c for c in updates.columns if c != key]
    # presence markers, NOT key nullity, decide the branch: a real
    # target row whose business key is NULL also has t.key IS NULL, and
    # branching on that would replace its every column with the (absent)
    # update side — i.e. silently wipe the row
    t = target.withColumn("_t_present", F.lit(1)).alias("t")
    u = updates.withColumn("_u_present", F.lit(1)).alias("u")
    joined = t.join(u, on=F.col(f"t.{key}") == F.col(f"u.{key}"), how="full_outer")
    cols = [
        F.coalesce(F.col(f"t.{key}"), F.col(f"u.{key}")).alias(key)
    ]
    for c in target.columns:
        if c == key:
            continue
        u_val = F.col(f"u.{c}") if c in updates.columns else F.lit(None)
        matched_val = (
            F.col(f"u.{c}")
            if (c in set_columns and c in updates.columns)
            else F.col(f"t.{c}")
        )
        cols.append(
            # WHEN NOT MATCHED INSERT * — every update column, not just
            # set_columns, feeds a brand-new row
            F.when(F.col("t._t_present").isNull(), u_val)
            .when(F.col("u._u_present").isNull(), F.col(f"t.{c}"))
            .otherwise(matched_val)
            .alias(c)
        )
    return joined.select(*cols)

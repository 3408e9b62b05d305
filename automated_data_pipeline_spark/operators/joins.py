"""Temporal / range join operators the reference lacks (SURVEY.md §2.5
notes them absent) but a large-scale pipeline needs. Both are pure
DataFrame compositions — no UDFs, no driver loops.

As-of join: implemented as union + partitioned window scan, NOT as a
join. The naive formulation (join on key with ts inequality, then pick
max) shuffles |L|x|R| candidate pairs per key; this formulation shuffles
each row exactly once on the key and resolves the match with a running
``last(ignorenulls)`` — the standard log-merge pattern, linear in input
size, skew-bounded by the hottest key, which is the best any engine can
do for as-of semantics.

Range join: small band dimension -> broadcast + inequality predicate
(BroadcastNestedLoopJoin over a handful of bands is a map-side scan);
large-large interval joins should bin both sides first (see
``interval_overlap_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: dict[str, str],
    left_seq: str | None = None,
    right_seq: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of,
    inclusive). Left rows with no prior right row keep NULL payload.

    ``right_payload`` maps right column -> output alias; output aliases
    must not collide with left columns. ``*_seq`` columns deterministically
    break ties among equal timestamps (latest seq wins on the right).
    """
    pay = F.struct(
        *[F.col(c).alias(alias) for c, alias in right_payload.items()]
    ).alias("_pay")
    # a NULL right timestamp would sort FIRST (ASC NULLS FIRST) and act
    # as a universal fallback match for every left row — it carries no
    # event time, so it can never satisfy right_ts <= left_ts
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(right_seq) if right_seq else F.lit(0)).alias("_seq"),
        pay,
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        (F.col(left_seq) if left_seq else F.lit(0)).alias("_seq"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (_side 0 < 1), so the
    # backward match is inclusive; one shuffle on `on`, no join
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_ts", "_side", "_seq", "_pay")
    )
    out = matched.select(
        *[c for c in matched.columns if c != "_match"],
        *[F.col(f"_match.{alias}").alias(alias) for alias in right_payload.values()],
    )
    return out


def range_join_bands(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join fact rows onto the band whose [lo, hi) interval contains
    ``value_col``. Bands are broadcast — a non-equi predicate against a
    broadcast side is a map-side scan per row, no shuffle."""
    # qualify the fact side too: an unqualified F.col(value_col) is
    # AMBIGUOUS when the bands frame happens to carry a column of the
    # same name (e.g. bands derived from the fact itself)
    cond = (fact[value_col] >= bands[lo_col]) & (fact[value_col] < bands[hi_col])
    return fact.join(F.broadcast(bands), cond, "inner")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Large-large interval overlap join: explode each interval onto the
    fixed-width bins it touches, equi-join on (key, bin), then verify the
    exact overlap predicate and drop the double matches (a pair is kept
    only at the first bin both intervals share). Turns the quadratic
    inequality join into a shuffle-hash equi-join whose cost is bounded
    by bin occupancy. Bounds columns are numeric (cast timestamps to
    epoch seconds upstream) and must be NON-NULL (a NULL bound makes
    F.sequence NULL and explode silently DROPS the row — filter or
    coalesce upstream; a silent vanish would read as 'no overlap').

    Right-side columns whose names collide with left-side ones come
    back prefixed ``r_`` so the output is selectable (two same-named
    columns make every later reference AMBIGUOUS)."""
    if bin_width <= 0:
        # 0 would NULL every bin expression and silently return an
        # empty join — a misconfiguration must be loud
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    on = on or []

    def binned(df: DataFrame, s: str, e: str, side: str) -> DataFrame:
        return df.withColumn(
            f"_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bin_width), F.floor(F.col(e) / bin_width)
                )
            ),
        ).withColumn(f"_{side}_start_bin", F.floor(F.col(s) / bin_width))

    lb = binned(left, l_start, l_end, "l").alias("a")
    # rename the right side's shared key columns so the output carries
    # each `on` key once (they're equal by the join condition anyway),
    # and prefix any OTHER name collision with r_ so the output stays
    # unambiguous (identically-named bounds like start/end are natural
    # for interval tables)
    rb = binned(right, r_start, r_end, "r")
    for k in on:
        rb = rb.withColumnRenamed(k, f"_r_on_{k}")
    collisions = (set(left.columns) & set(right.columns)) - set(on)
    # the disambiguating prefix must not itself produce a name that
    # already exists on either side (left holding both `start` and
    # `r_start` would yield TWO r_start columns — exactly the
    # ambiguity the rename exists to prevent); escalate until unique
    taken = set(left.columns) | set(right.columns)
    prefix = "r_"
    while any(f"{prefix}{c}" in taken for c in collisions):
        prefix = "r" + prefix
    r_name = {c: (f"{prefix}{c}" if c in collisions else c) for c in right.columns}
    for c in sorted(collisions):
        rb = rb.withColumnRenamed(c, r_name[c])
    rb = rb.alias("b")
    cond = F.col("a._bin") == F.col("b._bin")
    for k in on:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b._r_on_{k}"))
    # exact overlap: [l_start, l_end] ∩ [r_start, r_end] non-empty
    cond = cond & (F.col(f"a.{l_start}") <= F.col(f"b.{r_name[r_end]}"))
    cond = cond & (F.col(f"b.{r_name[r_start]}") <= F.col(f"a.{l_end}"))
    # dedup: count the pair only in the first shared bin
    cond = cond & (
        F.col("a._bin")
        == F.greatest(F.col("a._l_start_bin"), F.col("b._r_start_bin"))
    )
    out = lb.join(rb, cond).drop("_bin", "_l_start_bin", "_r_start_bin")
    return out.drop(*[f"_r_on_{k}" for k in on])

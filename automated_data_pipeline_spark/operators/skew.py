"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime and is the first line of defense. These explicit
operators cover the cases AQE cannot fix:

- ``salted_aggregate``: a hot-key groupBy where ONE reducer drowns.
  Two-phase: pre-aggregate on (key, salt) — map-side combine already
  shrinks this — then final-aggregate on key. Works for any algebraic
  aggregate (decomposable into partial + merge).
- ``salted_join``: join a skewed fact against a dimension by exploding
  the dimension R ways and salting the fact uniformly, so a hot key's
  rows spread over R reducers instead of one.

Salting is OPT-IN for *measured* skew, not a default join strategy: on
uniform keys it pays an R-times dimension replication plus a per-row
hash for nothing (measured 15.5x a plain join at the x10 uniform
TPC-H fixture — SCALE_VALIDATION r6/r7, adjudicated in BASELINE.md).
Pass ``auto_threshold`` to have ``salted_join`` sample the fact's key
histogram first and fall back to a plain (AQE-handled) join when the
hottest key's share is below the threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Observability for the auto path (mirrors dedup.LAST_AUTOSWITCH): the
# last skew estimate + decision taken, for scale-validation artifacts.
LAST_SALT_DECISION: dict = {}


def _row_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> Column:
    """Deterministic per-row salt: a content hash of ``cols`` (default
    every column).

    NOT spark_partition_id() + monotonically_increasing_id(): both are
    functions of the physical partition and row ORDER, which a partial
    stage retry recomputes differently (the SPARK-23207 class of
    corruption — a row's partial lands in two salt groups or none when
    only some map tasks re-run). A content hash re-salts identically
    on recomputation. Rows identical in the hashed columns share a
    salt, which is harmless for aggregation totals and join results —
    but pass the row's UNIQUE ID columns when one exists: hashing one
    narrow id is measurably cheaper than hashing a wide row (and
    spreads true duplicates too)."""
    cols = cols or df.columns
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols], F.lit(42)),
        F.lit(n_salts),
    ).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name ->
    (input column, fn) with fn in {sum, count, min, max}. COUNT becomes
    SUM of partial counts in the merge phase; AVG callers compose it
    from sum+count (algebraic decomposition)."""
    partial_exprs, merge_exprs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(f"_p_{out}"))
            merge_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            merge_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            merge_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            merge_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn("_salt", _row_salt(df, n_salts, salt_cols))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*merge_exprs)


def estimate_top_key_share(
    df: DataFrame,
    key: str,
    fraction: float = 0.02,
    cap: int = 200_000,
    seed: int = 42,
) -> float:
    """Sampled estimate of the hottest key's share of rows, in [0, 1].

    One cheap extra Spark job, all JVM-side: project the key column,
    sample ``fraction``, hash every sampled key into at most ``cap``
    buckets, and return max-bucket-count / total. A global
    ``limit(cap)`` here would take whichever partitions answer first —
    on a fact clustered/sorted by the join key the slice could
    entirely miss a hot key concentrated later in the scan, silently
    steering auto mode onto the straggler plan (ADVICE r7). The
    bucketed histogram instead counts EVERY sampled row from EVERY
    partition (a whole-stage-codegen aggregate with map-side combine)
    while bounding the aggregation state and shuffle at ``cap``
    buckets regardless of key cardinality — the 1-row-CMS shape. The
    max-bucket share is a tight UPPER bound on the top-key share: a
    hot key's whole mass lands in one bucket, and collision bias adds
    only ~uniform-mass/cap on flat data (with cap=65536 buckets a
    flat histogram cannot fake a 5% hot share), so the auto-salting
    decision errs — rarely, and only toward the cheap mitigation. A
    30%-hot key is detectable from a few thousand sampled rows, so
    the defaults are generous."""
    n_buckets = max(256, min(cap, 65_536))
    s = df.select(
        F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(n_buckets)).alias(
            "_bkt"
        )
    ).sample(fraction=fraction, seed=seed)
    row = (
        s.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n").alias("mx"), F.sum("_n").alias("tot"))
        .first()
    )
    if row is None or not row["tot"]:
        return 0.0
    return float(row["mx"]) / float(row["tot"])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
    auto_threshold: float | None = None,
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join: the dimension replicates n_salts
    ways, the fact salts uniformly, and the join key becomes
    (key, salt) — a hot fact key spreads across n_salts reducers.
    Use when the dim is too large to broadcast but small enough to
    replicate n_salts times. Only fact-preserving join types are
    allowed: a dim-preserving join (right/full) would emit each
    unmatched dim row once per salt replica.

    With ``auto_threshold`` set (recommended), the fact's key histogram
    is sampled first (``estimate_top_key_share``) and the salted plan
    is used ONLY when the hottest key's estimated share exceeds the
    threshold; otherwise this returns the plain join and lets AQE
    handle residual imbalance. On uniform keys the salted plan is pure
    overhead (n_salts-times dim replication + per-row hash; 15.5x a
    plain join at the x10 uniform fixture — BASELINE.md), so
    unconditional salting should be reserved for keys KNOWN to be hot.
    The sampling decision is recorded in ``LAST_SALT_DECISION``."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only ({sorted(allowed)}); "
            f"got {how!r} — unmatched dim rows would duplicate n_salts times"
        )
    if auto_threshold is not None:
        share = estimate_top_key_share(fact, key)
        salt = share >= auto_threshold
        LAST_SALT_DECISION.clear()
        LAST_SALT_DECISION.update(
            {"top_key_share": round(share, 4), "threshold": auto_threshold,
             "salted": salt}
        )
        if not salt:
            return fact.join(dim, [key], how)
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact_salted = fact.withColumn("_salt", _row_salt(fact, n_salts, salt_cols))
    return fact_salted.join(dim_salted, [key, "_salt"], how).drop("_salt")

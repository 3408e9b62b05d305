"""Shared exact-integer-sums statistics expressions.

The batch query (suite/round5.rolling_daily_zscore) and the streaming
monitor (streaming/anomaly.read_anomalies) are twins of one signal;
this module is the single copy of the z-score derivation so they can
never drift apart again (they already had once — a formula cleanup
landed in one and not the other before this was extracted).

Contract: the caller's window carries ONLY exact integer aggregates —
count (cw), sum (s), sum of squares (ss) — over the baseline rows
(typically a trailing frame EXCLUDING the current row, so a spike
cannot inflate its own baseline). mean/variance/z are then derived in
plain double arithmetic: identical operands + identical ops = identical
doubles on any engine, which is what lets a DuckDB oracle replay the
exact value. Engine-native stddev/variance aggregates are banned here
— their streaming/two-pass implementations differ across engines (and
across partial-aggregation orders) at the ulp level, which the strict
str()-comparison gate turns into failures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(x: Column, digits: int) -> Column:
    """floor(x * 10^d + 0.5) / 10^d — half-up rounding written as plain
    double arithmetic. Spark's round() (BigDecimal HALF_UP over the
    decimal expansion) and DuckDB's round() (float-domain) disagree
    when a quotient lands on a .5 boundary; this form is the same op
    sequence on both engines. Use it (and its SQL twin, spelled
    identically) whenever a ROUNDED RATIO crosses the oracle gate."""
    p = float(10 ** digits)
    return F.floor(x * p + 0.5) / p


def trailing_zscore(
    n: Column,
    cw: Column,
    s: Column,
    ss: Column,
    min_samples: int = 4,
    digits: int = 4,
) -> Column:
    """z-score of ``n`` against a baseline summarized by exact integer
    window aggregates (cw = count, s = sum, ss = sum of squares).
    NULL when the baseline has fewer than ``min_samples`` rows (a
    2-sample baseline makes ordinary fluctuation a 2-sigma event) or
    zero variance. Sample variance = (cw*ss - s^2) / (cw*(cw-1)),
    computed on exact integers with one double derivation at the end.

    The products run in decimal(38,0), not bigint: at real volumes
    (n ~ 2e8 events/window over a 7-window baseline) cw*ss passes
    int64's 9.2e18 ceiling and Spark's ANSI mode would raise
    ARITHMETIC_OVERFLOW exactly when volume spikes — the event the
    monitor exists to flag. Decimal keeps the arithmetic exact (the
    oracle contract), and its DuckDB twin is a HUGEINT cast.
    """
    dec = "decimal(38,0)"
    var_num = cw.cast(dec) * ss.cast(dec) - s.cast(dec) * s.cast(dec)
    mean = s.cast("double") / cw
    sd = F.sqrt(var_num.cast("double") / (cw * (cw - 1)))
    return F.when(
        (cw >= max(2, int(min_samples))) & (var_num > 0),
        portable_round((n.cast("double") - mean) / sd, digits),
    )


def anomaly_flag(z: Column, threshold: float = 2.0) -> Column:
    """|z| >= threshold, never NULL (warm-up rows are not anomalies)."""
    return F.coalesce(F.abs(z) >= float(threshold), F.lit(False))

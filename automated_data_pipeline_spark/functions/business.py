"""Business-rule expressions (SURVEY.md §2.3 F6–F7).

F6 amount bucketing (python_code/orchestrator/steps/transform.js:13;
python_code/database/sqlserver/004_sp_transform.sql:21-25):
    amount <  50  -> 'Low'
    amount < 200  -> 'Medium'
    else          -> 'High'

F7 (java_code/.../steps/TransformStep.java:33-35): negative amounts
deliberately fail the run in the Java reference (oversized category
string overflows NVARCHAR(32)). Preserved here as an explicit
validation error path, not a data rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOW_THRESHOLD = 50
MEDIUM_THRESHOLD = 200


def amount_category(c: Column) -> Column:
    """F6: the Low/Medium/High bucketing rule.

    NULL amounts bucket 'Low' — the JS reference coerces null/junk to
    0 before bucketing (Number(null) === 0, extract.js:15), and the
    stage wiring applies safe_amount's coalesce-to-0 first anyway.
    Without the explicit branch, a NULL would fall through every
    when() into otherwise('High') — the OPPOSITE end of the scale —
    for any caller using the helper on un-coerced data."""
    return (
        F.when(c.isNull() | (c < LOW_THRESHOLD), F.lit("Low"))
        .when(c < MEDIUM_THRESHOLD, F.lit("Medium"))
        .otherwise(F.lit("High"))
    )


class NegativeAmountError(ValueError):
    """Raised when fail_on_negative is enabled and negative amounts exist
    (the Java reference's deliberate failure rule, TransformStep.java:33-35)."""


def check_no_negative_amounts(df: DataFrame, amount_col: str = "amount") -> None:
    """F7 error path: one aggregation action; raises on any negative amount."""
    n_bad = df.filter(F.col(amount_col) < 0).limit(1).count()
    if n_bad:
        raise NegativeAmountError(
            "negative Amount encountered (reference failure-injection rule)"
        )

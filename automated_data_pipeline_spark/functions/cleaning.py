"""Cleaning/coercion expressions (SURVEY.md §2.3 F1–F5).

Canonical semantics decisions (documented forks between the reference's
three implementations):
- junk/missing Amount -> 0            (python_code/orchestrator/steps/extract.js:15;
                                       java_code/.../steps/ExtractStep.java:37-41;
                                       the T-SQL variant keeps NULL: 003_sp_extract.sql:20)
- unparseable OrderDate -> NULL       (extract.js:21-25; ExtractStep.java:42-48)
- blank CustomerId -> 'UNKNOWN'       (extract.js:16; ExtractStep.java:35-36)
- blank/NULL OrderId -> row dropped   (003_sp_extract.sql:24; extract.js:12-13)

All are pure Column expressions so Catalyst can fold/push them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNKNOWN_CUSTOMER = "UNKNOWN"


def trimmed(c: Column) -> Column:
    """F1: LTRIM(RTRIM(x))."""
    return F.trim(c)


def empty_to_null(c: Column) -> Column:
    """F2: NULLIF(LTRIM(RTRIM(x)), '')."""
    return F.nullif(F.trim(c), F.lit(""))


def safe_amount(c: Column) -> Column:
    """F3: tolerant decimal parse; junk/missing coerces to 0.00.

    ``try_cast`` gives NULL-on-junk (the TRY_CAST semantics), then the
    canonical default-0 is applied via coalesce.
    """
    return F.coalesce(
        F.trim(c).try_cast("decimal(18,2)"),
        F.lit(0).cast("decimal(18,2)"),
    )


def safe_date(c: Column) -> Column:
    """F4: tolerant date parse -> NULL on failure.

    Accepts ISO ``yyyy-MM-dd`` and full ISO timestamps (the JS impl
    accepts anything Date() parses then slices to yyyy-MM-dd; the Java
    impl requires strict ISO dates — canonical = ISO date or ISO
    timestamp prefix, NULL otherwise).

    Known laxity, deliberate: Spark's date cast also accepts the bare
    ``yyyy`` / ``yyyy-MM`` prefixes (-> Jan 1 / 1st), which matches
    the JS reference (``new Date('2024')`` is valid) but is laxer than
    the extract oracle's single ``TRY_CAST(.. AS DATE)``. The gate
    fixtures only carry full-ISO or unparseable strings, where the two
    agree; callers feeding partial dates get JS-reference behavior.
    """
    t = F.trim(c)
    return F.coalesce(
        t.try_cast("date"),
        F.to_date(t.try_cast("timestamp")),
    )


def default_customer(c: Column) -> Column:
    """F5: blank/NULL CustomerId -> 'UNKNOWN'."""
    return F.coalesce(empty_to_null(c), F.lit(UNKNOWN_CUSTOMER))


def valid_order_id(c: Column) -> Column:
    """P2 predicate: OrderId present and non-blank after trim."""
    return c.isNotNull() & (F.trim(c) != F.lit(""))

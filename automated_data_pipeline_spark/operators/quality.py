"""Data-quality rule checking (expectation suite over DataFrames).

The reference validates rows only implicitly (Extract's invalid-row
filter, SURVEY.md §2.2 P2, `003_sp_extract.sql:24`); a production
pipeline additionally wants declarative table-level expectations —
null-rate, uniqueness, range, referential membership — evaluated as a
report, not a crash. This is the Deequ/dbt-test shape, Spark-first.

Scale design: every rule is a boolean column expression folded into ONE
aggregate pass over the table (sum of 0/1 casts + count(*)), so a
50-rule suite costs a single scan with map-side partials — no per-rule
jobs, no shuffle beyond the final scalar row. Uniqueness rules need a
groupBy on the key (one shuffle) and are evaluated in the same report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stats import portable_round


def rule_report(
    df: DataFrame, table: str, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate (check_name, violation_condition) rules in one scan.
    A rule's condition is TRUE when the row VIOLATES the expectation.
    Returns one row per rule: (table, check, n_rows, n_violations,
    violation_rate)."""
    if not rules:
        # F.array() of zero structs types as array<null> and the
        # field extraction fails at planning time; zero rules = zero
        # report rows, not an AnalysisException
        return df.sparkSession.createDataFrame(
            [],
            "table_name string, check_name string, n_rows bigint, "
            "n_violations bigint, violation_rate double",
        )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, cond) in enumerate(rules):
        # outer coalesce: sum over ZERO rows is NULL — an empty table
        # (or empty micro-batch) must report 0 violations, not NULL
        aggs.append(
            F.coalesce(
                F.sum(F.coalesce(cond.cast("int"), F.lit(0))), F.lit(0)
            ).alias(f"_v{i}")
        )
    row = df.agg(*aggs)
    # ONE aggregate row -> N report rows via explode. (A per-rule
    # select + union would re-execute the aggregate — and therefore
    # re-SCAN the table — once per rule.)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"_v{i}").cast("bigint").alias("n_violations"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return (
        row.select(
            F.col("_n").cast("bigint").alias("n_rows"),
            F.explode(pairs).alias("p"),
        )
        .select(
            F.lit(table).alias("table_name"),
            F.col("p.check_name").alias("check_name"),
            F.col("n_rows"),
            F.col("p.n_violations").alias("n_violations"),
            # portable_round, not F.round: the rate is a rounded
            # QUOTIENT crossing the strict oracle gate (see
            # functions/stats.portable_round)
            F.when(F.col("n_rows") == 0, F.lit(0.0))
            .otherwise(
                portable_round(
                    F.col("p.n_violations") / F.col("n_rows"), 6
                )
            )
            .cast("double")
            .alias("violation_rate"),
        )
    )


def uniqueness_report(
    df: DataFrame, table: str, key_cols: list[str]
) -> DataFrame:
    """Duplicate-key expectation: one shuffle on the key and ONE scan
    (total row count comes from sum of the per-key counts — a separate
    df.count() action would scan the table a second time), reported in
    the same (table, check, n_rows, n_violations, rate) shape. A
    violation is every row beyond the first for its key."""
    dup_rows = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("extra"),
            F.coalesce(F.sum("c"), F.lit(0)).alias("total"),
        )
    )
    return dup_rows.select(
        F.lit(table).alias("table_name"),
        F.lit(f"unique({','.join(key_cols)})").alias("check_name"),
        F.col("total").cast("bigint").alias("n_rows"),
        F.col("extra").cast("bigint").alias("n_violations"),
        # empty table: 0/0 raises under ANSI mode
        F.when(F.col("total") == 0, F.lit(0.0))
        .otherwise(portable_round(F.col("extra") / F.col("total"), 6))
        .cast("double")
        .alias("violation_rate"),
    )

"""Unit oracles for round-3 operators: SCD2 history build, asymmetric
containment dedup, int8 embedding quantization, TF-IDF ranking.
"""

from pyspark.sql import functions as F

from automated_data_pipeline_spark.functions import vectors as V
from automated_data_pipeline_spark.operators import dedup, scd


def test_scd2_history_collapses_runs_and_dates_intervals(spark):
    rows = [
        # key 1: A A B A -> 3 intervals (the repeated A collapses)
        (1, "A", 1, 10),
        (1, "A", 2, 11),
        (1, "B", 3, 12),
        (1, "A", 4, 13),
        # key 2: single observation -> one open interval
        (2, "X", 5, 14),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts int, tb int")
    out = scd.scd2_history(df, "k", "attr", "ts", tiebreak_col="tb")
    got = {
        (r["k"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("A", 1, 3, False),
        (1, 2): ("B", 3, 4, False),
        (1, 3): ("A", 4, None, True),
        (2, 1): ("X", 5, None, True),
    }


def test_scd2_history_tiebreak_orders_same_timestamp(spark):
    # two observations at the same ts: the tiebreak column decides order
    rows = [(1, "B", 1, 2), (1, "A", 1, 1)]
    df = spark.createDataFrame(rows, "k int, attr string, ts int, tb int")
    out = scd.scd2_history(df, "k", "attr", "ts", tiebreak_col="tb")
    by_ver = {r["version"]: r["attr"] for r in out.collect()}
    assert by_ver == {1: "A", 2: "B"}


def test_containment_catches_subset_doc_jaccard_misses(spark):
    # doc 2 is doc 1's text verbatim plus a long tail: containment of
    # the smaller shingle set is 1.0, symmetric jaccard is low
    core = " ".join(f"w{i} w{i}" for i in range(12))
    tail = " ".join(f"t{i}" for i in range(40))
    rows = [
        (1, core),
        (2, core + " " + tail),
        (3, "completely different text about nothing shared at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = dedup.containment_pairs(df, "doc_id", "text", threshold=0.9)
    got = [(r["id_a"], r["id_b"], r["containment"]) for r in pairs.collect()]
    assert got == [(1, 2, 1.0)]
    # and the symmetric jaccard of that pair really is below 0.8
    jac = dedup.jaccard_pairs(df, "doc_id", "text", threshold=0.8)
    assert jac.count() == 0


def test_int8_quantize_codes_and_scale(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = df.select(
        "vec_id",
        V.int8_scale(F.col("embedding")).alias("scale"),
        V.int8_quantize(F.col("embedding")).alias("qv"),
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    # scale = max|v|/127; codes = round(v/scale) -> max maps to ±127
    assert abs(by_id[1]["scale"] - 1.0 / 127.0) < 1e-12
    assert by_id[1]["qv"] == [127, -64, 32, 0]  # -63.5 rounds away from zero
    # zero vector: scale 0, all-zero codes (no division)
    assert by_id[2]["scale"] == 0.0
    assert by_id[2]["qv"] == [0, 0, 0, 0]


def test_int8_quantize_dequant_error_bounded(spark):
    import math

    vals = [0.813, -0.204, 0.055, -0.991, 0.402]
    df = spark.createDataFrame(
        [(1, vals)], "vec_id bigint, embedding array<float>"
    )
    r = df.select(
        V.int8_scale(F.col("embedding")).alias("s"),
        V.int8_quantize(F.col("embedding")).alias("qv"),
    ).first()
    for orig, code in zip(vals, r["qv"]):
        assert abs(code * r["s"] - orig) <= r["s"] / 2 + 1e-6
    assert max(abs(c) for c in r["qv"]) == 127
    assert math.isclose(r["s"], 0.991 / 127.0, rel_tol=1e-6)

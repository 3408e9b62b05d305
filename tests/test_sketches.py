"""Sketch operators (operators/sketches.py): mergeability — the
property that makes sketches cluster-correct (executor-local partials
combine associatively) — plus accuracy bounds, both estimator
branches, and Python-reference parity for the deterministic hashing.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from automated_data_pipeline_spark.functions.text import stable_hash64_py
from automated_data_pipeline_spark.operators import sketches as SK


def _items_df(spark, n, prefix="item", group="g1"):
    return spark.range(n).select(
        F.lit(group).alias("g"),
        F.concat(F.lit(f"{prefix}-"), F.col("id")).alias("item"),
    )


# --------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------
def test_kmv_exact_below_k(spark):
    df = _items_df(spark, 10)
    sk = SK.kmv_sketch(df, F.col("item"), ["g"], k=64)
    est = SK.kmv_estimate(sk, ["g"], k=64).first()
    assert est["n_seen"] == 10
    assert est["kmv_est"] == 10  # below k the sketch IS the exact set


def test_kmv_estimate_accuracy(spark):
    n = 5000
    df = _items_df(spark, n)
    sk = SK.kmv_sketch(df, F.col("item"), ["g"], k=128)
    est = SK.kmv_estimate(sk, ["g"], k=128).first()["kmv_est"]
    # k=128 gives ~1/sqrt(k) ≈ 9% relative std error; allow 3 sigma
    assert abs(est - n) / n < 0.27


def test_kmv_merge_property(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    partial-aggregation identity a 1000-executor rollup relies on."""
    a = _items_df(spark, 400, prefix="a")
    b = _items_df(spark, 400, prefix="b")
    k = 32
    whole = SK.kmv_sketch(a.union(b), F.col("item"), ["g"], k=k)
    parts = SK.kmv_sketch(a, F.col("item"), ["g"], k=k).union(
        SK.kmv_sketch(b, F.col("item"), ["g"], k=k)
    )
    # merging = re-applying bottom-k to the unioned partial sketches
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.asc("hv"))
    merged = (
        parts.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    assert sorted(r["hv"] for r in whole.collect()) == sorted(
        r["hv"] for r in merged.collect()
    )


def test_kmv_matches_python_reference(spark):
    items = [f"ref-{i}" for i in range(300)]
    df = spark.createDataFrame([(x,) for x in items], "item string").select(
        F.lit("g").alias("g"), "item"
    )
    k = 16
    est = SK.kmv_estimate(
        SK.kmv_sketch(df, F.col("item"), ["g"], k=k), ["g"], k=k
    ).first()
    hashes = sorted(stable_hash64_py(x) for x in items)
    kth = hashes[k - 1]
    expected = int((k - 1) / (kth / SK.HASH_SPACE) + 0.5)
    assert est["kth_hash"] == kth
    assert est["kmv_est"] == expected


# --------------------------------------------------------------------
# HLL
# --------------------------------------------------------------------
def test_hll_accuracy_raw_branch(spark):
    n = 20000  # >> 2.5 * 512 -> raw harmonic-mean branch
    df = _items_df(spark, n)
    regs = SK.hll_registers(df, F.col("item"), ["g"], p=9)
    est = SK.hll_estimate(regs, ["g"], p=9).first()["hll_est"]
    # p=9 -> ~1.04/sqrt(512) ≈ 4.6% std error; allow 3 sigma
    assert abs(est - n) / n < 0.14


def test_hll_linear_counting_branch(spark):
    n = 100  # << 2.5 * 512 with empty buckets -> linear counting
    df = _items_df(spark, n)
    regs = SK.hll_registers(df, F.col("item"), ["g"], p=9)
    row = SK.hll_estimate(regs, ["g"], p=9).first()
    assert row["n_buckets"] < 512
    # linear counting is near-exact at this load factor
    assert abs(row["hll_est"] - n) / n < 0.05


def test_hll_merge_property(spark):
    """Registers merge by per-bucket MAX: sketch(A ∪ B) ==
    max-merge(sketch(A), sketch(B))."""
    a = _items_df(spark, 1500, prefix="a")
    b = _items_df(spark, 1500, prefix="b")
    whole = SK.hll_registers(a.union(b), F.col("item"), ["g"], p=9)
    merged = (
        SK.hll_registers(a, F.col("item"), ["g"], p=9)
        .union(SK.hll_registers(b, F.col("item"), ["g"], p=9))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    lhs = {(r["bucket"], r["rho"]) for r in whole.collect()}
    rhs = {(r["bucket"], r["rho"]) for r in merged.collect()}
    assert lhs == rhs


def test_hll_rho_matches_python_reference(spark):
    items = [f"rho-{i}" for i in range(50)]
    df = spark.createDataFrame([(x,) for x in items], "item string").select(
        F.lit("g").alias("g"), "item"
    )
    regs = {
        r["bucket"]: r["rho"]
        for r in SK.hll_registers(df, F.col("item"), ["g"], p=9).collect()
    }
    expected: dict[int, int] = {}
    for x in items:
        hv = stable_hash64_py(x)
        bucket, rem = hv >> 51, hv & ((1 << 51) - 1)
        rho = 52 if rem == 0 else 51 - rem.bit_length() + 1
        expected[bucket] = max(expected.get(bucket, 0), rho)
    assert regs == expected


# --------------------------------------------------------------------
# CMS
# --------------------------------------------------------------------
def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    rows = [(f"k{i}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "item string")
    sketch = SK.cms_sketch(df, F.col("item"), d=3, w=256)
    true = df.groupBy("item").count()
    est = SK.cms_estimate(sketch, true, "item", d=3, w=256)
    joined = {
        r["item"]: (r["count"], r["cms_est"])
        for r in true.join(est, "item").collect()
    }
    assert len(joined) == 20
    for item, (t, e) in joined.items():
        assert e >= t, f"CMS underestimated {item}"
    # 20 keys in 3x256 cells: collisions are rare -> mostly exact
    exact = sum(1 for t, e in joined.values() if e == t)
    assert exact >= 15


def test_cms_merge_property(spark):
    a = spark.createDataFrame([(f"x{i % 7}",) for i in range(100)], "item string")
    b = spark.createDataFrame([(f"x{i % 11}",) for i in range(100)], "item string")
    whole = SK.cms_sketch(a.union(b), F.col("item"), d=2, w=64)
    merged = (
        SK.cms_sketch(a, F.col("item"), d=2, w=64)
        .union(SK.cms_sketch(b, F.col("item"), d=2, w=64))
        .groupBy("seed", "bucket")
        .agg(F.sum("total").alias("total"))
    )
    lhs = {(r["seed"], r["bucket"]): r["total"] for r in whole.collect()}
    rhs = {(r["seed"], r["bucket"]): r["total"] for r in merged.collect()}
    assert lhs == rhs


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "item string, wgt int"
    )
    sketch = SK.cms_sketch(df, F.col("item"), d=3, w=64, weight_col="wgt")
    est = SK.cms_estimate(sketch, df.select("item"), "item", d=3, w=64)
    vals = {r["item"]: r["cms_est"] for r in est.collect()}
    assert vals["a"] >= 12 and vals["b"] >= 1


def test_cms_bucket_matches_python_reference(spark):
    df = spark.createDataFrame([("probe",)], "item string")
    sketch = SK.cms_sketch(df, F.col("item"), d=3, w=128)
    got = {(r["seed"], r["bucket"]) for r in sketch.collect()}
    expected = set()
    for s in range(3):
        hv = int(hashlib.md5(f"{s}:probe".encode()).hexdigest()[:15], 16)
        expected.add((s, hv % 128))
    assert got == expected


def test_null_items_excluded_from_all_sketches(spark):
    """NULL items are not countable: they must not occupy a bottom-k
    slot (Spark's NULLS-FIRST window order would rank them #1), an HLL
    bucket, or a CMS cell."""
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None)], "g string, item string"
    )
    kmv = SK.kmv_sketch(df, F.col("item"), ["g"], k=8)
    assert kmv.filter(F.col("hv").isNull()).count() == 0
    assert SK.kmv_estimate(kmv, ["g"], k=8).first()["kmv_est"] == 2
    regs = SK.hll_registers(df, F.col("item"), ["g"], p=9)
    assert regs.filter(F.col("bucket").isNull()).count() == 0
    assert regs.count() == 2
    cms = SK.cms_sketch(df, F.col("item"), d=2, w=32)
    assert cms.filter(F.col("bucket").isNull()).count() == 0
    assert cms.agg(F.sum("total")).first()[0] == 4  # 2 items x 2 seeds


def test_hll_works_for_non_default_precision(spark):
    """p != 9 must not corrupt the estimate: the contribution exponent
    derives from p (a hardcoded 52 made shiftleft(1, 52-rho) negative
    for p=8, which Java masks to 1<<63). Also pins the p bounds."""
    import pytest as _pytest

    for p in (6, 8, 11):
        n = 6000
        df = _items_df(spark, n)
        regs = SK.hll_registers(df, F.col("item"), ["g"], p=p)
        est = SK.hll_estimate(regs, ["g"], p=p).first()["hll_est"]
        sigma = 1.04 / (1 << p) ** 0.5
        assert abs(est - n) / n < 4 * sigma, f"p={p}: {est} vs {n}"
    with _pytest.raises(ValueError):
        SK.hll_registers(_items_df(spark, 5), F.col("item"), ["g"], p=3)
    with _pytest.raises(ValueError):
        SK.hll_estimate(
            SK.hll_registers(_items_df(spark, 5), F.col("item"), ["g"], p=9),
            ["g"], p=17,
        )


# --------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------
def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.createDataFrame(
        [(f"in-{i}",) for i in range(300)], "item string"
    )
    outsiders = spark.createDataFrame(
        [(f"out-{i}",) for i in range(1000)], "item string"
    )
    m, k = 24 * 300, 3
    bloom = SK.bloom_build(members, F.col("item"), m_bits=m, k_hashes=k)
    member_hits = SK.bloom_probe(bloom, members, "item", m_bits=m, k_hashes=k)
    # the Bloom guarantee: EVERY member probes positive
    assert member_hits.filter(~F.col("bloom_hit")).count() == 0
    out_hits = SK.bloom_probe(bloom, outsiders, "item", m_bits=m, k_hashes=k)
    fp = out_hits.filter(F.col("bloom_hit")).count()
    # ~0.2% expected at m=24n, k=3; allow generous slack
    assert fp <= 20, f"false-positive rate blew up: {fp}/1000"


def test_bloom_merge_property(spark):
    a = spark.createDataFrame([(f"a-{i}",) for i in range(100)], "item string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(100)], "item string")
    m, k = 4096, 3
    whole = SK.bloom_build(a.union(b), F.col("item"), m_bits=m, k_hashes=k)
    merged = (
        SK.bloom_build(a, F.col("item"), m_bits=m, k_hashes=k)
        .union(SK.bloom_build(b, F.col("item"), m_bits=m, k_hashes=k))
        .distinct()
    )
    assert {r["bit"] for r in whole.collect()} == {
        r["bit"] for r in merged.collect()
    }

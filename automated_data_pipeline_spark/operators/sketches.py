"""Mergeable cardinality/frequency sketches: KMV (bottom-k) distinct,
HyperLogLog distinct, and Count-Min frequency — the fixed-memory
answers to COUNT(DISTINCT) and heavy-hitter questions at 100 TB, where
an exact distinct forces a full shuffle of every key and a per-key
count table can itself be too big to materialize.

All three are DETERMINISTIC and engine-portable by construction — they
hash with ``functions.text.stable_hash64`` (md5-prefix, identical in
DuckDB SQL), and every estimate derives from EXACT INTEGER state
(k-th smallest hash, per-bucket max leading-zero runs as 2^(52-rho)
integer contributions, integer bucket counts) with one final double
expression evaluated in the same operation order on both engines. So
unlike ``approx_count_distinct``, the suite can hash-compare the
estimates against a DuckDB oracle bit-for-bit.

Mergeability (the property that makes sketches work on a cluster —
partial sketches combine associatively, so executors build local
sketches and one small reduce merges them):
- KMV:  bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))
- HLL:  registers merge by per-bucket MAX
- CMS:  tables merge by per-cell SUM
Each property is pytest-asserted (tests/test_sketches.py) by sketching
two disjoint halves and merging.

Scale notes: every builder is a single groupBy with map-side partials
over hashed items; sketch state is O(k), O(2^p), or O(d*w) rows —
kilobytes — so estimate joins always broadcast. The only per-group
ordering (KMV's bottom-k) runs AFTER a distinct-hash reduction, over
at most |distinct| rows per group, and is bounded to the window's
top-k rows.

These extend the reference's surface (an ETL orchestrator with no
approximate-query layer — SURVEY.md §2.7); the algorithms are the
published KMV (Bar-Yossef et al. 2002), HyperLogLog (Flajolet et al.
2007), and Count-Min (Cormode & Muthukrishnan 2005) constructions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash64

HASH_SPACE = float(1 << 60)  # stable_hash64 is uniform on [0, 2^60)


# --------------------------------------------------------------------
# KMV (k minimum values) distinct-count sketch
# --------------------------------------------------------------------
def kmv_sketch(
    df: DataFrame, item_col, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Bottom-k distinct item hashes per group: (group_cols..., hv).

    One distinct-reduction shuffle on (group, hash) with map-side
    partials, then a per-group rank window over the already-distinct
    hashes (bounded output: k rows per group). Merge two sketches by
    unioning and re-applying the same bottom-k."""
    # NULL items are excluded (not countable): a NULL hash would
    # corrupt the bottom-k — Spark windows sort NULLS FIRST while
    # DuckDB sorts them last, so the engines would even disagree
    hashed = (
        df.filter(item_col.isNotNull())
        .select(*group_cols, stable_hash64(item_col).alias("hv"))
        .distinct()
    )
    if not group_cols:
        # Global (ungrouped) sketch: a window partitioned by nothing
        # would be an Exchange SinglePartition over ALL distinct hashes;
        # orderBy().limit(k) instead compiles to TakeOrderedAndProject —
        # per-partition top-k heaps merged on the driver, k rows total.
        return hashed.orderBy(F.asc("hv")).limit(k)
    w = Window.partitionBy(*group_cols).orderBy(F.asc("hv"))
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate from a bottom-k sketch: when the group
    holds fewer than k distinct hashes the count is exact; otherwise
    the classic (k-1)/u_k estimator with u_k = kth_hash / 2^60.

    Output: group_cols..., n_seen, kth_hash, kmv_est (all integers;
    the single division is identical IEEE double math on any engine)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("hv").alias("kth_hash")
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen")).otherwise(
        F.floor(
            F.lit(float(k - 1))
            / (F.col("kth_hash").cast("double") / F.lit(HASH_SPACE))
            + F.lit(0.5)
        )
    )
    return agg.select(
        *group_cols,
        F.col("n_seen").cast("bigint").alias("n_seen"),
        "kth_hash",
        est.cast("bigint").alias("kmv_est"),
    )


# --------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# --------------------------------------------------------------------
def hll_registers(
    df: DataFrame, item_col, group_cols: list[str], p: int = 9
) -> DataFrame:
    """HLL register table: (group_cols..., bucket, rho) with rho the
    MAX leading-zero run (+1) of the low (60-p) hash bits among items
    routed to the bucket by the high p bits.

    One groupBy with map-side MAX partials; at most 2^p rows per group.
    Merging two register tables = union + groupBy MAX (associative).
    The bit-length comes from length(bin(x)) — integer-exact and
    spelled identically in the DuckDB oracle."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll precision p must be in [4, 16], got {p}")
    low_bits = 60 - p
    mask = (1 << low_bits) - 1
    hashed = df.filter(item_col.isNotNull()).select(
        *group_cols, stable_hash64(item_col).alias("hv")
    )
    bucket = F.expr(f"shiftright(hv, {low_bits})")
    rem = F.expr(f"hv & {mask}")
    rho = F.when(
        rem > 0, F.lit(low_bits) - F.length(F.bin(rem)) + 1
    ).otherwise(F.lit(low_bits + 1))
    return (
        hashed.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 9
) -> DataFrame:
    """HLL estimate from a register table, cross-engine exact:

    The harmonic-mean denominator sum_j 2^(-M_j) is computed as an
    EXACT INTEGER sum of 2^(52 - rho) contributions (absent buckets
    contribute 2^52), so float summation order can never differ between
    engines; the raw estimate is then ONE double expression. The
    small-range branch (E <= 2.5m with empty buckets) uses linear
    counting m*ln(m/zeros).

    Output: group_cols..., n_buckets (bigint), hll_est (bigint,
    rounded via floor(x+0.5))."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll precision p must be in [4, 16], got {p}")
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # exponent base = max rho = (60 - p) + 1, so the contribution
    # shift is always >= 0 (a hardcoded 52 breaks for p != 9: Java
    # masks shiftleft by a NEGATIVE count to 1<<63 and silently
    # corrupts the sum). For p=9 this IS 52, matching the oracle SQL.
    exp = 61 - p
    two_e = 1 << exp
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {exp} - rho)")).alias(
            "present_sum"
        ),
    )
    sum_int = F.col("present_sum") + (F.lit(m) - F.col("n_buckets")) * F.lit(
        two_e
    )
    raw = (
        F.lit(alpha * m * m)
        / (sum_int.cast("double") / F.lit(float(two_e)))
    )
    zeros = F.lit(m) - F.col("n_buckets")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_buckets").cast("bigint").alias("n_buckets"),
        F.floor(est + F.lit(0.5)).cast("bigint").alias("hll_est"),
    )


# --------------------------------------------------------------------
# Count-Min frequency sketch
# --------------------------------------------------------------------
def cms_sketch(
    df: DataFrame,
    item_col,
    d: int = 3,
    w: int = 128,
    weight_col=None,
) -> DataFrame:
    """Count-Min table: (seed, bucket, total) — d hash rows of w
    buckets; each item occurrence adds its weight (default 1) to one
    bucket per row. d*w rows total (kilobytes — always broadcastable).
    Merging two sketches = union + groupBy SUM."""
    weight = F.lit(1) if weight_col is None else F.col(weight_col)
    base = df.filter(item_col.isNotNull()).select(
        item_col.alias("_item"), weight.alias("_w")
    )
    rows = base.select(
        F.explode(F.array(*[F.lit(s) for s in range(d)])).alias("seed"),
        "_item",
        "_w",
    )
    bucket = F.expr(f"hv % {w}")
    return (
        rows.withColumn(
            "hv", stable_hash64(F.concat(F.col("seed"), F.lit(":"), F.col("_item")))
        )
        .select("seed", bucket.alias("bucket"), "_w")
        .groupBy("seed", "bucket")
        .agg(F.sum("_w").cast("bigint").alias("total"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, d: int = 3, w: int = 128
) -> DataFrame:
    """Point-frequency estimates for ``items[item_col]``: min over the
    d rows of the bucket totals (the CMS upper-bound estimator; always
    >= the true count). The sketch side is d*w rows and is explicitly
    broadcast into the join."""
    probes = items.select(item_col).distinct()
    probe_rows = probes.select(
        item_col,
        F.explode(F.array(*[F.lit(s) for s in range(d)])).alias("seed"),
    )
    probe_rows = probe_rows.withColumn(
        "hv",
        stable_hash64(F.concat(F.col("seed"), F.lit(":"), F.col(item_col))),
    ).withColumn("bucket", F.expr(f"hv % {w}"))
    joined = probe_rows.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("total"), F.lit(0)))
        .cast("bigint")
        .alias("cms_est")
    )


# --------------------------------------------------------------------
# Bloom filter (membership sketch)
# --------------------------------------------------------------------
def bloom_build(
    df: DataFrame, item_col, m_bits: int = 1 << 16, k_hashes: int = 4
) -> DataFrame:
    """Deterministic Bloom filter over ``item_col``: the set of SET BIT
    positions, one row per distinct position (at most min(m_bits,
    k * |items|) rows — kilobytes for any practical m). Bit j for item
    x under hash i is stable_hash64(f"{i}:{x}") % m_bits, so the DuckDB
    oracle reproduces the filter bit-for-bit.

    This sparse representation IS the mergeable form: union two
    filters' rows + distinct == the filter of the unioned sets
    (pytest-asserted). The builder is one explode + distinct with
    map-side partials; the result always broadcasts."""
    base = df.filter(item_col.isNotNull()).select(item_col.alias("_item"))
    rows = base.select(
        F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias(
            "seed"
        ),
        "_item",
    )
    bit = stable_hash64(
        F.concat(F.col("seed"), F.lit(":"), F.col("_item"))
    ) % m_bits
    return rows.select(bit.alias("bit")).distinct()


def bloom_probe(
    bloom: DataFrame,
    items: DataFrame,
    item_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership probe: an item 'might be in the set' iff ALL k of
    its bit positions are set (the Bloom guarantee: no false
    negatives; false positives at the classic (1-e^-kn/m)^k rate).
    Output: items' distinct ``item_col`` + ``bloom_hit`` boolean. The
    filter side is broadcast — it is the sketch's whole point that it
    fits anywhere."""
    probes = items.select(item_col).distinct()
    rows = probes.select(
        item_col,
        F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias(
            "seed"
        ),
    )
    bit = stable_hash64(
        F.concat(F.col("seed"), F.lit(":"), F.col(item_col))
    ) % m_bits
    rows = rows.select(item_col, bit.alias("bit"))
    # per-bit membership via a LEFT join against the broadcast bits
    # (distinct, so 0-or-1 match per row), folded by ONE aggregation:
    # hit iff every one of the k rows matched. The former shape
    # (semi-join + two groupBys + an item-level join) shuffled the
    # probe table a second time through an un-hinted join that fell
    # back to SortMergeJoin past the auto-broadcast threshold —
    # caught by the 1M-source fan-out demo (scale_validation).
    marked = rows.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(item_col).agg(
        (F.count(F.lit(1)) == F.count("_set")).alias("bloom_hit")
    )

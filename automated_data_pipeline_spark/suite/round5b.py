"""Round-5 (second wave) additions: the approximate-query layer
(deterministic, oracle-exact KMV / HyperLogLog / Count-Min sketches —
operators/sketches.py), substring-level duplicate-span detection
(operators/spans.py), and typo-tolerant entity matching
(operators/linkage.py).

None of these exist in the reference (an ETL orchestrator); they are
charter extensions. Every query follows the suite's cross-engine
determinism conventions (suite/__init__.py docstring): md5-derived
``stable_hash64`` replayed verbatim in the oracle SQL, exact-integer
sketch state with one final double expression in identical op order,
portable floor(x*10^n + 0.5) rounding, integer outputs cast to BIGINT
on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.stats import portable_round
from ..operators import sketches as SK
from ..operators.linkage import hamming1_pairs
from ..operators.sampling import forward_chain_folds
from ..operators.spans import duplicated_spans
from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name, oracle, doc=""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


# engine-portable stable_hash64 twin (functions/text.py:56)
def _hash_sql(payload: str) -> str:
    return f"CAST(concat('0x', substr(md5({payload}), 1, 15)) AS BIGINT)"


_WORDS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"

# the distinct-count item: one row per (user, calendar day) — the
# "daily active user" unit both sketch queries estimate
_ITEM_SQL = "CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)"

KMV_K = 64
HLL_P = 9
_HLL_M = 1 << HLL_P
_HLL_LOW = 60 - HLL_P
_HLL_MASK = (1 << _HLL_LOW) - 1
_TWO52 = 1 << 52
# computed once in Python so Spark's lit() and the oracle's inlined
# literal are the SAME double
_HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M
CMS_D = 3
CMS_W = 128
SPAN_K = 8


def _item_col():
    return F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.to_date("ts").cast("string"),
    )


# --------------------------------------------------------------------
@spec(
    "kmv_distinct_user_days",
    f"""
    WITH items AS (
      SELECT DISTINCT event_type, {_hash_sql(_ITEM_SQL)} AS hv FROM events
    ),
    ranked AS (
      SELECT event_type, hv,
        row_number() OVER (PARTITION BY event_type ORDER BY hv ASC) AS rn
      FROM items
    ),
    bottomk AS (
      SELECT event_type, count(*) AS n_seen, max(hv) AS kth_hash
      FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, count(*) AS exact_distinct FROM items
      GROUP BY event_type
    ),
    est AS (
      SELECT b.event_type, b.n_seen, e.exact_distinct,
        CASE WHEN b.n_seen < {KMV_K} THEN b.n_seen
             ELSE CAST(floor({float(KMV_K - 1)} /
                  (CAST(b.kth_hash AS DOUBLE) / {SK.HASH_SPACE}) + 0.5)
                  AS BIGINT)
        END AS kmv_est
      FROM bottomk b JOIN exact e USING (event_type)
    )
    SELECT event_type, CAST(exact_distinct AS BIGINT) AS exact_distinct,
      CAST(kmv_est AS BIGINT) AS kmv_est,
      floor(CAST(abs(kmv_est - exact_distinct) AS DOUBLE) / exact_distinct
            * 10000 + 0.5) / 10000 AS rel_err
    FROM est
    """,
    "KMV (bottom-k) distinct sketch, k=64: estimated distinct "
    "user-days per event type vs the exact count, with the relative "
    "error. The 100 TB story: COUNT(DISTINCT) needs a full shuffle of "
    "every key; the bottom-k sketch is mergeable O(k) state per group "
    "(partial bottom-ks combine associatively — pytest-asserted), and "
    "the estimate derives from ONE integer (the k-th smallest md5 "
    "hash), so the DuckDB oracle reproduces it bit-for-bit — unlike "
    "approx_count_distinct, whose HLL++ internals are engine-private. "
    "Plan: distinct-reduce on (type, hash) with map-side partials, "
    "then a rank window over at most |distinct| rows per group",
)
def kmv_distinct_user_days(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    items = e.select(
        "event_type", SK.stable_hash64(_item_col()).alias("hv")
    ).distinct()
    sk = SK.kmv_sketch(
        e.select("event_type", _item_col().alias("item")),
        F.col("item"),
        ["event_type"],
        k=KMV_K,
    )
    est = SK.kmv_estimate(sk, ["event_type"], k=KMV_K)
    exact = items.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    joined = est.join(exact, "event_type")
    return joined.select(
        "event_type",
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        "kmv_est",
        portable_round(
            F.abs(F.col("kmv_est") - F.col("exact_distinct")).cast("double")
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


# --------------------------------------------------------------------
@spec(
    "hll_distinct_user_days",
    f"""
    WITH h AS (
      SELECT event_type, {_hash_sql(_ITEM_SQL)} AS hv FROM events
    ),
    reg AS (
      SELECT event_type, hv >> {_HLL_LOW} AS bucket,
        max(CASE WHEN (hv & {_HLL_MASK}) > 0
            THEN {_HLL_LOW} - length(bin(hv & {_HLL_MASK})) + 1
            ELSE {_HLL_LOW + 1} END) AS rho
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type, count(*) AS n_buckets,
        sum((CAST(1 AS BIGINT) << (52 - rho))) AS present_sum
      FROM reg GROUP BY 1
    ),
    raw AS (
      SELECT event_type, n_buckets,
        {_HLL_ALPHA_M2!r} /
          (CAST(present_sum + ({_HLL_M} - n_buckets) * {_TWO52} AS DOUBLE)
           / {float(_TWO52)}) AS raw_est,
        {_HLL_M} - n_buckets AS zeros
      FROM agg
    ),
    est AS (
      SELECT event_type, n_buckets,
        CAST(floor(CASE WHEN raw_est <= {2.5 * _HLL_M} AND zeros > 0
             THEN {float(_HLL_M)} * ln({float(_HLL_M)} / CAST(zeros AS DOUBLE))
             ELSE raw_est END + 0.5) AS BIGINT) AS hll_est
      FROM raw
    ),
    exact AS (
      SELECT event_type, count(DISTINCT hv) AS exact_distinct FROM h
      GROUP BY event_type
    )
    SELECT e.event_type, CAST(n_buckets AS BIGINT) AS n_buckets,
      CAST(hll_est AS BIGINT) AS hll_est,
      CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
      floor(CAST(abs(hll_est - x.exact_distinct) AS DOUBLE)
            / x.exact_distinct * 10000 + 0.5) / 10000 AS rel_err
    FROM est e JOIN exact x USING (event_type)
    """,
    "HyperLogLog distinct sketch, p=9 (512 registers): estimated "
    "distinct user-days per event type. Cross-engine exact by "
    "construction: registers are integer max-of-leading-zero-runs "
    "(via length(bin(x)) — the same primitive in both engines), the "
    "harmonic-mean denominator is an EXACT INTEGER sum of 2^(52-rho) "
    "contributions (so float summation ORDER cannot differ), and the "
    "raw-vs-linear-counting branch is one shared double expression. "
    "Plan: one groupBy (type, bucket) with map-side MAX partials — "
    "512 rows per group of mergeable state (union + MAX, "
    "pytest-asserted), the textbook 100 TB distinct-count design",
)
def hll_distinct_user_days(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    hashed = e.select(
        "event_type", SK.stable_hash64(_item_col()).alias("hv")
    )
    regs = SK.hll_registers(
        e.select("event_type", _item_col().alias("item")),
        F.col("item"),
        ["event_type"],
        p=HLL_P,
    )
    est = SK.hll_estimate(regs, ["event_type"], p=HLL_P)
    exact = hashed.groupBy("event_type").agg(
        F.countDistinct("hv").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_buckets",
        "hll_est",
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        portable_round(
            F.abs(F.col("hll_est") - F.col("exact_distinct")).cast("double")
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


# --------------------------------------------------------------------
@spec(
    "cms_heavy_users",
    f"""
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
    seeds AS (SELECT unnest(range({CMS_D})) AS seed),
    cell AS (
      SELECT s.seed,
        {_hash_sql("CAST(s.seed AS VARCHAR) || ':' || ev.item")} % {CMS_W}
          AS bucket,
        count(*) AS total
      FROM ev, seeds s GROUP BY 1, 2
    ),
    truec AS (SELECT item, count(*) AS true_count FROM ev GROUP BY 1),
    probe AS (
      SELECT t.item, s.seed,
        {_hash_sql("CAST(s.seed AS VARCHAR) || ':' || t.item")} % {CMS_W}
          AS bucket
      FROM truec t, seeds s
    ),
    est AS (
      SELECT p.item, min(c.total) AS cms_est
      FROM probe p JOIN cell c USING (seed, bucket) GROUP BY 1
    ),
    ranked AS (
      SELECT CAST(t.item AS BIGINT) AS user_id,
        CAST(t.true_count AS BIGINT) AS true_count,
        CAST(e.cms_est AS BIGINT) AS cms_est,
        CAST(e.cms_est - t.true_count AS BIGINT) AS overcount,
        row_number() OVER (
          ORDER BY e.cms_est DESC, CAST(t.item AS BIGINT) ASC
        ) AS rnk
      FROM truec t JOIN est e USING (item)
    )
    SELECT * FROM ranked WHERE rnk <= 10
    """,
    "Count-Min frequency sketch, d=3 x w=128: top-10 users by "
    "ESTIMATED event count, with the true count and the (always >= 0) "
    "collision overcount alongside — the fixed-memory heavy-hitter "
    "design for streams whose key space dwarfs memory. All state is "
    "integer (bucket sums, min-of-3), so the oracle replays it "
    "exactly. Plan: the sketch is one groupBy over d x w = 384 cells "
    "(mergeable by cell-wise SUM — pytest-asserted) and is BROADCAST "
    "into the probe join; the rank window runs over the probe set, "
    "never the raw stream",
)
def cms_heavy_users(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    items = e.select(F.col("user_id").cast("string").alias("item"))
    sketch = SK.cms_sketch(items, F.col("item"), d=CMS_D, w=CMS_W)
    true_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    est = SK.cms_estimate(sketch, true_counts, "item", d=CMS_D, w=CMS_W)
    joined = true_counts.join(est, "item").select(
        F.col("item").cast("bigint").alias("user_id"),
        F.col("true_count").cast("bigint").alias("true_count"),
        "cms_est",
        (F.col("cms_est") - F.col("true_count"))
        .cast("bigint")
        .alias("overcount"),
    )
    w = Window.orderBy(F.desc("cms_est"), F.asc("user_id"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
    )


# --------------------------------------------------------------------
@spec(
    "dup_span_detect",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
        {_hash_sql(f"list_aggregate(ws[i:i+{SPAN_K - 1}], 'string_agg', ' ')")}
          AS ghash
      FROM w, unnest(range(1, len(ws) - {SPAN_K} + 2)) t(i)
      WHERE len(ws) >= {SPAN_K}
    ),
    dup AS (SELECT ghash FROM sh GROUP BY ghash HAVING count(*) >= 2),
    seeds AS (
      SELECT sh.doc_id, sh.pos, sh.pos + {SPAN_K - 1} AS end_pos
      FROM sh JOIN dup USING (ghash)
    ),
    flagged AS (
      SELECT doc_id, pos, end_pos,
        CASE WHEN pos > coalesce(max(end_pos) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             -1000000000) + 1
        THEN 1 ELSE 0 END AS new_span
      FROM seeds
    ),
    isl AS (
      SELECT doc_id, pos, end_pos,
        sum(new_span) OVER (
          PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING
        ) AS island
      FROM flagged
    )
    SELECT doc_id,
      CAST(min(pos) AS BIGINT) AS span_start,
      CAST(max(end_pos) AS BIGINT) AS span_end,
      CAST(max(end_pos) - min(pos) + 1 AS BIGINT) AS span_tokens,
      CAST(count(*) AS BIGINT) AS n_seeds
    FROM isl GROUP BY doc_id, island
    """,
    f"substring-level dedup (Lee et al. 2022, suffix array replaced "
    f"by a distributed hash-join): the maximal token spans of each "
    f"document whose every token lies inside a {SPAN_K}-gram that "
    f"occurs >= 2 times in the corpus — the boilerplate/templated-"
    f"sentence signal document-level near-dup cannot see. Plan "
    f"(operators/spans.py): shingle explode -> one groupBy count on "
    f"the shingle hash (map-side partials, HAVING-filtered to the "
    f"duplicated minority BEFORE the join-back) -> per-doc "
    f"gaps-and-islands windows, partitioned by doc_id — "
    f"embarrassingly parallel, no global sort",
)
def dup_span_detect(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return duplicated_spans(d, "text", "doc_id", k=SPAN_K)


# --------------------------------------------------------------------
_SUPP_NAME_LEN = 18  # 'Supplier#' + 9 digits (fixture format)


@spec(
    "fuzzy_supplier_match",
    f"""
    WITH s AS (
      SELECT s_suppkey, s_name FROM supplier
      WHERE length(s_name) = {_SUPP_NAME_LEN}
    ),
    v AS (
      SELECT s_suppkey, s_name, i AS mpos,
        substr(s_name, 1, i - 1) || '§' || substr(s_name, i + 1) AS mkey
      FROM s, unnest(range(1, {_SUPP_NAME_LEN + 1})) t(i)
    ),
    cand AS (
      SELECT DISTINCT a.s_suppkey AS s1_suppkey, b.s_suppkey AS s2_suppkey,
        a.s_name AS s1_name, b.s_name AS s2_name
      FROM v a JOIN v b
        ON a.mpos = b.mpos AND a.mkey = b.mkey
        AND a.s_suppkey < b.s_suppkey
    )
    SELECT s1_suppkey, s2_suppkey, s1_name, s2_name,
      CAST(levenshtein(s1_name, s2_name) AS INT) AS dist
    FROM cand WHERE levenshtein(s1_name, s2_name) <= 1
    """,
    "typo-tolerant entity matching: supplier pairs whose names differ "
    "in at most one character, via masked-position blocking "
    "(operators/linkage.py — the SymSpell/FastSS symmetric-delete "
    "idea): each 18-char name emits 18 one-position-masked variants; "
    "Hamming<=1 pairs MUST collide on the variant masked at their "
    "differing position, so the (position, masked-key) equi-join "
    "yields exactly the candidate set — no quadratic pass, and no hot "
    "blocks on the shared 'Supplier#' / zero-pad prefix that "
    "half-split pigeonhole blocking would collapse into. levenshtein "
    "(same semantics both engines) verifies candidates",
)
def fuzzy_supplier_match(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    pairs = hamming1_pairs(
        s, "s_name", "s_suppkey", length=_SUPP_NAME_LEN
    )
    return pairs.select(
        F.col("id_1").alias("s1_suppkey"),
        F.col("id_2").alias("s2_suppkey"),
        F.col("key_1").alias("s1_name"),
        F.col("key_2").alias("s2_name"),
        "dist",
    )


# --------------------------------------------------------------------
def _hll_level_sql(key_sql: str, level: str) -> str:
    """DuckDB twin of one rollup level of sketches.hll_estimate over
    the shared `reg` register CTE: re-merge registers under ``key_sql``
    (per-bucket MAX — identity at the finest level, the actual rollup
    at coarser ones), then the estimate expression. One generator so
    the three levels cannot drift apart."""
    return f"""
    SELECT '{level}' AS level, key,
      CAST(n_buckets AS BIGINT) AS n_buckets,
      CAST(floor(CASE WHEN raw_est <= {2.5 * _HLL_M} AND zeros > 0
           THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / CAST(zeros AS DOUBLE))
           ELSE raw_est END + 0.5) AS BIGINT) AS hll_est
    FROM (
      SELECT key, count(*) AS n_buckets,
        {_HLL_ALPHA_M2!r} /
          (CAST(sum((CAST(1 AS BIGINT) << (52 - rho)))
                + ({_HLL_M} - count(*)) * {_TWO52} AS DOUBLE)
           / {float(_TWO52)!r}) AS raw_est,
        {_HLL_M} - count(*) AS zeros
      FROM (
        SELECT {key_sql} AS key, bucket, max(rho) AS rho
        FROM reg GROUP BY 1, 2
      ) GROUP BY key
    )
    """


@spec(
    "hll_rollup_user_days",
    f"""
    WITH h AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        {_hash_sql("CAST(user_id AS VARCHAR)")} AS hv
      FROM events
    ),
    reg AS (
      SELECT event_type, day, hv >> {_HLL_LOW} AS bucket,
        max(CASE WHEN (hv & {_HLL_MASK}) > 0
            THEN {_HLL_LOW} - length(bin(hv & {_HLL_MASK})) + 1
            ELSE {_HLL_LOW + 1} END) AS rho
      FROM h GROUP BY 1, 2, 3
    )
    {_hll_level_sql("event_type || '/' || day", "type_day")}
    UNION ALL
    {_hll_level_sql("event_type", "type")}
    UNION ALL
    {_hll_level_sql("'all'", "all")}
    """,
    "the re-aggregation property that makes sketches the 100 TB rollup "
    "design: the events table is sketched ONCE into per-(type, day) "
    "HLL registers, and the per-type and global distinct-user "
    "estimates derive purely by MERGING those registers (per-bucket "
    "MAX) — no second scan, no distinct re-count; a full "
    "rollup/cube over COUNT(DISTINCT), which is NOT re-aggregable "
    "exactly, becomes kilobytes of mergeable state. Output: one row "
    "per (level, key) with the register count and estimate — the "
    "DuckDB oracle replays every level bit-for-bit",
)
def hll_rollup_user_days(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        F.col("user_id").cast("string").alias("item"),
    )
    # materialize the (≤ groups × 512-row) register frame so the three
    # rollup levels derive from ONE events scan — the whole point of
    # the sketch rollup; localCheckpoint (not persist) per the repo's
    # cache-hygiene contract
    regs = SK.hll_registers(
        base, F.col("item"), ["event_type", "day"], p=HLL_P
    ).localCheckpoint(eager=True)
    by_type = regs.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("rho")
    )
    global_regs = regs.groupBy("bucket").agg(F.max("rho").alias("rho"))
    lvl_td = SK.hll_estimate(regs, ["event_type", "day"], p=HLL_P).select(
        F.lit("type_day").alias("level"),
        F.concat(F.col("event_type"), F.lit("/"), F.col("day")).alias("key"),
        "n_buckets",
        "hll_est",
    )
    lvl_t = SK.hll_estimate(by_type, ["event_type"], p=HLL_P).select(
        F.lit("type").alias("level"),
        F.col("event_type").alias("key"),
        "n_buckets",
        "hll_est",
    )
    lvl_all = SK.hll_estimate(
        global_regs.withColumn("_g", F.lit("all")), ["_g"], p=HLL_P
    ).select(
        F.lit("all").alias("level"),
        F.col("_g").alias("key"),
        "n_buckets",
        "hll_est",
    )
    return lvl_td.unionByName(lvl_t).unionByName(lvl_all)


# --------------------------------------------------------------------
@spec(
    "kmv_overlap_types",
    f"""
    WITH items AS (
      SELECT DISTINCT event_type, {_hash_sql(_ITEM_SQL)} AS hv FROM events
    ),
    sk AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv, row_number() OVER (
          PARTITION BY event_type ORDER BY hv ASC) AS rn
        FROM items
      ) WHERE rn <= {KMV_K}
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM sk) a,
           (SELECT DISTINCT event_type FROM sk) b
      WHERE a.event_type < b.event_type
    ),
    u AS (
      SELECT p.type_a, p.type_b, s.hv,
        max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
        max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY type_a, type_b ORDER BY hv ASC) AS rn
      FROM u
    ),
    agg AS (
      SELECT type_a, type_b, count(*) AS n_seen, max(hv) AS kth_hash,
        sum(in_a * in_b) AS inter_k
      FROM ranked WHERE rn <= {KMV_K} GROUP BY 1, 2
    ),
    est AS (
      SELECT type_a, type_b, n_seen, inter_k,
        CASE WHEN n_seen < {KMV_K} THEN n_seen
             ELSE CAST(floor({float(KMV_K - 1)} /
                  (CAST(kth_hash AS DOUBLE) / {SK.HASH_SPACE}) + 0.5)
                  AS BIGINT)
        END AS est_union
      FROM agg
    ),
    exact_i AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        count(*) AS exact_inter
      FROM items a JOIN items b
        ON a.hv = b.hv AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    sizes AS (SELECT event_type, count(*) AS n FROM items GROUP BY 1)
    SELECT e.type_a, e.type_b,
      CAST(e.est_union AS BIGINT) AS est_union,
      CAST(sa.n + sb.n - coalesce(x.exact_inter, 0) AS BIGINT)
        AS exact_union,
      CAST(floor(CAST(e.inter_k * e.est_union AS DOUBLE) / e.n_seen + 0.5)
        AS BIGINT) AS est_intersection,
      CAST(coalesce(x.exact_inter, 0) AS BIGINT) AS exact_intersection,
      floor(CAST(e.inter_k AS DOUBLE) / e.n_seen * 10000 + 0.5) / 10000
        AS jaccard_est
    FROM est e
    JOIN sizes sa ON sa.event_type = e.type_a
    JOIN sizes sb ON sb.event_type = e.type_b
    LEFT JOIN exact_i x
      ON x.type_a = e.type_a AND x.type_b = e.type_b
    """,
    "sketch SET ALGEBRA (the theta-sketch/KMV estimators of Beyer et "
    "al. 2007): for every pair of event types, the union, "
    "intersection, and Jaccard of their distinct user-day SETS "
    "estimated purely from the two k=64 bottom-k sketches — the "
    "audience-overlap question, answered from kilobytes instead of a "
    "join of two full key sets. Union = bottom-k of the merged "
    "sketches; intersection = (co-membership fraction in the merged "
    "bottom-k) x union estimate; exact columns alongside for the "
    "measured error. All sketch state is integer; the oracle replays "
    "every estimate bit-for-bit. Plan: after the one distinct-reduce "
    "scan, EVERYTHING operates on k-row-per-group sketch frames",
)
def kmv_overlap_types(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    items = e.select(
        "event_type", SK.stable_hash64(_item_col()).alias("hv")
    ).distinct()
    sk = SK.kmv_sketch(
        e.select("event_type", _item_col().alias("item")),
        F.col("item"),
        ["event_type"],
        k=KMV_K,
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    left = pairs.join(
        sk.withColumnRenamed("event_type", "type_a"), "type_a"
    ).select(
        "type_a", "type_b", "hv",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    right = pairs.join(
        sk.withColumnRenamed("event_type", "type_b"), "type_b"
    ).select(
        "type_a", "type_b", "hv",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    union = (
        left.unionByName(right)
        .groupBy("type_a", "type_b", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("type_a", "type_b").orderBy(F.asc("hv"))
    ranked = union.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    agg = ranked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("hv").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_k"),
    )
    est_union = F.when(F.col("n_seen") < KMV_K, F.col("n_seen")).otherwise(
        F.floor(
            F.lit(float(KMV_K - 1))
            / (F.col("kth_hash").cast("double") / F.lit(SK.HASH_SPACE))
            + F.lit(0.5)
        )
    ).cast("bigint")
    est = agg.withColumn("est_union", est_union)
    exact_i = (
        items.select(F.col("event_type").alias("type_a"), "hv")
        .join(items.select(F.col("event_type").alias("type_b"), "hv"), "hv")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    sizes = items.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        est.join(
            sizes.select(F.col("event_type").alias("type_a"),
                         F.col("n").alias("n_a")), "type_a")
        .join(
            sizes.select(F.col("event_type").alias("type_b"),
                         F.col("n").alias("n_b")), "type_b")
        .join(exact_i, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.col("est_union").cast("bigint").alias("est_union"),
            (F.col("n_a") + F.col("n_b")
             - F.coalesce(F.col("exact_inter"), F.lit(0)))
            .cast("bigint")
            .alias("exact_union"),
            F.floor(
                (F.col("inter_k") * F.col("est_union")).cast("double")
                / F.col("n_seen")
                + F.lit(0.5)
            ).cast("bigint").alias("est_intersection"),
            F.coalesce(F.col("exact_inter"), F.lit(0))
            .cast("bigint")
            .alias("exact_intersection"),
            portable_round(
                F.col("inter_k").cast("double") / F.col("n_seen"), 4
            ).alias("jaccard_est"),
        )
    )


# --------------------------------------------------------------------
CV_FOLDS = 4  # forward-chaining folds; 5 equal-duration slices


@spec(
    "temporal_cv_folds",
    f"""
    WITH b AS (
      SELECT epoch_us(min(ts)) AS mn,
             epoch_us(max(ts)) - epoch_us(min(ts)) + 1 AS span
      FROM events
    ),
    sliced AS (
      SELECT CAST(((epoch_us(e.ts) - b.mn) * {CV_FOLDS + 1}) // b.span
             AS BIGINT) AS slice
      FROM events e, b
    ),
    per_slice AS (
      SELECT slice, count(*) AS n FROM sliced GROUP BY slice
    ),
    folds AS (SELECT unnest(range(1, {CV_FOLDS + 1})) AS fold),
    -- n_train sums slices strictly BEFORE the fold (NOT a cumulative
    -- column carried on the test-slice row: a fold whose own slice is
    -- empty must still report its full training count)
    train AS (
      SELECT f.fold, coalesce(sum(p.n), 0) AS n_train
      FROM folds f LEFT JOIN per_slice p ON p.slice < f.fold
      GROUP BY f.fold
    ),
    test AS (
      SELECT f.fold, coalesce(sum(p.n), 0) AS n_test
      FROM folds f LEFT JOIN per_slice p ON p.slice = f.fold
      GROUP BY f.fold
    )
    SELECT f.fold,
      CAST(t.n_train AS BIGINT) AS n_train,
      CAST(x.n_test AS BIGINT) AS n_test,
      CAST(b.mn + (b.span * f.fold) // {CV_FOLDS + 1} AS BIGINT)
        AS train_end_us,
      CAST(b.mn + (b.span * (f.fold + 1)) // {CV_FOLDS + 1} AS BIGINT)
        AS test_end_us
    FROM folds f
    CROSS JOIN b
    JOIN train t ON t.fold = f.fold
    JOIN test x ON x.fold = f.fold
    """,
    "forward-chaining temporal cross-validation: the event range is "
    "cut into 5 equal-DURATION slices; fold i trains on everything "
    "before slice i and tests on slice i — the split that never leaks "
    "the future into training, which a random split always does for "
    "time-series. Cross-engine exact by construction: slice "
    "assignment is pure int64 arithmetic on epoch microseconds "
    "(((us - mn) * 5) integer-div span — no float percentile "
    "interpolation, whose ulp-at-1e15 differences could flip "
    "boundary events between engines). Plan: one scan -> 5-row slice "
    "agg with map-side partials; the fold table derives from those 5 "
    "rows",
)
def temporal_cv_folds(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return forward_chain_folds(e, "ts", n_folds=CV_FOLDS)


# --------------------------------------------------------------------
# m sizes WITH the holdout (m = 24*n, k = 3 -> ~0.2% gram FP rate at
# any scale): a fixed m either saturates (flags every doc) or goes
# silent as the corpus grows. 24n is an exact integer both engines
# derive from the same count, so the oracle's filter stays
# bit-identical.
BLOOM_M_PER_ITEM = 24
BLOOM_K = 3
_GRAM_SQL = (
    "CAST(concat('0x', substr(md5("
    "list_aggregate(ws[i:i+2], 'string_agg', ' ')"
    "), 1, 15)) AS BIGINT)"
)


@spec(
    "bloom_decontaminate",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    g AS (
      SELECT DISTINCT doc_id, {_GRAM_SQL} AS gram
      FROM w, unnest(range(1, len(ws) - 1)) t(i)
      WHERE len(ws) >= 3
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
    mb AS (SELECT {BLOOM_M_PER_ITEM} * count(*) AS m FROM bench),
    seeds AS (SELECT unnest(range({BLOOM_K})) AS seed),
    bloom AS (
      SELECT DISTINCT
        {_hash_sql("CAST(s.seed AS VARCHAR) || ':' || CAST(b.gram AS VARCHAR)")}
          % (SELECT m FROM mb) AS bit
      FROM bench b, seeds s
    ),
    probe AS (
      SELECT u.gram, s.seed,
        {_hash_sql("CAST(s.seed AS VARCHAR) || ':' || CAST(u.gram AS VARCHAR)")}
          % (SELECT m FROM mb) AS bit
      FROM (SELECT DISTINCT gram FROM g) u, seeds s
    ),
    hitgram AS (
      SELECT gram FROM probe p
      WHERE EXISTS (SELECT 1 FROM bloom bl WHERE bl.bit = p.bit)
      GROUP BY gram HAVING count(*) = {BLOOM_K}
    ),
    flagged AS (
      SELECT g.doc_id, count(*) AS n_flagged
      FROM g JOIN hitgram USING (gram) GROUP BY 1
    ),
    exact AS (
      SELECT g.doc_id, count(*) AS n_exact
      FROM g JOIN bench USING (gram) GROUP BY 1
    )
    SELECT d.doc_id,
      CAST(coalesce(f.n_flagged, 0) AS BIGINT) AS n_flagged,
      CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
      CAST(coalesce(f.n_flagged, 0) - coalesce(e.n_exact, 0) AS BIGINT)
        AS n_false_pos,
      coalesce(f.n_flagged > 0, FALSE) AS contaminated_bloom
    FROM documents d
    LEFT JOIN flagged f ON f.doc_id = d.doc_id
    LEFT JOIN exact e ON e.doc_id = d.doc_id
    """,
    "Bloom-filter decontamination — the AT-SCALE form of "
    "decontaminate_vs_holdout: the exact broadcast set works while "
    "the holdout fits memory; the Bloom filter's broadcast is m BITS "
    "(m = 24x the holdout gram count -> ~0.2% gram-level FP rate at "
    "every scale), independent of gram string sizes. No false "
    "negatives by construction (the guarantee decontamination needs: "
    "nothing contaminated escapes — n_flagged >= n_exact on every "
    "row); the FP overhead is nonzero and MEASURED per doc against "
    "the exact join. Deterministic md5 bit positions and an "
    "integer-derived m -> the oracle replays the filter bit-for-bit",
)
def bloom_decontaminate(spark, sf_dir):
    from ..operators.spans import shingle_positions

    d = load(spark, sf_dir, "documents")
    g = (
        shingle_positions(d, "text", "doc_id", 3)
        .select("doc_id", F.col("ghash").alias("gram"))
        .distinct()
    )
    bench = g.filter(F.col("doc_id") % 20 == 0).select("gram").distinct()
    # one bounded driver scalar (the holdout gram count) sizes the
    # filter; the oracle derives the same m from the same count
    m_bits = BLOOM_M_PER_ITEM * bench.count()
    bloom = SK.bloom_build(
        bench, F.col("gram").cast("string"), m_bits=m_bits, k_hashes=BLOOM_K
    )
    hits = SK.bloom_probe(
        bloom, g.select("gram"), "gram", m_bits=m_bits, k_hashes=BLOOM_K
    )
    flagged = (
        g.join(hits.filter(F.col("bloom_hit")), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_flagged"))
    )
    exact = (
        g.join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        d.select("doc_id")
        .join(flagged, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_flagged"), F.lit(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.coalesce(F.col("n_exact"), F.lit(0))
            .cast("bigint")
            .alias("n_exact"),
            (
                F.coalesce(F.col("n_flagged"), F.lit(0))
                - F.coalesce(F.col("n_exact"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_false_pos"),
            F.coalesce(F.col("n_flagged") > 0, F.lit(False)).alias(
                "contaminated_bloom"
            ),
        )
    )

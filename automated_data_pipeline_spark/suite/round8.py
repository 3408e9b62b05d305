"""Round-8 curation additions: the domain/URL-level curation axis
(the FineWeb / RefinedWeb pattern — Penedo et al. 2024, "The FineWeb
Datasets"; Penedo et al. 2023, "RefinedWeb"), each Spark-first with a
full-value DuckDB oracle over the documents fixture's ``source``
column.

- blocklist_filter_stats: blocklist-membership filtering through the
  sketch layer — a Bloom prefilter over the (broadcastable-bits)
  blocklist classifies every source, and only Bloom-positive sources
  pay the exact confirm join, so false positives are visible but can
  never drop a clean document. At 100 TB the blocklist is millions of
  URLs: raw strings may not broadcast, but the Bloom BITS always do,
  and the exact join's left side shrinks to the maybe-hits.
- source_quality_quantile_gate: per-source quality gate at the
  published classifier coefficients — every source keeps its top 75%
  of documents by model score (the per-domain quantile discipline
  FineWeb applies globally). RANK-based, not interpolated: a
  quantile_cont threshold on doubles invites last-ulp cross-engine
  drift at the cut; ceil(0.75 * n) in integers is exact in both
  engines, and scores are compared as exact 1e-4 fixed-point BIGINTs.

Determinism: md5-derived ``stable_hash64`` replayed in SQL; scores
quantized to integer 1e-4 units BEFORE ranking/averaging so no double
aggregation is order-dependent; deterministic ORDER BY with doc_id
tie-breaks (suite/__init__.py conventions).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash64
from ..operators import similarity, sketches as SK
from . import QuerySpec, load
from .round7 import _QLR, _TOKS_SQL

SPECS: list[QuerySpec] = []


def spec(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


def _hash_sql(payload: str) -> str:
    """stable_hash64 replayed in DuckDB (suite convention)."""
    return f"CAST(('0x' || substr(md5({payload}), 1, 15)) AS BIGINT)"


# Synthetic-but-deterministic blocklist: sources whose salted hash
# lands in bucket 0 (~1/4 of sources at any scale factor). A real
# deployment feeds an external list; the hash derivation only exists
# so the oracle can rebuild the identical list from the fixture.
_BL_M_BITS = 1 << 10
_BL_K = 4

_BLOCKLIST_SQL = f"""
WITH src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars_total
  FROM documents GROUP BY 1
), bl AS (
  SELECT source FROM src
  WHERE {_hash_sql("'bl:' || source")} % 4 = 0
), seeds AS (
  SELECT unnest(range({_BL_K})) AS seed
), bloom AS (
  SELECT DISTINCT
    {_hash_sql("CAST(s.seed AS VARCHAR) || ':' || b.source")}
      % {_BL_M_BITS} AS bit
  FROM bl b, seeds s
), probe AS (
  SELECT p.source, s.seed,
    {_hash_sql("CAST(s.seed AS VARCHAR) || ':' || p.source")}
      % {_BL_M_BITS} AS bit
  FROM (SELECT source FROM src) p, seeds s
), hit AS (
  SELECT source FROM probe p
  WHERE EXISTS (SELECT 1 FROM bloom bm WHERE bm.bit = p.bit)
  GROUP BY source HAVING count(*) = {_BL_K}
)
SELECT s.source,
       (h.source IS NOT NULL) AS bloom_hit,
       (b.source IS NOT NULL) AS blocked,
       s.n_docs, s.chars_total
FROM src s
LEFT JOIN hit h ON h.source = s.source
LEFT JOIN bl b ON b.source = s.source
ORDER BY s.source
"""


@spec(
    "blocklist_filter_stats",
    _BLOCKLIST_SQL,
    "domain-blocklist filter through the Bloom sketch layer: per-source "
    "bloom verdict + exact confirm + kept/dropped volume",
)
def blocklist_filter_stats(spark, sf_dir):
    """Bloom-prefiltered blocklist classification (FineWeb/RefinedWeb
    URL-blocklist stage re-expressed on the sketch layer).

    Plan shape: one groupBy(source) over the corpus (the only
    corpus-sized shuffle), then all classification happens on the
    DISTINCT source table — bloom_build/bloom_probe explode k
    seeds over it and the confirm join is a broadcast left_semi
    against the blocklist. At 100 TB with a multi-million-URL
    blocklist the bits still broadcast (m_bits rows max) and only
    bloom-positive sources reach the exact join; a Bloom false
    positive shows up as (bloom_hit=true, blocked=false) and costs
    one extra probe row, never a dropped document."""
    d = load(spark, sf_dir, "documents")
    # checkpoint the (tiny) per-source table: blocklist, bloom build,
    # probe, and the final join all derive from it, and Catalyst does
    # not dedupe common subtrees — without the pin each derivation
    # would re-scan the corpus (4 scans at 100 TB instead of 1)
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
    ).localCheckpoint(eager=True)
    bl = per_src.select("source").filter(
        stable_hash64(F.concat(F.lit("bl:"), F.col("source"))) % 4 == 0
    )
    bloom = SK.bloom_build(
        bl, F.col("source").cast("string"), m_bits=_BL_M_BITS,
        k_hashes=_BL_K,
    )
    probed = SK.bloom_probe(
        bloom, per_src.select("source"), "source", m_bits=_BL_M_BITS,
        k_hashes=_BL_K,
    )
    confirmed = (
        probed.filter(F.col("bloom_hit"))
        .join(F.broadcast(bl), "source", "left_semi")
        .select("source", F.lit(True).alias("blocked"))
    )
    return (
        per_src.join(F.broadcast(probed), "source", "left")
        .join(F.broadcast(confirmed), "source", "left")
        .select(
            "source",
            F.coalesce(F.col("bloom_hit"), F.lit(False)).alias("bloom_hit"),
            F.coalesce(F.col("blocked"), F.lit(False)).alias("blocked"),
            "n_docs",
            "chars_total",
        )
        .orderBy("source")
    )


# The logreg score replayed in SQL at the published coefficients —
# the same CTE as round7's _QLR_SQL with source carried through (the
# score formula now exists in TWO SQL copies: here and round7.py;
# change quality_model.featurize and BOTH or the lagging query fails
# its own gate). Scores quantize to 1e-4 BIGINT units immediately:
# ranking, threshold, and average all run on exact integers.
_QUANTILE_GATE_SQL = f"""
WITH w AS (
  SELECT doc_id, source, text, {_TOKS_SQL} AS ws FROM documents
), f AS (
  SELECT doc_id, source,
    ln(1.0 + len(ws)) AS f_logtok,
    coalesce(list_aggregate(list_transform(ws, x -> length(x)), 'sum'), 0)
      * 1.0 / greatest(len(ws), 1) AS f_wlen,
    length(regexp_replace(text, '[\\pL\\pN\\s]', '', 'g')) * 1.0
      / greatest(length(text), 1) AS f_punct,
    len(list_filter(ws, x -> x IN ('the','a','and','of','to','in','is')))
      * 1.0 / greatest(len(ws), 1) AS f_stop,
    len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1) AS f_ttr
  FROM w
), s AS (
  SELECT doc_id, source,
    CAST(floor(
      1.0 / (1.0 + exp(-({_QLR["bias"]} + {_QLR["f_logtok"]} * f_logtok
                         + {_QLR["f_wlen"]} * f_wlen
                         + {_QLR["f_punct"]} * f_punct
                         + {_QLR["f_stop"]} * f_stop
                         + {_QLR["f_ttr"]} * f_ttr)))
      * 10000 + 0.5) AS BIGINT) AS p_i
  FROM f
), ranked AS (
  SELECT source, doc_id, p_i,
         row_number() OVER (PARTITION BY source
                            ORDER BY p_i DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n_total
  FROM s
), kept AS (
  SELECT * FROM ranked WHERE rk <= (3 * n_total + 3) // 4
)
SELECT source,
       CAST(min(n_total) AS BIGINT) AS n_total,
       count(*) AS n_kept,
       CAST(min(p_i) / 10000.0 AS DOUBLE) AS threshold,
       CAST(floor(sum(p_i) * 1.0 / count(*) + 0.5) / 10000.0 AS DOUBLE)
         AS avg_kept
FROM kept
GROUP BY 1
ORDER BY 1
"""


@spec(
    "source_quality_quantile_gate",
    _QUANTILE_GATE_SQL,
    "per-source quality gate at published coefficients: keep each "
    "source's top 75% of documents by model score (rank-based, "
    "integer-exact)",
)
def source_quality_quantile_gate(spark, sf_dir):
    """Per-domain quality-quantile gate (the FineWeb per-source
    discipline) on the model-based quality filter.

    Plan shape: one featurize+score pass (shuffle-free codegen,
    operators/quality_model.py), hash-spread first because the
    fixture arrives as one file and featurize is regex-heavy (the r7
    scale lesson); then ONE shuffle on source feeds both the rank
    window and the count window; the kept set aggregates back on the
    same partitioning. Scores are quantized to integer 1e-4 units
    before the window, so rank order, threshold, and averages are
    engine-exact — no double aggregation is order-dependent."""
    from ..operators import quality_model as QM

    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    coefs = [_QLR[n] for n in QM.FEATURE_NAMES]
    scored = QM.score_quality(docs, "text", _QLR["bias"], coefs).select(
        "source",
        "doc_id",
        F.floor(F.col("quality_p") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("p_i"),
    )
    w_src = Window.partitionBy("source")
    w_rk = w_src.orderBy(F.col("p_i").desc(), F.col("doc_id"))
    kept = (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .withColumn("n_total", F.count(F.lit(1)).over(w_src))
        .filter(F.col("rk") <= F.expr("(3 * n_total + 3) div 4"))
    )
    return (
        kept.groupBy("source")
        .agg(
            F.min("n_total").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            (F.min("p_i") / 10000.0).cast("double").alias("threshold"),
            (
                F.floor(F.sum("p_i") / F.count(F.lit(1)) + F.lit(0.5))
                / 10000.0
            )
            .cast("double")
            .alias("avg_kept"),
        )
        .orderBy("source")
    )


# Scalar-quantization ANN: unlike IVF/PQ (whose k-means training makes
# the default configuration rows-only, verified via exact-mode
# companions), SQ8's approximate stage is deterministic arithmetic —
# the FULL pipeline carries a value oracle: the quantization formula is
# the one embedding_int8_quantize already proved cross-engine, the
# shortlist score is an exact integer sum, and the re-rank reuses the
# _COS_PAIRS rounding convention (round6.py).


def sq8_cte_body(anchors_pred: str, shortlist: int, dim: int = 64) -> str:
    """The SQ8 quantize → integer-dot shortlist → exact-cosine re-rank
    chain as a WITH-body fragment ending at ``ranked`` — the ONE copy
    composed oracles interpolate (``_SQ8_SQL`` below and the round-13
    hybrid-ANN fusion oracle), so the quantization/score expressions
    cannot drift between them. ``anchors_pred`` selects the query
    vectors; ``shortlist`` bounds the approximate stage (k ×
    oversample). ``anchors_pred`` is interpolated — callers pass
    module-literal predicates only (the mmr_oracle_sql validation
    convention applies if this ever takes user input)."""
    r = dim + 1
    return f"""s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           / 127.0 AS scale
  FROM embeddings
), q8 AS (
  SELECT vec_id, embedding,
    CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
         ELSE list_transform(embedding,
                x -> CAST(greatest(-127.0, least(127.0,
                       round(CAST(x AS DOUBLE) / scale, 0))) AS INT))
    END AS qv
  FROM s
), qq AS (
  SELECT vec_id AS qid, embedding AS qe, qv AS qqv FROM q8 WHERE {anchors_pred}
), pairs AS (
  SELECT qq.qid, c.vec_id,
    CAST((SELECT sum(c.qv[i] * qq.qqv[i]) FROM range(1, {r}) t(i))
         AS BIGINT) AS approx_dot
  FROM q8 c CROSS JOIN qq
  WHERE c.vec_id != qq.qid
), short AS (
  SELECT qid, vec_id, approx_dot,
         row_number() OVER (PARTITION BY qid
                            ORDER BY approx_dot DESC, vec_id) AS srk
  FROM pairs
), rr AS (
  SELECT sh.qid, sh.vec_id, sh.approx_dot,
    CASE WHEN (SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) FROM range(1,{r}) t(i)) = 0
           OR (SELECT sum(CAST(qv2.embedding[i] AS DOUBLE) * CAST(qv2.embedding[i] AS DOUBLE)) FROM range(1,{r}) t(i)) = 0
    THEN 0.0 ELSE round(
      (SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(qv2.embedding[i] AS DOUBLE)) FROM range(1,{r}) t(i))
      / (sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) FROM range(1,{r}) t(i)))
       * sqrt((SELECT sum(CAST(qv2.embedding[i] AS DOUBLE) * CAST(qv2.embedding[i] AS DOUBLE)) FROM range(1,{r}) t(i)))), 6)
    END AS cosine
  FROM short sh
  JOIN embeddings e ON e.vec_id = sh.vec_id
  JOIN embeddings qv2 ON qv2.vec_id = sh.qid
  WHERE sh.srk <= {shortlist}
), ranked AS (
  SELECT qid, vec_id, approx_dot, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM rr
)"""


_SQ8_SQL = f"""
WITH {sq8_cte_body("vec_id < 3", 20)}
SELECT qid, vec_id, approx_dot, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY qid, rank
"""


@spec(
    "ann_sq8_rerank",
    _SQ8_SQL,
    "scalar-quantization ANN (FAISS SQ8 pattern): int8 codes, integer "
    "dot-product shortlist, exact cosine re-rank — the one ANN variant "
    "whose APPROXIMATE stage carries a full-value oracle",
)
def ann_sq8_rerank(spark, sf_dir):
    # spread before the per-row quantize pass (nested-HOF CPU; the
    # 1-file fixture scan would otherwise run it on one task — the
    # r7 coarse-scan lesson, BASELINE.md sf1 section)
    e = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    out = similarity.sq8_topk_rerank(e, q, k=5, oversample=4)
    return out.select(
        "qid", "vec_id", "approx_dot", "cosine",
        F.col("rank").cast("long").alias("rank"),
    )

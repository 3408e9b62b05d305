"""Round-6 companion queries: driver-visible VALUE evidence for the
suite's five rows-only operators (VERDICT r5 item 4).

The rows-only queries (ann_ivf_topk, ann_pq_rerank_topk,
ann_ivfpq_topk, bpe_train_merges, approx_aggregates) are approximate or
iterative by construction, so no SQL oracle can replay their default
configuration. But each has an ORACLE-EXPRESSIBLE boundary where the
same machinery provably computes an exact, SQL-replayable answer:

- IVF probed at nprobe == n_clusters routes every query through every
  cluster, so the full pipeline (k-means assignment, probe selection,
  per-cluster scoring, ranking) must reproduce brute-force cosine
  top-k exactly (equivalence proven, not assumed: probing is a
  partition of the corpus, and scoring uses the FULL vectors).
- PQ re-rank with a shortlist >= |corpus| re-scores every candidate
  with exact d2, so ADC shortlisting + re-ranking must reproduce
  brute-force euclidean top-k exactly.
- IVF-PQ with full probe + full shortlist likewise.
- BPE's round-0 pair-count table (the table the trainer ranks to pick
  its first merge) is plain relational algebra over the corpus.
- approx_count_distinct / percentile_approx ride along with their
  EXACT twins: the exact values are cross-engine-verified, and the
  approximation errors are checked Spark-side against fixed
  tolerances emitted as flags the oracle pins TRUE.

Each companion drives the SAME code path as its rows-only sibling
(same operators, same parameters except the exactness knobs — and,
round 7 on, ``max_iter=1`` on the k-means fits: the equivalence proofs
hold for ANY centroids, so the companions don't pay Lloyd rounds the
proof never reads; quantizer QUALITY stays pinned by the siblings'
recall tests), so a
driver-green row here witnesses the machinery itself; approximation
QUALITY at the default knobs stays pinned by tests/test_pq.py,
tests/test_bpe.py, and tests/test_scale_plans.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import bpe, similarity
from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


# The exact-mode companions prove brute-force equivalence; the proof
# does not need the whole corpus (VERDICT r6 item 8 — at sf0.1 the
# full 2000-vector corpus made ann_ivfpq_exact_full the slowest bench
# workload). Cap the corpus at the first 500 vec_ids: at the sf0.01
# correctness gate EVERY row passes the cap (500 embeddings), so gate
# results are unchanged; at sf0.1 the bench cost drops ~4x. The cap
# appears in BOTH the Spark corpus filter and the oracle CTEs.
_EXACT_CAP = 500

# Shared oracle CTEs: brute-force cosine / squared-L2 pair tables for
# the first 3 query vectors (the same query set the rows-only ANN
# queries use). The zero-norm guard mirrors cosine_rounded_safe.
_COS_PAIRS = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
    pairs AS (
      SELECT q.qid, e.vec_id,
        CASE WHEN (SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)) = 0
               OR (SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) FROM range(1,65) t(i)) = 0
        THEN 0.0 ELSE round(
          (SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) FROM range(1,65) t(i))
          / (sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))
           * sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) FROM range(1,65) t(i)))), 6) END AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id != q.qid AND e.vec_id < {_EXACT_CAP}
    )
"""

_D2_PAIRS = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
    pairs AS (
      SELECT q.qid, e.vec_id,
        round((SELECT sum(
            (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
          * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
        ) FROM range(1,65) t(i)), 6) AS d2
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id != q.qid AND e.vec_id < {_EXACT_CAP}
    )
"""

_D2_TOP5 = """
    , ranked AS (
      SELECT qid, vec_id, d2,
             row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rank
      FROM pairs
    )
    SELECT qid, vec_id, d2, rank FROM ranked WHERE rank <= 5
"""


def _queries3(e):
    return e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )


def _exact_corpus(e):
    """The capped corpus the exact companions (and their oracles) run
    over, plus its size — the denominator the exactness knobs must
    cover. One bounded count() over <=_EXACT_CAP rows."""
    corpus = e.filter(F.col("vec_id") < _EXACT_CAP)
    return corpus, corpus.count()


def _exact_oversample(n_corpus: int, k: int) -> int:
    """Shortlist factor that PROVABLY covers the corpus: ceil(n/k).
    Derived, not hardcoded, so a fixture that outgrows a constant can
    never silently turn 'provably exact' into 'approximate' — and
    assert the invariant anyway so a regression fails loudly."""
    oversample = -(-n_corpus // k)  # ceil div
    assert k * oversample >= n_corpus, (oversample, n_corpus, k)
    return oversample


# --------------------------------------------------------------------
@spec(
    "ann_ivf_exact_full_probe",
    _COS_PAIRS
    + """
    , ranked AS (
      SELECT qid, vec_id, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
      FROM pairs
    )
    SELECT qid, vec_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
    "ann_ivf_topk's full pipeline driven at nprobe == n_clusters, where "
    "its answer is provably brute-force cosine top-5 — the oracle-"
    "expressible boundary of the IVF machinery",
)
def ann_ivf_exact_full_probe(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    corpus, _ = _exact_corpus(e)
    # max_iter=1: exactness comes from nprobe == n_clusters (every
    # cluster scored with FULL vectors), not quantizer quality — so
    # the companion spends one Lloyd round, not six, on k-means the
    # proof doesn't need. Same machinery path, cheaper bench line.
    out = similarity.ivf_topk(corpus, _queries3(e), k=5, n_clusters=8, nprobe=8,
                              max_iter=1)
    return out.select(
        "qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------
@spec(
    "ann_pq_exact_rerank",
    _D2_PAIRS + _D2_TOP5,
    "ann_pq_rerank_topk's pipeline (train -> encode -> ADC shortlist -> "
    "exact re-rank) with the shortlist widened past |corpus|, where the "
    "re-rank provably reproduces brute-force euclidean top-5",
)
def ann_pq_exact_rerank(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    corpus, n = _exact_corpus(e)
    # max_iter=1: the full-corpus shortlist reaches the exact re-rank
    # regardless of codebook quality (see ann_ivf_exact_full_probe)
    codebooks, cb_df = similarity.pq_train(
        corpus, dim=64, m=8, n_codes=64, max_iter=1
    )
    # Arrow-batched encode (see ann_pq_rerank_topk — the r8 profiling
    # fix; exactness is unaffected, the shortlist covers the corpus)
    enc = similarity.pq_encode_pandas(corpus, codebooks).localCheckpoint(
        eager=True
    )
    # shortlist k*oversample >= |corpus| (derived + asserted): every
    # candidate reaches the exact re-rank
    out = similarity.pq_topk_rerank(
        enc, cb_df, _queries3(e), k=5, oversample=_exact_oversample(n, 5)
    )
    return out.select(
        "qid", "vec_id", "d2", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------
@spec(
    "ann_ivfpq_exact_full",
    _D2_PAIRS + _D2_TOP5,
    "ann_ivfpq_topk's pipeline (coarse routing, residual PQ, per-probe "
    "ADC LUTs, re-rank) at full probe + full shortlist == brute-force "
    "euclidean top-5",
)
def ann_ivfpq_exact_full(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    corpus, n = _exact_corpus(e)
    # max_iter=1 on both quantizers: full probe + full shortlist make
    # the result brute-force-equal whatever the centroids are
    enc, cent_df, _, cb_df = similarity.ivfpq_index(
        corpus, dim=64, n_clusters=8, m=8, n_codes=16, max_iter=1
    )
    out = similarity.ivfpq_topk(
        enc, cent_df, cb_df, _queries3(e), k=5, nprobe=8,
        oversample=_exact_oversample(n, 5)
    )
    return out.select(
        "qid", "vec_id", "d2", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------
@spec(
    "bpe_top_pairs",
    r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(coalesce(text, '')), '\s+')) AS word
      FROM documents
    ),
    words AS (
      SELECT word, count(*) AS freq FROM toks WHERE word <> '' GROUP BY word
    ),
    idx AS (
      SELECT word, freq, unnest(range(1, length(word) + 1)) AS i FROM words
    ),
    pairs AS (
      SELECT substring(word, i, 1) AS left_sym,
             CASE WHEN i < length(word) THEN substring(word, i + 1, 1)
                  ELSE '</w>' END AS right_sym,
             freq
      FROM idx
    )
    SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_freq
    FROM pairs GROUP BY left_sym, right_sym
    ORDER BY pair_freq DESC, left_sym, right_sym
    LIMIT 10
    """,
    "bpe_train_merges' round-0 pair-count table (top 10): the exact "
    "table the trainer ranks to pick its first merge, replayed "
    "relationally by the oracle",
)
def bpe_top_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        bpe.initial_pair_counts(d, "text")
        .orderBy(F.desc("pair_freq"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(10)
    )


# --------------------------------------------------------------------
@spec(
    "approx_agg_accuracy",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_err_ok,
           TRUE AS median_band_ok
    FROM events GROUP BY event_type
    """,
    "approx_aggregates with its exact twins: exact distinct counts are "
    "value-verified cross-engine; the HLL++ estimate must sit within "
    "2.5x its configured rsd and the approx median inside the exact "
    "[p45, p55] band — flags the oracle pins TRUE",
)
def approx_agg_accuracy(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx_u"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.percentile_approx("value", 0.5, 10000).alias("_approx_med"),
        F.expr("percentile(value, 0.45)").alias("_p45"),
        F.expr("percentile(value, 0.55)").alias("_p55"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx_u") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("users_err_ok"),
        (
            (F.col("_approx_med") >= F.col("_p45"))
            & (F.col("_approx_med") <= F.col("_p55"))
        ).alias("median_band_ok"),
    )

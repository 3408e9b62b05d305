"""Round-7 curation operators: C4-style segment dedup
(operators/spans.py segment_dedup) and DSIR importance weights
(operators/sampling.py dsir_importance) — semantics vs brute-force
Python references, edge behavior, and the plan shapes the 100 TB
docstrings promise."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from automated_data_pipeline_spark.functions.text import stable_hash64_py
from automated_data_pipeline_spark.operators.sampling import dsir_importance
from automated_data_pipeline_spark.operators.spans import segment_dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_segment_keep(texts, seg_words=5):
    """Reference survivor set: {(doc, seg_idx)} kept under the
    min-(doc, seg_idx)-per-distinct-segment rule."""
    first: dict[str, tuple[int, int]] = {}
    occs = []
    for doc, t in enumerate(texts):
        toks = t.split(" ")
        segs = [
            " ".join(toks[i: i + seg_words])
            for i in range(0, len(toks), seg_words)
        ]
        for idx, seg in enumerate(segs):
            occs.append((doc, idx, seg))
            if seg not in first or (doc, idx) < first[seg]:
                first[seg] = (doc, idx)
    return {(d, i): first[s] == (d, i) for d, i, s in occs}


def test_segment_dedup_matches_brute_force(spark):
    texts = [
        "a b c d e a b c d e",        # self-duplicate segment
        "a b c d e x y z w v",        # cross-doc duplicate of doc0's segment
        "p q r s t",                   # unique
        "x y z w v f g",               # duplicate of doc1's 2nd seg + partial tail
    ]
    expected = _brute_segment_keep(texts)
    rows = segment_dedup(_docs(spark, texts), "text", "doc_id").collect()
    got = {(r["doc_id"], r["seg_idx"]): r["keep"] for r in rows}
    assert got == expected
    # sanity on the scenario itself: the shared segment survives only
    # at (0, 0); the partial trailing segment "f g" is unique and kept
    assert got[(0, 0)] and not got[(0, 1)] and not got[(1, 0)]
    assert got[(3, 1)]


def test_segment_dedup_partial_tail_is_its_own_segment(spark):
    # 7 tokens -> one full segment + a 2-token tail; the tail must NOT
    # be folded into the full segment's text
    rows = segment_dedup(
        _docs(spark, ["a b c d e f g"]), "text", "doc_id"
    ).collect()
    assert sorted(r["seg_idx"] for r in rows) == [0, 1]
    assert all(r["keep"] for r in rows)


def test_segment_dedup_reuses_exchange_single_tokenize_pass(spark):
    # the survivor self-join must consume ONE exchange twice (the
    # docstring's single-scan contract), not tokenize the corpus twice
    df = segment_dedup(
        _docs(spark, ["a b c d e"] * 6 + ["u v w x y z"]), "text", "doc_id"
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan


def _brute_dsir(texts, labels, target_label, n_buckets=16):
    bucket = lambda tok: stable_hash64_py(tok) % n_buckets
    n_t = [0] * n_buckets
    n_r = [0] * n_buckets
    for t, lab in zip(texts, labels):
        for tok in t.lower().split():
            b = bucket(tok)
            n_r[b] += 1
            if lab == target_label:
                n_t[b] += 1
    tot_t, tot_r = sum(n_t), sum(n_r)
    out = {}
    for doc, (t, lab) in enumerate(zip(texts, labels)):
        w = 0.0
        for tok in t.lower().split():
            b = bucket(tok)
            w += math.log((n_t[b] + 1) / (tot_t + n_buckets)) - math.log(
                (n_r[b] + 1) / (tot_r + n_buckets)
            )
        out[doc] = w
    return out


def test_dsir_importance_matches_brute_force(spark):
    texts = [
        "spark join shuffle partition broadcast",
        "spark filter pushdown scan column",
        "cat dog bird fish hamster snake",
        "dog cat spark fish join",
    ]
    labels = ["en", "en", "zz", "zz"]
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(zip(texts, labels))],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight"])
        for r in dsir_importance(
            df, "text", "doc_id", F.col("lang") == "en", n_buckets=16
        ).collect()
    }
    expected = _brute_dsir(texts, labels, "en")
    assert set(got) == set(expected)
    for doc, w in expected.items():
        n_tok, got_w = got[doc]
        assert n_tok == len(texts[doc].split())
        assert abs(got_w - w) < 1e-9
    # directional sanity: the pure-target-vocab doc scores above the
    # pure-non-target-vocab doc
    assert got[0][1] > got[2][1]


def test_dsir_stats_broadcast_not_shuffled_into_tokens(spark):
    df = spark.createDataFrame(
        [(i, "tok%d common word" % (i % 3), "en" if i % 2 else "zz")
         for i in range(20)],
        "doc_id long, text string, lang string",
    )
    res = dsir_importance(df, "text", "doc_id", F.col("lang") == "en",
                          n_buckets=8)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_weighted_sample_es_matches_brute_force_and_favors_weight(spark):
    """Selection set == brute-force Efraimidis-Spirakis with the same
    hash-derived uniforms; and across many ids, heavier rows win more
    often (the distributional point of the key)."""
    from automated_data_pipeline_spark.functions.text import stable_hash64_py
    from automated_data_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, "g%d" % (i % 2), (i % 7 + 1) * 10) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    got = {
        (r["g"], r["id"])
        for r in weighted_sample_topk(
            df, "w", "id", k=5, strata_cols=["g"], seed="t"
        ).collect()
    }

    def key(i, w):
        import math

        h = stable_hash64_py(str(i), "t") % 1_000_003
        u = (h + 1) / 1_000_005.0
        raw = u ** (1.0 / w)
        return (math.floor(raw * 1e10 + 0.5) / 1e10, h)

    expected = set()
    for g in ("g0", "g1"):
        members = [(i, w) for i, gg, w in rows if gg == g]
        # rank by rounded key desc, then integer uniform desc, then id
        ranked = sorted(
            members, key=lambda t: (-key(*t)[0], -key(*t)[1], t[0])
        )
        expected |= {(g, i) for i, _ in ranked[:5]}
    assert got == expected

    # heavier rows should be overrepresented: across 40 singleton
    # strata draws of {light, heavy}, heavy must win the majority
    pairs = [(i, "p%d" % i, 10 if i % 2 else 1000) for i in range(80)]
    pdf = spark.createDataFrame(pairs, "id long, g string, w long")
    # group into 40 strata of (light, heavy) by pairing consecutive ids
    pdf = pdf.withColumn("stratum", (F.col("id") / 2).cast("int"))
    wins = (
        weighted_sample_topk(pdf, "w", "id", k=1, strata_cols=["stratum"],
                             seed="t2")
        .filter(F.col("w") == 1000)
        .count()
    )
    assert wins > 25, f"heavy rows won only {wins}/40 strata"


def test_weighted_sample_global_k_is_take_ordered(spark):
    """Empty strata -> global top-k must plan as TakeOrderedAndProject
    (per-partition top-k + k-row merge), never a partitionless window."""
    from automated_data_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(i, (i % 5 + 1) * 7) for i in range(50)], "id long, w long"
    )
    out = weighted_sample_topk(df, "w", "id", k=5, seed="g")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert out.count() == 5

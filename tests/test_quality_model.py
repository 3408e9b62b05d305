"""operators/quality_model.py: trainable logreg quality filter —
separation on constructed corpora, determinism, expression/numpy score
parity, and the error contracts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import quality_model as QM

GOOD = [
    "the cat sat on the mat and looked to the door in a calm way",
    "a dog ran to the park and the children played in the sun",
    "the report is due in a week and the team is ready to ship",
    "a quick look at the data shows the trend is up and to the right",
]
BAD = [
    "$$$ ### !!! @@@ %%% ^^^ &&& *** ((( ))) ---",
    "xxxxxx yyyyyy zzzzzz xxxxxx yyyyyy zzzzzz !!!!",
    "@@@@ #### $$$$ %%%% ^^^^ &&&& **** !!!! ????",
    "k3j!!d 9dj@@2 l0o##1 qq$$77 mm%%88 nn^^99",
]


def _corpus(spark):
    rows = [(i, t, True) for i, t in enumerate(GOOD)] + [
        (100 + i, t, False) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, good boolean")


def test_train_separates_and_is_deterministic(spark):
    df = _corpus(spark)
    b1, w1 = QM.train_quality_logreg(df, "text", F.col("good"))
    b2, w2 = QM.train_quality_logreg(df, "text", F.col("good"))
    assert (b1, w1) == (b2, w2), "training must be deterministic"

    scored = QM.score_quality(df, "text", b1, w1).select("good", "quality_p")
    rows = scored.collect()
    good_p = [r["quality_p"] for r in rows if r["good"]]
    bad_p = [r["quality_p"] for r in rows if not r["good"]]
    # perfect ranking separation on the training corpus (it is
    # linearly separable in these features by construction)
    assert min(good_p) > max(bad_p)


def test_score_expression_matches_numpy(spark):
    df = _corpus(spark)
    bias, coefs = -1.5, [0.5, -0.2, -3.0, 2.0, 0.7]
    feats = QM.featurize(df, "text").select("doc_id", *QM.FEATURE_NAMES)
    scored = {
        r["doc_id"]: r["quality_p"]
        for r in QM.score_quality(df, "text", bias, coefs).collect()
    }
    for r in feats.collect():
        z = bias + sum(w * r[n] for w, n in zip(coefs, QM.FEATURE_NAMES))
        assert abs(scored[r["doc_id"]] - 1.0 / (1.0 + math.exp(-z))) < 1e-12


def test_train_rejects_degenerate_inputs(spark):
    one_class = spark.createDataFrame(
        [(1, "the cat sat", True), (2, "a dog ran", True)],
        "doc_id long, text string, good boolean",
    )
    with pytest.raises(ValueError, match="both classes"):
        QM.train_quality_logreg(one_class, "text", F.col("good"))
    empty = spark.createDataFrame([], "doc_id long, text string, good boolean")
    with pytest.raises(ValueError, match="empty"):
        QM.train_quality_logreg(empty, "text", F.col("good"))


def test_featurize_is_single_codegen_pass(spark):
    df = _corpus(spark)
    plan = QM.featurize(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "featurize must not shuffle"

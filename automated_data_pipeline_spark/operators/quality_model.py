"""Model-based document quality filtering: a logistic-regression
quality classifier over cheap engineered text features — the
CCNet / GPT-3-style "does this look like the reference corpus" filter
("CCNet", Wenzek et al. 2020; GPT-3 appendix A quality classifier),
complementing the suite's fixed heuristics (``functions/text.py
quality_score``, Gopher rules) with a TRAINABLE scorer.

Scale split (the same discipline as ``similarity.ivf_index``'s coarse
quantizer): the model is tiny (one weight per feature), so training
runs driver-side with numpy full-batch gradient descent on a bounded
UNIFORM sample — features computed IN SPARK first, so train-time and
score-time features are the same expressions — while FEATURIZATION and
SCORING stay fully distributed as pure whole-stage-codegen expressions
(no UDF, no shuffle; one narrow pass over the corpus). Training is
deterministic: hash-ranked sample, zero init, fixed iteration count.

Every feature is oracle-replayable (token counts via the suite's
pinned tokenization, punct ratio via the brace-free ``\\pL\\pN``
class shared with DuckDB's RE2), so a fixed-coefficient scoring query
carries a full-value SQL oracle; the trained-coefficient path is
pytest-pinned against a from-scratch numpy reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX

# Feature order is part of the model contract: coefficient vectors are
# positional over this list.
FEATURE_NAMES = ["f_logtok", "f_wlen", "f_punct", "f_stop", "f_ttr"]


def feature_exprs(text: Column) -> dict[str, Column]:
    """The five classifier features as pure expressions:
    log(1+tokens), mean word length, punctuation ratio, English
    stopword ratio, type-token ratio. Bounded ranges (a log and four
    ratios), so raw-feature gradient descent is well-conditioned
    without standardization — which keeps the scoring expression a
    plain dot product the SQL oracle can replay."""
    ws = TX.tokens(text)
    nw = F.size(ws)
    nz = F.greatest(nw, F.lit(1))
    return {
        "f_logtok": F.log(F.lit(1.0) + nw),
        "f_wlen": (
            F.aggregate(
                F.transform(ws, lambda x: F.length(x)),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / nz
        ).cast("double"),
        "f_punct": TX.punct_ratio(text).cast("double"),
        "f_stop": (TX.stopword_hits(ws, "en") / nz).cast("double"),
        "f_ttr": (F.size(F.array_distinct(ws)) / nz).cast("double"),
    }


def featurize(df: DataFrame, text_col: str) -> DataFrame:
    """Append the FEATURE_NAMES columns — one narrow codegen pass."""
    out = df
    for name, expr in feature_exprs(F.col(text_col)).items():
        out = out.withColumn(name, expr)
    return out


def score_expr(bias: float, coefs: list[float]) -> Column:
    """sigmoid(bias + coefs . features) over the FEATURE_NAMES
    columns — identical arithmetic in the SQL twin
    (1 / (1 + exp(-z)))."""
    z = F.lit(float(bias))
    for name, w in zip(FEATURE_NAMES, coefs):
        z = z + F.lit(float(w)) * F.col(name)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    df: DataFrame, text_col: str, bias: float, coefs: list[float],
    out_col: str = "quality_p",
) -> DataFrame:
    """Featurize + score in one distributed pass."""
    return featurize(df, text_col).withColumn(out_col, score_expr(bias, coefs))


def train_quality_logreg(
    df: DataFrame,
    text_col: str,
    is_positive: Column,
    lr: float = 0.5,
    l2: float = 1e-3,
    n_iter: int = 300,
    train_cap: int = 100_000,
    seed: int = 42,
) -> tuple[float, list[float]]:
    """Fit the classifier: ``is_positive`` marks the reference-corpus
    side (e.g. a curated subset), everything else is the raw side.
    Returns (bias, coefs) ready for ``score_quality``.

    The training sample is UNIFORM and bounded
    (``sampling.hash_ranked_sample`` — the shared trainer idiom; the
    label joins the hash payload so rows tied on features but
    differing in label cannot be cut ambiguously at the cap
    boundary). NULL texts are excluded up front: their features are
    all-NULL and one NaN row would poison every gradient step.
    Features come from the SAME Spark expressions used at scoring
    time, collected already-computed, so there is no train/serve
    skew. Full-batch gradient descent from zero init with a fixed
    iteration count — deterministic, no RNG."""
    import numpy as np

    from .sampling import hash_ranked_sample

    # NULL labels are rejected like NULL texts: silently mapping an
    # undefined label to the negative class would bias the classifier
    # (ADVICE r7).
    feats = featurize(
        df.filter(F.col(text_col).isNotNull() & is_positive.isNotNull())
        .select(is_positive.alias("_y"), text_col),
        text_col,
    )
    rows = hash_ranked_sample(
        feats.select("_y", *FEATURE_NAMES),
        ["_y", *FEATURE_NAMES],
        train_cap,
        seed,
    ).collect()
    if not rows:
        raise ValueError("empty training input")
    X = np.array([[r[n] for n in FEATURE_NAMES] for r in rows], dtype=np.float64)
    if not np.isfinite(X).all():
        raise ValueError("non-finite training features")
    y = np.array([1.0 if r["_y"] else 0.0 for r in rows])
    if y.min() == y.max():
        raise ValueError("training input needs both classes")
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(n_iter):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * g.mean()
    return float(b), [float(x) for x in w]

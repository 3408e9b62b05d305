"""streaming/quality_scorer.py: the quality classifier's incremental
twin — batch≡stream integer-exact summary merge, replay idempotence,
and the end-to-end file stream."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from automated_data_pipeline_spark.streaming.quality_scorer import (
    attach_quality_scorer,
    batch_score_summary,
    merged_score_histogram,
    start_quality_score_stream,
)
from automated_data_pipeline_spark.suite.round7 import _QLR

BIAS = _QLR["bias"]
COEFS = [_QLR["f_logtok"], _QLR["f_wlen"], _QLR["f_punct"],
         _QLR["f_stop"], _QLR["f_ttr"]]

TEXTS = [
    "the cat sat on the mat and looked to the door in a calm way",
    "a dog ran to the park and the children played in the sun",
    "$$$ ### !!! @@@ %%% ^^^ &&& *** ((( ))) ---",
    "the report is due in a week and the team is ready to ship",
    "xxxxxx yyyyyy zzzzzz xxxxxx yyyyyy zzzzzz !!!!",
    "a quick look at the data shows the trend is up and to the right",
    "k3j!!d 9dj@@2 l0o##1 qq$$77 mm%%88 nn^^99",
]


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, TEXTS[i]) for i in ids], "doc_id long, text string"
    )


def _hist(df):
    return {
        r["bucket"]: (r["n_docs"], r["avg_p"]) for r in df.collect()
    }


def test_stream_summaries_merge_to_batch_histogram(spark, tmp_path):
    """Any micro-batch split of the corpus must merge to the exact
    histogram one whole-corpus batch produces — integer sums, so
    equality is exact, not approximate."""
    whole = str(tmp_path / "whole")
    h_whole = attach_quality_scorer(None, whole, "text", BIAS, COEFS,
                                    run_key="w")
    h_whole(_docs(spark, range(len(TEXTS))), 0)

    for split in ([3], [1, 4], [2, 3, 5]):
        path = str(tmp_path / f"split_{'_'.join(map(str, split))}")
        h = attach_quality_scorer(None, path, "text", BIAS, COEFS,
                                  run_key="s")
        bounds = [0] + split + [len(TEXTS)]
        for bi in range(len(bounds) - 1):
            ids = range(bounds[bi], bounds[bi + 1])
            if ids:
                h(_docs(spark, ids), bi)
        assert _hist(merged_score_histogram(spark, path)) == _hist(
            merged_score_histogram(spark, whole)
        ), split


def test_replayed_batch_is_not_double_counted(spark, tmp_path):
    path = str(tmp_path / "metrics")
    h = attach_quality_scorer(None, path, "text", BIAS, COEFS, run_key="r")
    h(_docs(spark, [0, 1, 2]), 0)
    once = _hist(merged_score_histogram(spark, path))
    # a crashed-and-restarted query replays batch 0: a FRESH wrapper
    # (maybe_replay resets on restart) must detect the applied key
    h2 = attach_quality_scorer(None, path, "text", BIAS, COEFS, run_key="r")
    h2(_docs(spark, [0, 1, 2]), 0)
    assert _hist(merged_score_histogram(spark, path)) == once


def test_handler_receives_scored_frame(spark, tmp_path):
    seen = []
    h = attach_quality_scorer(
        lambda df, bid: seen.append(dict(df.dtypes)),
        str(tmp_path / "m"), "text", BIAS, COEFS, run_key="h",
    )
    h(_docs(spark, [0, 1]), 0)
    assert seen and seen[0].get("quality_p") == "double"


def test_null_texts_are_excluded_like_the_batch_scorer(spark, tmp_path):
    path = str(tmp_path / "nulls")
    h = attach_quality_scorer(None, path, "text", BIAS, COEFS, run_key="n")
    with_null = _docs(spark, [0, 1]).unionByName(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    h(with_null, 0)
    total = (
        spark.read.parquet(path).agg(F.sum("n_docs").alias("n")).first()["n"]
    )
    assert total == 2


def test_quality_score_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join(
            json.dumps({"doc_id": i, "text": TEXTS[i]}) for i in range(4)
        ))
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write("\n".join(
            json.dumps({"doc_id": i, "text": TEXTS[i]})
            for i in range(4, len(TEXTS))
        ))
    metrics = str(tmp_path / "metrics")
    q = start_quality_score_stream(
        spark, src, metrics, BIAS, COEFS, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    want = batch_score_summary(
        _docs(spark, range(len(TEXTS))), 0, "text", BIAS, COEFS
    )
    merged = merged_score_histogram(spark, metrics)
    w = {
        r["bucket"]: (r["n_docs"], r["sum_p_i"]) for r in want.collect()
    }
    g = {
        r["bucket"]: (r["n_docs"], r["_sum"]) for r in
        spark.read.parquet(metrics)
        .groupBy("bucket")
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("sum_p_i").alias("_sum"))
        .collect()
    }
    assert g == w
    assert merged.count() == len(w)

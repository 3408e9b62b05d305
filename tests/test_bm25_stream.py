"""Incremental BM25 (streaming/bm25_stream.py): batch ≡ stream
exactness, replay idempotence, the crash window between the postings
and doclen appends, and scoring a fresh increment against established
store statistics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators.retrieval import bm25_top_docs
from automated_data_pipeline_spark.streaming.bm25_stream import (
    DocLenStore, PostingsStore, recover_bm25_scores, update_postings,
)

QUERIES = {1: ["spark", "join"], 2: ["batch", "window"]}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "spark join join filter scan",
    "spark stream window window",
    "batch batch window merge",
    "vector hash join spark",
    "filter scan merge sort",
    "join batch spark window stream",
]


@pytest.fixture()
def stores(tmp_path):
    return (
        PostingsStore(os.path.join(tmp_path, "postings")),
        DocLenStore(os.path.join(tmp_path, "doclens")),
    )


def _fold(spark, docs, stores, n_splits=3):
    postings, doclens = stores
    for i in range(n_splits):
        update_postings(
            spark, docs.filter(F.col("doc_id") % n_splits == i),
            postings, doclens, batch_key=f"b{i}",
        )


def test_stream_matches_batch_exactly(spark, stores):
    docs = _docs(spark, TEXTS)
    _fold(spark, docs, stores)
    got = recover_bm25_scores(spark, *stores, QUERIES, k=10).collect()
    want = bm25_top_docs(spark, docs, QUERIES, k=10).collect()
    key = lambda r: (r["query_id"], r["doc_id"])
    assert sorted(
        [(r["query_id"], r["doc_id"], r["score"], r["rnk"]) for r in got]
    ) == sorted(
        [(r["query_id"], r["doc_id"], r["score"], r["rnk"]) for r in want]
    )


def test_replay_is_idempotent(spark, stores):
    docs = _docs(spark, TEXTS)
    _fold(spark, docs, stores)
    before = recover_bm25_scores(spark, *stores, QUERIES, k=10).collect()
    # replay every batch key: stores must be untouched
    _fold(spark, docs, stores)
    postings, doclens = stores
    assert postings.read(spark).count() == len(set(
        (r["doc_id"], r["term"])
        for r in postings.read(spark).collect()
    )), "replay duplicated postings rows"
    after = recover_bm25_scores(spark, *stores, QUERIES, k=10).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_crash_between_appends_heals(spark, stores):
    """A crash after the postings append but before the doclen append
    leaves batch_key present in one store only; the replay probe must
    heal the doclen side from the postings rows, not skip or
    double-apply."""
    postings, doclens = stores
    docs = _docs(spark, TEXTS)
    update_postings(spark, docs.filter(F.col("doc_id") < 3),
                    postings, doclens, batch_key="b0")
    # simulate the crash window for b1: postings written, doclens not
    from automated_data_pipeline_spark.streaming.bm25_stream import (
        batch_postings,
    )
    tf = batch_postings(
        docs.filter(F.col("doc_id") >= 3), "doc_id", "text"
    ).withColumn("batch_key", F.lit("b1"))
    postings.append(tf)
    assert postings.has_batch(spark, "b1")
    assert not doclens.has_batch(spark, "b1")
    # restart replay
    update_postings(spark, docs.filter(F.col("doc_id") >= 3),
                    postings, doclens, batch_key="b1")
    assert doclens.has_batch(spark, "b1")
    got = recover_bm25_scores(spark, *stores, QUERIES, k=10).collect()
    want = bm25_top_docs(spark, docs, QUERIES, k=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_fresh_increment_shifts_statistics(spark, stores):
    """Adding an increment changes df/avgdl for everyone — recovery
    reflects the merged corpus, identical to a batch run over it."""
    docs = _docs(spark, TEXTS)
    _fold(spark, docs, stores, n_splits=2)
    extra = spark.createDataFrame(
        [(100, "spark spark spark join"), (101, "window join batch")],
        "doc_id long, text string",
    )
    update_postings(spark, extra, *stores, batch_key="b-extra")
    merged = docs.unionByName(extra)
    got = recover_bm25_scores(spark, *stores, QUERIES, k=20).collect()
    want = bm25_top_docs(spark, merged, QUERIES, k=20).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert any(r["doc_id"] == 100 for r in got)


def test_term_filter_pushes_down_to_postings_scan(spark, stores):
    """The scoring path's postings scan must carry the query-term IN
    predicate as a pushed parquet filter — the 100 TB guarantee that
    serving reads posting lists, not the corpus."""
    docs = _docs(spark, TEXTS)
    _fold(spark, docs, stores)
    df = recover_bm25_scores(spark, *stores, QUERIES, k=5)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    import re
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("In(term" in p for p in pushed), pushed

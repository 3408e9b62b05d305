"""Incremental trigram novelty (streaming/novelty_stream.py): the
distinct gram-doc index merges exactly across micro-batches (and
across replays — distinct IS the merge), and the recovered per-source
report equals the batch operator's output exactly."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.streaming.novelty_stream import (
    GramDocStore,
    batch_doc_grams,
    recover_novelty_report,
    start_incremental_novelty,
)
from automated_data_pipeline_spark.suite import all_specs, load

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text", "source")


def _write_shards(docs, src, n=3):
    os.makedirs(src, exist_ok=True)
    for i in range(n):
        rows = docs.filter(F.col("doc_id") % n == i).collect()
        with open(os.path.join(src, f"s{i}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(
                    {"doc_id": r["doc_id"], "text": r["text"],
                     "source": r["source"]}) + "\n")


def test_streamed_report_equals_batch_operator(spark, docs, tmp_path):
    """batch ≡ stream end to end: 3 micro-batches through the store,
    recovered report == the suite's trigram_novelty_by_source output
    (which carries the DuckDB oracle), tuple for tuple."""
    src = str(tmp_path / "in")
    _write_shards(docs, src)
    store = GramDocStore(str(tmp_path / "store"))
    q = start_incremental_novelty(spark, src, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = [tuple(r) for r in recover_novelty_report(spark, store).collect()]
    batch_fn = {s.name: s.fn for s in all_specs()}["trigram_novelty_by_source"]
    want = [tuple(r) for r in batch_fn(spark, SF).collect()]
    assert got == want and len(got) > 0


def test_replayed_batch_is_absorbed_by_distinct(spark, docs, tmp_path):
    """No ledger needed: re-appending a batch's gram rows (any replay
    shape — crash-window or wholesale) leaves the DISTINCT index and
    the report unchanged."""
    store = GramDocStore(str(tmp_path / "store"))
    for i in range(3):
        store.append(batch_doc_grams(docs.filter(F.col("doc_id") % 3 == i)))
    before = [tuple(r) for r in recover_novelty_report(spark, store).collect()]
    n_distinct = store.read_distinct(spark).count()
    store.append(batch_doc_grams(docs.filter(F.col("doc_id") % 3 == 0)))
    assert store.read_distinct(spark).count() == n_distinct
    after = [tuple(r) for r in recover_novelty_report(spark, store).collect()]
    assert after == before


def test_store_compacts_without_value_change(spark, docs, tmp_path):
    store = GramDocStore(str(tmp_path / "store"))
    for i in range(3):
        store.append(batch_doc_grams(docs.filter(F.col("doc_id") % 3 == i)))
    before = [tuple(r) for r in recover_novelty_report(spark, store).collect()]
    store.compact(spark, n_files=2)
    files = [
        f for _r, _d, fs in os.walk(store.path) for f in fs
        if f.endswith(".parquet")
    ]
    assert len(files) <= 2
    assert [tuple(r) for r in recover_novelty_report(spark, store).collect()] == before

"""Round-4 curation operators: SemDeDup semantic pruning, Gopher
repetition filters, cross-doc n-gram repetition, nearest-centroid
assignment. Value semantics are pinned on tiny synthetic frames where
the expected answer is hand-computable; the sf0.01 cross-engine check
lives in the oracle suite (tools/check_oracles.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import similarity
from automated_data_pipeline_spark.suite import curation

SF = "/root/testdata/sf0.001"


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


# ------------------------------------------------------------------
# semantic_dedup
def test_semdedup_prunes_higher_id_within_cluster(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, label=0, embedding=[1.0, 0.0]),
            Row(vec_id=2, label=0, embedding=[1.0, 0.0]),   # dup of 1
            Row(vec_id=3, label=0, embedding=[0.0, 1.0]),   # orthogonal
            Row(vec_id=4, label=1, embedding=[1.0, 0.0]),   # dup of 1 but other cluster
        ]
    )
    out = {
        r["vec_id"]: r["survives"]
        for r in similarity.semantic_dedup(df, threshold=0.9).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: True}


def test_semdedup_chain_keeps_only_lowest_id(spark):
    # 3 mutual near-dups in one cluster: only the lowest id survives
    df = spark.createDataFrame(
        [Row(vec_id=i, label=0, embedding=[1.0, float(i) * 1e-4]) for i in (5, 6, 7)]
    )
    out = {
        r["vec_id"]: r["survives"]
        for r in similarity.semantic_dedup(df, threshold=0.99).collect()
    }
    assert out == {5: True, 6: False, 7: False}


# ------------------------------------------------------------------
# gopher_repetition
def test_gopher_repetition_flags_repeated_doc(tmp_path, spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam", lang="en",
                source="s", n_chars=19),
            Row(doc_id=2, text=" ".join(f"w{i}" for i in range(40)), lang="en",
                source="s", n_chars=100),
        ]
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in curation.gopher_repetition(spark, d).collect()}
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[1]["gopher_pass"] is False
    assert rows[2]["top_word_frac"] == 0.025
    assert rows[2]["gopher_pass"] is True


# ------------------------------------------------------------------
# cross_doc_ngram_repetition
def test_cross_doc_ngram_repetition_detects_containment(tmp_path, spark):
    shared = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared, lang="en", source="s", n_chars=50),
            Row(doc_id=2, text=shared + " unique tail here now extra",
                lang="en", source="s", n_chars=80),
            Row(doc_id=3, text=" ".join(f"z{i}" for i in range(10)),
                lang="en", source="s", n_chars=50),
        ]
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in curation.cross_doc_ngram_repetition(spark, d).collect()
    }
    # doc 1 (10 tokens -> 6 distinct 5-grams) is fully contained in doc 2
    assert rows[1]["n_grams5"] == 6
    assert rows[1]["shared_frac"] == 1.0
    # doc 2 shares exactly those 6 of its 11 5-grams
    assert rows[2]["n_grams5"] == 11
    assert rows[2]["shared_frac"] == round(6 / 11, 4)
    assert rows[3]["shared_frac"] == 0.0
    assert _cache_empty(spark)


# ------------------------------------------------------------------
# nearest_centroid_assign
def test_nearest_centroid_recovers_separated_labels(tmp_path, spark):
    # two well-separated clusters: every vector assigns to its own label
    rows = []
    for i in range(6):
        rows.append(Row(vec_id=i, embedding=[10.0 + i * 0.1, 0.0], label=0))
        rows.append(Row(vec_id=100 + i, embedding=[0.0, 10.0 + i * 0.1], label=1))
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{d}/embeddings.parquet")
    out = curation.nearest_centroid_assign(spark, d).collect()
    got = {(r["true_label"], r["assigned_label"]): r["n"] for r in out}
    assert got == {(0, 0): 6, (1, 1): 6}


def test_semdedup_query_runs_on_fixture(spark):
    out = curation.semdedup_prune(spark, SF)
    n = out.count()
    assert n == out.select("vec_id").distinct().count()
    assert set(out.columns) == {"vec_id", "label", "survives"}


def test_ts_pattern_match_short_span_is_empty(tmp_path, spark):
    """A corpus spanning fewer hours than the pattern yields no rows
    (matching the SQL twin's empty range) instead of generating
    negative offsets that crash under ANSI indexing."""
    from datetime import datetime, timedelta

    from automated_data_pipeline_spark.suite.events import ts_pattern_match

    base = datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        Row(user_id=1, ts=base + timedelta(minutes=m), event_type="click",
            event_id=f"e{m}", value=1.0)
        for m in (0, 30, 70)  # spans 2 hourly buckets < pattern length 4
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
    assert ts_pattern_match(spark, d).count() == 0

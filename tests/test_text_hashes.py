"""Python-oracle tests for the hash-based text operators whose SQL
twins are impractical (SimHash packing, hamming distance)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from automated_data_pipeline_spark.functions import text as TX
from automated_data_pipeline_spark.suite import load

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


def _simhash_py(text: str, seed: str = "sim") -> int:
    toks = [t for t in text.lower().split() if t]
    sums = [0] * TX.SIMHASH_BITS
    for t in toks:
        h = TX.stable_hash64_py(t, seed)
        for j in range(TX.SIMHASH_BITS):
            sums[j] += ((h >> j) & 1) * 2 - 1
    packed = 0
    for j in range(TX.SIMHASH_BITS):
        if sums[j] > 0:
            packed |= 1 << j
    return packed


def test_simhash_matches_python_oracle(spark):
    d = load(spark, SF, "documents").limit(20)
    got = {r["id"]: r["simhash"] for r in TX.simhash_frame(d, "doc_id", "text").collect()}
    for r in d.collect():
        assert got[r["doc_id"]] == _simhash_py(r["text"]), r["doc_id"]


def test_hamming64(spark):
    df = spark.range(1).select(
        TX.hamming64(F.lit(0b1011), F.lit(0b0001)).alias("h1"),
        TX.hamming64(F.lit(0), F.lit((1 << 60) - 1)).alias("h2"),
        TX.hamming64(F.lit(12345), F.lit(12345)).alias("h3"),
    )
    r = df.first()
    assert (r["h1"], r["h2"], r["h3"]) == (2, 60, 0)


def test_stable_hash64_engine_portable(spark):
    # the Spark expression and the Python twin must agree bit-for-bit
    words = ["hello", "wörld", "的", "x y", ""]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {
        r["w"]: r["h"]
        for r in df.select("w", TX.stable_hash64(F.col("w")).alias("h")).collect()
    }
    for w in words:
        assert got[w] == TX.stable_hash64_py(w), w


def test_connected_components_chain_and_singletons(spark):
    """A~B, B~C, plus D~E, plus isolated F: components must close over
    the chain (A,B,C share one representative even though A!~C) and
    isolated vertices stay singletons."""
    from automated_data_pipeline_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("d", "e")], ["id_a", "id_b"]
    )
    verts = spark.createDataFrame([(v,) for v in "abcdef"], ["doc_id"])
    got = {
        r["id"]: r["rep_id"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f"}


def test_connected_components_long_chain(spark):
    """A 60-vertex path graph: plain min-propagation needs 59 rounds;
    pointer doubling must close it within the default max_iterations
    (O(log n) rounds) and label every vertex with the chain head."""
    from automated_data_pipeline_spark.operators.dedup import connected_components

    n = 60
    edges = spark.createDataFrame(
        [(f"v{i:02d}", f"v{i+1:02d}") for i in range(n - 1)], ["id_a", "id_b"]
    )
    got = connected_components(edges).collect()
    assert len(got) == n
    assert all(r["rep_id"] == "v00" for r in got)


def test_chunk_documents_edges(spark):
    """Short docs yield one short chunk; empty docs vanish; overlap
    must be smaller than the window."""
    import pytest

    from automated_data_pipeline_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "   ")],
        "doc_id bigint, text string",
    )
    got = {
        (r["id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=2).collect()
    }
    # doc 1: 7 tokens, windows at 1,3,5,7 -> 4,4,3,1 tokens
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "c d e f")
    assert got[(1, 2)] == (3, "e f g")
    assert got[(1, 3)] == (1, "g")
    assert got[(2, 0)] == (1, "x")
    assert not any(k[0] == 3 for k in got)  # whitespace-only doc dropped
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_connected_components_vertices_subset_drops_foreign_edges(spark):
    """ADVICE r3: when vertices is a strict subset of edge endpoints,
    rep ids must never name a non-vertex — edges touching unknown ids
    are dropped before iteration."""
    from automated_data_pipeline_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [("a", "x"), ("b", "c"), ("x", "b")], ["id_a", "id_b"]
    )  # 'x' is not a vertex
    verts = spark.createDataFrame([(v,) for v in "abc"], ["doc_id"])
    got = {
        r["id"]: r["rep_id"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {"a": "a", "b": "b", "c": "b"}
    assert "x" not in got and "x" not in got.values()

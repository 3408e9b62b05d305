"""Distributed BPE trainer tests: exact merge-table parity with a
from-scratch pure-Python reference, tokenizer round-trip properties,
and the early-stop/min-freq contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import bpe
from automated_data_pipeline_spark.suite import load

SF_SMOKE = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


def test_bpe_train_matches_reference(spark):
    d = load(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in d.select("text").collect()]
    got = bpe.bpe_train(d, n_merges=30)
    want = bpe.bpe_train_py(texts, n_merges=30)
    assert got == want, (
        f"lens {len(got)} vs {len(want)}; first divergence: "
        f"{next(((i, a, b) for i, (a, b) in enumerate(zip(got, want)) if a != b), None)}"
    )
    assert len(got) == 30  # fixture corpus supports >= 30 merges


def test_bpe_train_early_stop(spark):
    df = spark.createDataFrame([(1, "zq zq")], ["doc_id", "text"])
    # word 'zq' freq 2: pairs (z,q)=2 and (q,</w>)=2 tie; the
    # lexicographic tie-break picks (q,</w>) first ('<' < 'z'), then
    # (z,q</w>)=2, then nothing above min_freq=2 remains
    merges = bpe.bpe_train(df, n_merges=10, min_freq=2)
    assert [(a, b) for a, b, _ in merges] == [
        ("q", bpe.END), ("z", "q" + bpe.END)
    ]
    # and the reference agrees on the tie-break
    assert merges == bpe.bpe_train_py(["zq zq"], n_merges=10, min_freq=2)


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([(1, "aaa aaa")], ["doc_id", "text"])
    merges = bpe.bpe_train(df, n_merges=1, min_freq=1)
    # pairs in 'a a a </w>': (a,a) x2 -> winner (freq 4 over 2 words)
    assert merges[0][:2] == ("a", "a")
    toks = bpe.bpe_tokenize(df, merges).collect()[0]
    # greedy scan: [aa, a, </w>] per word, two words
    assert toks["bpe_tokens"] == ["aa", "a", bpe.END] * 2


def test_bpe_tokenize_roundtrip_and_counts(spark):
    d = load(spark, SF_SMOKE, "documents")
    merges = bpe.bpe_train(d, n_merges=20)
    out = bpe.bpe_tokenize(d, merges)
    rows = out.collect()
    assert len(rows) == d.count()
    for r in rows[:10]:
        assert r["n_tokens"] == len(r["bpe_tokens"])
        # detokenize: concatenation restores the lowercased words
        text = "".join(r["bpe_tokens"]).replace(bpe.END, " ").strip()
        doc = [x for x in d.filter(F.col("doc_id") == r["doc_id"])
               .collect()][0]["text"]
        assert text == " ".join(doc.lower().split())
    # merges reduce token counts vs char-level
    char_level = bpe.bpe_tokenize(d, [])
    merged_total = out.agg(F.sum("n_tokens")).first()[0]
    char_total = char_level.agg(F.sum("n_tokens")).first()[0]
    assert merged_total < char_total


def test_bpe_tokenizer_boundary_consistency_nbsp(spark):
    """Training and apply must agree on word boundaries for non-ASCII
    whitespace (U+00A0 is ubiquitous in crawled HTML): both treat the
    NBSP-joined pair as ONE word, matching the Java \\s+ split the
    distributed trainer uses."""
    text = "foo bar foo bar"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = bpe.bpe_train(df, n_merges=3, min_freq=1)
    want = bpe.bpe_train_py([text], n_merges=3, min_freq=1)
    assert got == want
    # the reference sees one distinct word of 7 chars, not two words
    assert bpe.bpe_train_py([text], n_merges=0) == []
    toks = bpe.bpe_tokenize(df, got).collect()[0]["bpe_tokens"]
    # exactly one END marker per NBSP-joined word occurrence
    assert "".join(toks).count(bpe.END) == 2

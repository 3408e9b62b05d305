"""operators/spans.py (duplicated-span detection) and
operators/linkage.py (masked-position Hamming<=1 matching): semantics
vs small brute-force references, merge/edge behavior."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators.linkage import hamming1_pairs
from automated_data_pipeline_spark.operators.spans import duplicated_spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_spans_shared_prefix_detected(spark):
    boiler = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    df = _docs(spark, [boiler + " alpha beta gamma", boiler + " delta epsilon"])
    spans = duplicated_spans(df, "text", "doc_id", k=8).collect()
    by_doc = {r["doc_id"]: r for r in spans}
    assert set(by_doc) == {0, 1}
    for r in by_doc.values():
        # the shared 10-token prefix: seeds at pos 1..3 merge to [1, 10]
        assert (r["span_start"], r["span_end"]) == (1, 10)
        assert r["span_tokens"] == 10
        assert r["n_seeds"] == 3


def test_spans_no_duplicates_no_rows(spark):
    df = _docs(spark, ["one two three four five six seven eight nine",
                       "totally different words in this other document here now"])
    assert duplicated_spans(df, "text", "doc_id", k=8).count() == 0


def test_spans_short_docs_skipped(spark):
    df = _docs(spark, ["too short", "too short"])  # < k tokens
    assert duplicated_spans(df, "text", "doc_id", k=8).count() == 0


def test_spans_within_doc_repetition(spark):
    chunk = "a b c d e f g h"  # 8 tokens, k=8 -> one shingle
    df = _docs(spark, [f"{chunk} x y z {chunk}"])
    rows = duplicated_spans(df, "text", "doc_id", k=8).collect()
    # the chunk appears twice WITHIN one doc: two disjoint spans
    got = sorted((r["span_start"], r["span_end"]) for r in rows)
    assert got == [(1, 8), (12, 19)]


def test_spans_disjoint_islands_not_merged(spark):
    dup1 = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    dup2 = "iota kappa lambda mu nu xi omicron pi"  # 8 tokens
    gap = "unique1 unique2 unique3"
    d0 = f"{dup1} {gap} {dup2}"
    df = _docs(spark, [d0, dup1, dup2])
    rows = duplicated_spans(df, "text", "doc_id", k=8)
    d0_rows = sorted(
        (r["span_start"], r["span_end"])
        for r in rows.filter(F.col("doc_id") == 0).collect()
    )
    assert d0_rows == [(1, 8), (12, 19)]


def test_spans_match_bruteforce(spark):
    """Span cover == the brute-force 'token inside a duplicated k-gram'
    set, on a randomized-ish corpus with planted overlaps."""
    k = 5
    texts = [
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
        "w3 w4 w5 w6 w7 w8 zz yy",
        "q1 q2 q3 q4 q5 q6",
        "p1 q2 q3 q4 q5 q6 p2",
    ]
    df = _docs(spark, texts)
    rows = duplicated_spans(df, "text", "doc_id", k=k).collect()
    covered = {
        (r["doc_id"], t)
        for r in rows
        for t in range(r["span_start"], r["span_end"] + 1)
    }
    # brute force
    toks = [t.split() for t in texts]
    grams: dict[tuple, list] = {}
    for d, ws in enumerate(toks):
        for i in range(len(ws) - k + 1):
            grams.setdefault(tuple(ws[i:i + k]), []).append((d, i + 1))
    expected = set()
    for g, occ in grams.items():
        if len(occ) >= 2:
            for d, pos in occ:
                for t in range(pos, pos + k):
                    expected.add((d, t))
    assert covered == expected
    # spans must be maximal: n_seeds consistent with span length
    for r in rows:
        assert r["span_tokens"] >= k
        assert r["n_seeds"] <= r["span_tokens"] - k + 1


def test_hamming1_pairs_match_bruteforce(spark):
    keys = [
        "ABCD", "ABCE", "ABXD", "ZZZZ", "ZZZA", "ABCD2"[:4],  # dup of ABCD
        "QRST", "QRSU", "WXYZ",
    ]
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "rid long, key string"
    )
    got = {
        (r["id_1"], r["id_2"], r["dist"])
        for r in hamming1_pairs(df, "key", "rid", length=4).collect()
    }
    def ham(a, b):
        return sum(1 for x, y in zip(a, b) if x != y)
    expected = {
        (i, j, ham(keys[i], keys[j]))
        for i, j in itertools.combinations(range(len(keys)), 2)
        if ham(keys[i], keys[j]) <= 1
    }
    assert got == expected
    # the exact-duplicate pair surfaces with dist 0
    assert (0, 5, 0) in got


def test_hamming1_pairs_wrong_length_excluded(spark):
    df = spark.createDataFrame(
        [(1, "AAAA"), (2, "AAAB"), (3, "AAA"), (4, "AAAAA")],
        "rid long, key string",
    )
    rows = hamming1_pairs(df, "key", "rid", length=4).collect()
    assert {(r["id_1"], r["id_2"]) for r in rows} == {(1, 2)}


def test_hamming1_candidates_are_exactly_hamming_le_1(spark):
    """Masked-position blocking is PRECISE: every candidate the join
    yields verifies (no lossy blocking), asserted by dist <= 1 never
    filtering anything for distance-2+ keys that share no masked
    variant."""
    df = spark.createDataFrame(
        [(1, "AB"), (2, "CD")], "rid long, key string"
    )  # hamming 2: must produce no candidate rows at all
    assert hamming1_pairs(df, "key", "rid", length=2).count() == 0

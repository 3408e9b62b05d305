"""Unit oracles for the temporal/range join operators (operators/joins.py)
on hand-built frames where the expected matches are enumerable."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import joins


def test_asof_join_backward_basic(spark):
    quotes = spark.createDataFrame(
        [
            ("A", 1, 10.0),
            ("A", 5, 11.0),
            ("A", 9, 12.0),
            ("B", 4, 20.0),
        ],
        ["sym", "t", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("A", 0, 1),   # before any quote -> NULL
            ("A", 5, 2),   # equal ts -> inclusive match at t=5
            ("A", 8, 3),   # between 5 and 9 -> t=5 quote
            ("B", 9, 4),
            ("C", 2, 5),   # key with no quotes -> NULL
        ],
        ["sym", "t", "trade_id"],
    )
    out = joins.asof_join_backward(
        trades,
        quotes,
        on=["sym"],
        left_ts="t",
        right_ts="t",
        right_payload={"px": "quote_px", "t": "quote_t"},
        left_seq="trade_id",
    )
    got = {r["trade_id"]: (r["quote_px"], r["quote_t"]) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (11.0, 5),
        3: (11.0, 5),
        4: (20.0, 4),
        5: (None, None),
    }


def test_asof_join_tie_latest_seq_wins(spark):
    # two right rows at the identical timestamp: the larger seq wins
    right = spark.createDataFrame(
        [("A", 5, 1, 100.0), ("A", 5, 2, 200.0)], ["k", "t", "seq", "v"]
    )
    left = spark.createDataFrame([("A", 5, 7)], ["k", "t", "lid"])
    out = joins.asof_join_backward(
        left, right, on=["k"], left_ts="t", right_ts="t",
        right_payload={"v": "rv"}, right_seq="seq",
    )
    assert out.first()["rv"] == 200.0


def test_range_join_bands_boundaries(spark):
    bands = spark.createDataFrame(
        [("lo", 0, 10), ("hi", 10, 20)], ["band", "lo", "hi"]
    )
    facts = spark.createDataFrame([(0.0,), (9.99,), (10.0,), (19.99,), (20.0,)], ["v"])
    out = joins.range_join_bands(facts, bands, "v")
    got = sorted((r["v"], r["band"]) for r in out.collect())
    # [lo, hi): 20.0 falls out entirely
    assert got == [(0.0, "lo"), (9.99, "lo"), (10.0, "hi"), (19.99, "hi")]


def test_interval_overlap_join(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 50, 60), (3, 95, 105)], ["lid", "ls", "le"]
    )
    right = spark.createDataFrame(
        [(10, 5, 7), (11, 9, 12), (12, 61, 70), (13, 100, 200)],
        ["rid", "rs", "re"],
    )
    out = joins.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=16
    )
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    # expected overlaps: 1-10, 1-11, 3-13; 2-12 do NOT overlap ([50,60] vs [61,70])
    assert pairs == [(1, 10), (1, 11), (3, 13)]
    # each overlapping pair appears exactly once despite multi-bin spans
    assert len(pairs) == out.count()


def test_interval_overlap_join_with_on_keys_unambiguous(spark):
    left = spark.createDataFrame([("u1", 1, 0, 10), ("u2", 2, 0, 10)], ["k", "lid", "ls", "le"])
    right = spark.createDataFrame([("u1", 10, 5, 7), ("u2", 11, 50, 60)], ["k", "rid", "rs", "re"])
    out = joins.interval_overlap_join(left, right, "ls", "le", "rs", "re", bin_width=16, on=["k"])
    # the shared key resolves unambiguously and same-key-only pairs match
    rows = out.select("k", "lid", "rid").collect()
    assert [(r["k"], r["lid"], r["rid"]) for r in rows] == [("u1", 1, 10)]


def test_snapshot_diff_null_vs_value_not_unchanged(spark):
    from automated_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, "x", None), (2, None, "y")], "k int, a string, b string")
    new = spark.createDataFrame([(1, None, "x"), (2, None, "y")], "k int, a string, b string")
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k", include_unchanged=True).collect()}
    assert out == {1: "changed", 2: "unchanged"}  # NULL shifts don't collide


def test_interval_overlap_join_prefix_escalates_on_r_collision(spark):
    """A left side already carrying an r_<name> column must not end up
    with two identically-named columns after the disambiguating
    rename — the prefix escalates until unique."""
    left = spark.createDataFrame(
        [(1, 0, 10, "x")], ["lid", "start", "end", "r_start"]
    )
    right = spark.createDataFrame(
        [(10, 5, 7)], ["rid", "start", "end"]
    )
    out = joins.interval_overlap_join(
        left, right, "start", "end", "start", "end", bin_width=16
    )
    names = out.columns
    assert len(names) == len(set(names)), f"duplicate columns: {names}"
    rows = out.collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 10)]
    # every column reachable without AMBIGUOUS_REFERENCE
    for c in names:
        out.select(c).collect()

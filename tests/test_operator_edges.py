"""Degenerate-input edges surfaced by the round-4 operator review:
NULL timestamps in as-of joins, NULL business keys in merge, token-less
documents in SimHash/exact dedup, corrupt payload geometry, and the
zero-rule expectation suite."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import dedup, joins, quality, upsert


def test_asof_join_ignores_null_right_timestamps(spark):
    left = spark.createDataFrame(
        [Row(k=1, lts=datetime(2024, 1, 1, 12), lid="L1")]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=None, price=99.0),   # no event time: never a match
            Row(k=1, rts=datetime(2024, 1, 2), price=7.0),  # after left: no
        ],
        "k int, rts timestamp, price double",
    )
    out = joins.asof_join_backward(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload={"price": "asof_price"},
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_price"] is None  # NOT the NULL-ts row's 99.0


def test_upsert_merge_preserves_null_key_target_rows(spark):
    target = spark.createDataFrame(
        [Row(k=None, amount=5.0), Row(k="A", amount=1.0)],
        "k string, amount double",
    )
    updates = spark.createDataFrame(
        [Row(k="A", amount=2.0), Row(k="B", amount=3.0)],
        "k string, amount double",
    )
    out = upsert.upsert_merge(target, updates, "k")
    got = {r["k"]: r["amount"] for r in out.collect()}
    # the NULL-key target row survives untouched; A updated; B inserted
    assert got == {None: 5.0, "A": 2.0, "B": 3.0}
    # both merge paths agree on the NULL-key row
    got_replace = {
        r["k"]: r["amount"]
        for r in upsert.upsert_replace(target, updates, "k").collect()
    }
    assert got_replace[None] == 5.0


def test_simhash_skips_tokenless_documents(spark):
    rows = [Row(doc_id=i, text="   ") for i in range(5)]
    rows += [
        Row(doc_id=10, text="alpha beta gamma delta"),
        Row(doc_id=11, text="alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows)
    pairs = dedup.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    # the 5 empty docs produce NO pairs (no quadratic simhash-0 bucket);
    # the real duplicate pair is still found
    assert ids == {10, 11}


def test_exact_dedup_degenerate_docs_stay_singletons(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=None),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="!!!"),
            Row(doc_id=4, text="???"),
            Row(doc_id=5, text="same text"),
            Row(doc_id=6, text="same text"),
        ],
        "doc_id int, text string",
    )
    out = dedup.exact_dedup(df, "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in out}
    # NULL-text and punctuation-only docs are singletons, never merged
    assert by_keep == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2}


def test_resize_keeps_original_geometry_on_decode_failure(spark):
    from automated_data_pipeline_spark.operators import multimodal

    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=b"not a png", media_type="image",
                width=32, height=24, duration_ms=None)
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.resize_image(df, 8, 8).collect()[0]
    assert bytes(out["payload"]) == b"not a png"
    assert out["width"] == 32 and out["height"] == 24


def test_rule_report_empty_rules_returns_empty_report(spark):
    df = spark.createDataFrame([Row(k=1)], "k int")
    rep = quality.rule_report(df, "t", [])
    assert rep.count() == 0
    assert rep.columns == [
        "table_name", "check_name", "n_rows", "n_violations", "violation_rate"
    ]


def test_zorder_empty_frame_and_many_columns(spark):
    """zorder_key must not crash on an empty frame (min/max = None) and
    must keep every interleaved bit below the long sign bit for 4+
    columns (a sign-bit key would sort its high bucket FIRST)."""
    from automated_data_pipeline_spark.plans.maintenance import zorder_key

    empty = spark.createDataFrame([], "a double, b double")
    keyed, kc = zorder_key(empty, ["a", "b"])
    assert keyed.count() == 0

    rows = [(float(i % 7), float(i % 5), float(i % 3), float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    keyed, kc = zorder_key(df, ["a", "b", "c", "d"])
    mn = keyed.agg(F.min(kc)).first()[0]
    assert mn >= 0, "Morton key hit the sign bit"


def test_rest_records_prefer_non_null_case_variant(spark):
    from automated_data_pipeline_spark.sources.rest import _records_to_df

    df = _records_to_df(
        spark, [{"orderid": None, "OrderId": "ORD-9", "Amount": 1.5}]
    )
    row = df.collect()[0]
    assert row["OrderId"] == "ORD-9"


def test_scrape_inner_text_excludes_script_and_style():
    from automated_data_pipeline_spark.sources.scrape import (
        _parse_html,
        select_all,
    )

    html = (
        "<html><body><style>.a{color:red}</style>"
        "<script>var x = 1;</script><p>hello</p></body></html>"
    )
    root = _parse_html(html)
    els = select_all(root, "body")
    assert len(els) == 1
    assert els[0].inner_text() == "hello"


def test_jdbc_blank_password_does_not_override():
    from automated_data_pipeline_spark.sources.jdbc import (
        JdbcConfig,
        resolve_overrides,
    )

    base = JdbcConfig(host="h", port=1527, database="db",
                      user="u", password="secret")
    out = resolve_overrides(base, host="h2", password="")
    assert out.host == "h2"
    assert out.password == "secret"

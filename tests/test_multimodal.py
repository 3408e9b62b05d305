"""Multimodal plumbing + IVF similarity tests: the Spark-side machinery
(schemas, Arrow batches, cluster probing) is real; media decode is a
deterministic stub."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automated_data_pipeline_spark.operators import multimodal, similarity
from automated_data_pipeline_spark.suite import load

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


def test_extract_features_schema_and_determinism(spark):
    d = load(spark, SF, "documents").limit(50)
    media = multimodal.attach_fake_payload(d, "doc_id", "text")
    feats = multimodal.extract_features(media)
    assert dict(feats.dtypes) == {
        "media_id": "bigint",
        "media_type": "string",
        "n_bytes": "bigint",
        "payload_sha": "string",
        "feature": "array<float>",
        "byte_acc": "array<bigint>",
        "decode_ok": "boolean",
    }
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    assert all(len(r["feature"]) == 8 and r["decode_ok"] for r in rows.values())
    # byte_acc are the exact integer accumulators behind the feature:
    # feature[k] == round(byte_acc[k] / n_bytes, 6)
    for r in rows.values():
        n = max(r["n_bytes"], 1)
        assert r["feature"] == [
            pytest.approx(round(a / n, 6), abs=1e-6) for a in r["byte_acc"]
        ]
    # deterministic across runs
    again = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    some = next(iter(rows))
    assert rows[some]["feature"] == again[some]["feature"]
    assert rows[some]["payload_sha"] == again[some]["payload_sha"]


def test_feature_matches_python_oracle(spark):
    d = load(spark, SF, "documents").limit(5)
    media = multimodal.attach_fake_payload(d, "doc_id", "text")
    feats = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    for r in d.collect():
        expect = multimodal._fake_feature(r["text"].encode("utf-8"))
        got = feats[r["doc_id"]]
        assert got == pytest.approx(expect, abs=1e-4)


def test_resize_and_frame_sample_stubs(spark):
    d = load(spark, SF, "documents").limit(30)
    media = multimodal.attach_fake_payload(d, "doc_id", "text")
    resized = multimodal.resize_stub(media, 224, 224)
    r = resized.first()
    assert (r["width"], r["height"]) == (224, 224)
    assert resized.count() == 30

    frames = multimodal.frame_sample_stub(media, every_ms=500)
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert frames.count() == n_videos * 5
    one = frames.filter(F.col("frame_idx") == 2).first()
    assert one["offset_ms"] == 1000


def test_ivf_recall_vs_bruteforce(spark):
    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    brute = similarity.cosine_topk(e, q, k=5)
    ivf = similarity.ivf_topk(e, q, k=5, n_clusters=8, nprobe=8)  # nprobe=k -> exact
    b = {(r["qid"], r["vec_id"]) for r in brute.collect()}
    i = {(r["qid"], r["vec_id"]) for r in ivf.collect()}
    assert b == i  # probing every cluster must equal brute force
    # partial probe keeps decent recall
    ivf4 = similarity.ivf_topk(e, q, k=5, n_clusters=8, nprobe=4)
    i4 = {(r["qid"], r["vec_id"]) for r in ivf4.collect()}
    assert len(i4 & b) / len(b) >= 0.5


def test_rhp_multiprobe_improves_recall(spark):
    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    brute = {(r["qid"], r["vec_id"]) for r in similarity.cosine_topk(e, q, k=5).collect()}

    def recall(multiprobe):
        got = {
            (r["qid"], r["vec_id"])
            for r in similarity.rhp_lsh_topk(
                e, q, dim=64, k=5, n_planes=4, multiprobe=multiprobe
            ).collect()
        }
        return len(got & brute) / len(brute)

    # deterministic (hash-derived hyperplanes): 0.16 -> 0.56 on this corpus
    r0, r4 = recall(0), recall(4)
    assert r4 > r0  # probing neighbor buckets recovers missed neighbors
    assert r4 >= 0.4


def test_cosine_pandas_udf_matches_expression(spark):
    from automated_data_pipeline_spark.functions import vectors as V

    e = load(spark, SF, "embeddings").limit(100)
    pairs = e.alias("a").crossJoin(
        e.alias("b").selectExpr("vec_id AS vid2", "embedding AS emb2")
    ).filter(F.col("vec_id") + 1 == F.col("vid2"))
    both = pairs.select(
        "vec_id",
        F.round(V.cosine(F.col("embedding"), F.col("emb2")), 6).alias("expr_cos"),
        F.round(V.cosine_pandas_udf()(F.col("embedding"), F.col("emb2")), 6).alias("udf_cos"),
    )
    rows = both.collect()
    assert len(rows) > 50
    for r in rows:
        assert abs(r["expr_cos"] - r["udf_cos"]) < 1e-5

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

The Spark-side machinery (schemas, partition-sized batch iteration, UDF
signatures) is real and tested; the actual media decode is STUBBED —
the container ships no image/audio libraries — behind an import-try
with a deterministic fake featurizer, so the pipeline shape (what runs
where, what shuffles, what schema flows) is exactly what a production
deployment with PIL/torchaudio would run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, payload_sha string, "
    "feature array<float>, byte_acc array<long>, decode_ok boolean"
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test harness: derive an opaque binary payload + metadata from the
    documents fixture (UTF-8 bytes stand in for undecodable media)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _decode_image(payload: bytes) -> "object":
    """Real decode path — requires PIL, not present in this container."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - exercised in prod images
        raise NotImplementedError(
            "image decode requires Pillow; deterministic fake used instead"
        ) from exc


def _byte_acc(payload: bytes, dim: int = 8) -> list[int]:
    """Exact integer bucket accumulators of the byte histogram:
    acc[k] = sum of payload bytes at positions i with i % dim == k.
    Pure integer math — bit-identical across engines, so the driver's
    value-hash gate can verify the featurizer against a SQL oracle
    (the float ``_fake_feature`` is acc/n rounded, which no two engines
    format identically)."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    return acc


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: byte-histogram moments.
    Replaceable by a real model featurizer with the same signature."""
    if not payload:
        return [0.0] * dim
    acc = _byte_acc(payload, dim)
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas featurization: Arrow-batched binary payloads ->
    metadata + feature vectors. Partition-parallel; each batch is a
    pandas DataFrame so a real decoder would vectorize across the batch
    (or hand off to a GPU).
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "payload_sha": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda p: _fake_feature(p or b"")),
                    "byte_acc": payloads.map(lambda p: _byte_acc(p or b"")),
                    "decode_ok": payloads.map(lambda p: p is not None),
                }
            )
            yield out

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the same mapInPandas
    shape a real resize would use; stamps the target geometry (the
    decode/re-encode itself needs PIL — see _decode_image)."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(do_resize, schema=MEDIA_SCHEMA)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes each video payload into
    frame rows (frame extraction stubbed as offset markers)."""
    frames = df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(4))
        ).alias("frame_idx"),
    )
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("offset_ms"),
    )

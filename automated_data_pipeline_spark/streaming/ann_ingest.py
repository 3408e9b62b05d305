"""Streaming maintenance for the persisted IVF ANN index: replay-safe
ingest plus partition-directory compaction — the two pieces that turn
``operators/similarity.append_to_ivf_index`` (a raw parquet append,
NOT idempotent by itself) into something a 24/7 vector pipeline can
sit on.

Exactly-once: every appended row is stamped with its micro-batch key
(``{checkpoint}#{batch_id}`` — the ``incremental_dedup`` convention),
and only the FIRST batch after a (re)start probes the corpus for an
already-landed key (a crashed attempt is always the restart batch;
steady-state batches skip the probe job entirely). This covers
exactly Spark's recovery contract: committed batches never re-fire,
so the only possible replay is the last uncommitted batch — which IS
the first batch after the restart. Wholesale checkpoint deletion is
outside the contract (it reprocesses committed batches under reused
batch ids, of which only the first is probed); reprocess-from-scratch
belongs with a fresh index, same as the other stores. The probe is a
footer-only read at scale (parquet min/max stats on batch_key). For
schema consistency the BASE index must carry the column too —
``write_ivf_index_for_ingest`` stamps it ``'build'`` — because a
parquet directory mixing stamped and unstamped files would resolve to
whichever file the reader samples first.

Compaction: each ingest batch lands one small file per touched
``ivf_cluster=N`` directory, so a long-lived index accumulates
O(batches x clusters) tiny files. ``compact_ivf_index`` rewrites the
corpus to ``files_per_cluster`` files per directory (deterministic id
hash sub-split — no rand(), so a retried task writes the same rows)
under the same crash-self-healing two-rename swap as the stores; rows
and batch_key stamps are preserved, so replay probes keep working
across compactions and queries are value-identical (pytest-pinned).
At 100 TB this runs as a periodic job per hot partition range; here
it is one repartition + partitioned write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    append_to_ivf_index,
    append_to_ivfpq_index,
    write_ivf_index,
    write_ivfpq_index,
)
from .incremental_dedup import _has_parquet, _recover_compact


def write_ivf_index_for_ingest(
    assigned: DataFrame, centroids: DataFrame, path: str
) -> None:
    """``write_ivf_index`` with the build rows stamped
    ``batch_key='build'`` so later ingest batches (which MUST stamp
    their rows for replay detection) keep the corpus schema uniform."""
    write_ivf_index(
        assigned.withColumn("batch_key", F.lit("build")), centroids, path
    )


def write_ivfpq_index_for_ingest(
    encoded: DataFrame, cent_df: DataFrame, codebook_df: DataFrame,
    path: str,
) -> None:
    """``write_ivfpq_index`` with build rows stamped ``'build'`` —
    the IVF-PQ twin of ``write_ivf_index_for_ingest`` (the codes-only
    writer keeps the stamp column when present)."""
    write_ivfpq_index(
        encoded.withColumn("batch_key", F.lit("build")), cent_df,
        codebook_df, path,
    )


def start_incremental_ann_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    checkpoint_dir: str,
    schema: str = "vec_id bigint, embedding array<double>",
    vec_col: str = "embedding",
    available_now: bool = True,
    family: str = "ivf",
):
    """Wire a file-source vector stream into the persisted index:
    every file is a micro-batch assigned against the frozen
    quantizer(s) and appended (one zero-exchange Arrow pass + a
    partitioned append). ``family``: 'ivf' (full vectors resident)
    or 'ivfpq' (codes-only production layout — the batch additionally
    passes the frozen residual-codebook encode). Returns the started
    StreamingQuery."""
    appenders = {"ivf": append_to_ivf_index, "ivfpq": append_to_ivfpq_index}
    append = appenders[family]
    corpus_dir = f"{index_path}/corpus"
    maybe_replay = [True]

    def process(batch_df: DataFrame, batch_id: int):
        # a crash mid-compact leaves the corpus parked at '.old';
        # heal before probing/appending (queries via similarity.py
        # don't know about the swap, so recovery lives at the two
        # maintenance entry points: compact start and ingest)
        _recover_compact(corpus_dir)
        key = f"{checkpoint_dir}#{batch_id}"
        done = maybe_replay[0] and _has_parquet(corpus_dir) and bool(
            spark.read.parquet(corpus_dir)
            .filter(F.col("batch_key") == key)
            .take(1)
        )
        if not done:
            append(
                spark,
                index_path,
                batch_df.withColumn("batch_key", F.lit(key)),
                vec_col=vec_col,
            )
        maybe_replay[0] = False

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )
    writer = reader.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_ivf_index(
    spark: SparkSession, index_path: str, files_per_cluster: int = 1
) -> None:
    """Rewrite the ingest-grown corpus into ``files_per_cluster``
    files per ``ivf_cluster=N`` directory. Rows (including batch_key
    stamps) are preserved; not safe concurrently with an ingest; every
    crash window self-heals via ``_recover_compact`` exactly as the
    fingerprint/LSH/HLL/Bloom stores do."""
    import shutil

    corpus_dir = f"{index_path}/corpus"
    _recover_compact(corpus_dir)
    if not _has_parquet(corpus_dir):
        return
    df = spark.read.parquet(corpus_dir)
    if files_per_cluster <= 1:
        out = df.repartition(F.col("ivf_cluster"))
    else:
        # deterministic sub-split: same row -> same file slot on retry
        out = df.repartition(
            F.col("ivf_cluster"),
            F.pmod(F.xxhash64(*[c for c in df.columns if c != "ivf_cluster"]),
                   F.lit(files_per_cluster)),
        )
    tmp = corpus_dir.rstrip("/") + ".compact"
    out.write.mode("overwrite").partitionBy("ivf_cluster").parquet(tmp)
    old = corpus_dir.rstrip("/") + ".old"
    os.rename(corpus_dir, old)
    os.rename(tmp, corpus_dir)
    shutil.rmtree(old, ignore_errors=True)

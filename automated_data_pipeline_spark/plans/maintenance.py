"""Table-maintenance utilities: small-file compaction.

Every per-run append (`runner._write_stage`) lands one file set per
micro-batch/run; thousands of runs → thousands of small files per stage
table, and scan planning + footer reads start dominating. The fix is
periodic compaction: rewrite each partition's files into
size-targeted chunks. Mirrors what Delta OPTIMIZE / Iceberg rewrite
does; here it's explicit because stage tables are plain parquet.

Compaction is snapshot-safe for the stage tables because they're only
read per-run (`run_id` partition pruning) and rewritten partitions are
swapped directory-atomically (write temp, then os.replace).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # match spark.sql.files.maxPartitionBytes


def partition_file_stats(root: str) -> dict[str, tuple[int, int]]:
    """{partition_dir: (n_files, total_bytes)} for one level of
    Hive-style partitioning (``key=value`` subdirs)."""
    out: dict[str, tuple[int, int]] = {}
    for entry in sorted(os.listdir(root)):
        pdir = os.path.join(root, entry)
        if not (os.path.isdir(pdir) and "=" in entry):
            continue
        files = [
            f
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        out[entry] = (len(files), total)
    return out


def compact_partitioned_table(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    min_files: int = 4,
) -> int:
    """Rewrite every partition holding more than ``min_files`` files
    into ceil(total_bytes / target) files. Returns the number of
    partitions compacted. Each partition is rewritten to a temp dir and
    swapped in with os.replace — readers see old or new, never a mix."""
    compacted = 0
    for part, (n_files, total) in partition_file_stats(root).items():
        if n_files <= min_files:
            continue
        pdir = os.path.join(root, part)
        # DOT-prefixed siblings: Spark's file index skips '.'/'_'-led
        # names, so in-flight tmp/backup dirs are invisible to a
        # concurrent partitioned read (a name containing '=' would be
        # discovered as a bogus partition and double-read). Recovery
        # mirrors streaming's _recover_compact: a partition stranded at
        # the backup name (crash between the renames) moves back before
        # we touch it; stale debris is dropped.
        tmp = os.path.join(root, f".compact_tmp_{part}")
        old = os.path.join(root, f".compact_old_{part}")
        if os.path.isdir(old):
            if not os.path.isdir(pdir):
                os.rename(old, pdir)
            else:
                shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
        n_out = max(1, -(-total // target_file_bytes))  # ceil div
        df = spark.read.parquet(pdir)
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old, ignore_errors=True)
        compacted += 1
    return compacted


def cluster_write(
    df,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``:
    rows are range-partitioned on the leading column (so each output
    file owns a contiguous, near-disjoint key range) and sorted within
    files on the full column list (so every row group's min/max stats
    are tight).

    Why this matters at 100 TB: parquet readers prune at two levels
    below partition directories — per-file via footer min/max, per-row-
    group via the same stats — but only if writers co-locate key ranges.
    A hash-shuffled write scatters every key across every file and makes
    those stats useless (each file spans the whole domain). This is the
    plain-parquet analogue of Delta/Iceberg OPTIMIZE ZORDER for the
    single-column-prefix case; compose with ``partition_by`` date/run
    columns for the coarse level. Verified by
    tests/test_scale_plans.py::test_cluster_write_rowgroup_pruning,
    which reads the footers and checks range disjointness.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in cluster_cols]
    ranged = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    ranged.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def zorder_key(df, cols: list[str], bits: int = 16):
    """Morton (Z-order) interleave expression over 2+ numeric columns.

    Each column is linearly scaled to a ``bits``-bit integer using the
    frame's min/max (one small agg job), then the columns' bits are
    interleaved — points close in EVERY dimension get close keys, so a
    sort by the key co-locates rows for min/max pruning on ALL the
    dimensions at once, where ``cluster_write`` tightens only its
    leading column. The interleave is a pure column expression
    (constant bounds folded in) — whole-stage codegen, no UDF.

    Returns (df_with__zkey, key_column_name). Null dimension values
    scale to bucket 0.
    """
    from pyspark.sql import functions as F

    # interleaved bit positions must stay below the long sign bit:
    # position bits*n-1 must be <= 62, else the top bit lands on the
    # sign (negative keys sort FIRST, inverting the clustering) and
    # 5+ columns would wrap shifts mod 64 silently
    n_dims = len(cols)
    bits = min(bits, 62 // n_dims)
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).first()
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = bounds[f"_mn_{c}"], bounds[f"_mx_{c}"]
        if mn is None or mx is None:  # empty frame / all-null column
            mn, mx = 0.0, 0.0
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0),
                    ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
                     * F.lit(top)).cast("long"),
                ),
            )
        )
    key = F.lit(0).cast("long")
    n = len(cols)
    for bit in range(bits):
        for d, s in enumerate(scaled):
            key = key + F.shiftleft(
                F.shiftright(s, bit).bitwiseAND(F.lit(1)), bit * n + d
            )
    return df.withColumn("_zkey", key), "_zkey"


def zorder_write(
    df,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    bits: int = 16,
) -> None:
    """Multi-dimensional ``cluster_write``: range-partition + sort on
    the Morton key of ``cluster_cols`` so every file/row group holds a
    small hyper-rectangle of the key space — footer min/max stats then
    prune selective filters on ANY clustered dimension, not just the
    leading one (the plain-parquet analogue of Delta/Iceberg OPTIMIZE
    ZORDER). Verified by
    tests/test_scale_plans.py::test_zorder_write_prunes_both_dimensions.
    """
    keyed, key = zorder_key(df, cluster_cols, bits)
    ranged = (
        keyed.repartitionByRange(n_files, key)
        if n_files is not None
        else keyed.repartitionByRange(key)
    )
    (
        ranged.sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .parquet(path)
    )

"""Substring-level duplicate detection: find the maximal token spans
of each document that also occur elsewhere in the corpus (in another
document, or again in the same one).

This is the span-level complement to the whole/near-document dedup in
``operators/dedup.py``: document-level near-dup keeps one survivor per
cluster, while span-level detection finds boilerplate (headers,
license blocks, templated sentences) duplicated INSIDE otherwise
unique documents — the operation "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2022) performs with a suffix
array. The distributed construction here replaces the suffix array
with a hash-join, the standard Spark-first re-expression:

1. shingle: every k-token window of every document, keyed by position
   (one explode — rows ~ total tokens)
2. seed: hash each shingle (``stable_hash64`` — engine-portable) and
   keep positions whose shingle hash occurs >= 2 times globally (one
   groupBy count with map-side partials + one equi-join back; the
   duplicated-hash side is HAVING-filtered before the join, so at
   100 TB it is the small side and broadcasts)
3. merge: per document, merge overlapping/adjacent seed windows into
   maximal spans (gaps-and-islands with a running-max-end window,
   partitioned by doc — embarrassingly parallel, never a global sort)

A span of ``s`` merged seeds covers s + k - 1 tokens; every token in
an emitted span lies inside at least one duplicated k-gram.

Determinism: positions and counts are integers; the shingle hash is
md5-derived and replayed identically by the DuckDB oracle
(suite/round5b.py dup_span_detect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash64, tokens


def shingle_positions(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, pos, ghash) for every k-token window; pos is the 1-based
    token index of the window start. Documents shorter than k tokens
    emit nothing (the size guard also keeps ``sequence`` ascending —
    sequence(1, n) with n < 1 would default to a DESCENDING step)."""
    with_tokens = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_ws")
    ).filter(F.size("_ws") >= k)
    shingles = with_tokens.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_ws) - {k - 1}), "
                f"i -> struct(i AS pos, array_join(slice(_ws, i, {k}), ' ') AS g))"
            )
        ).alias("s"),
    ).select(id_col, F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    return shingles.select(
        id_col, "pos", stable_hash64(F.col("g")).alias("ghash")
    )


def segment_occurrences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seg_words: int = 5,
) -> DataFrame:
    """Tile each document into non-overlapping ``seg_words``-token
    segments (trailing partial included): one row per occurrence —
    (id_col, seg_idx, seg, seg_hash). Shared by the batch
    ``segment_dedup`` and the streaming incremental variant.

    Hash-spread on ``id_col`` first (same rationale as
    ``duplicated_spans``): the tokenize+md5 work is the CPU-heavy step
    and a few-row-group input would otherwise serialize it through a
    handful of tasks — AQE cannot split a scan's partitioning. The
    split is materialized ONCE in a projection: referencing the column
    inside the transform lambda is O(1) per segment, while inlining
    split(text) into each slice() would re-split the document once per
    segment."""
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    )
    toked = spread.select(id_col, F.split(F.col(text_col), " ").alias("_ws"))
    n_segs = F.ceil(F.size("_ws") / F.lit(seg_words)).cast("int")
    segs = F.when(
        F.size("_ws") > 0,
        F.transform(
            F.sequence(F.lit(0), n_segs - 1),
            lambda i: F.array_join(
                F.slice("_ws", i * seg_words + 1, seg_words), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(
        id_col, F.posexplode(segs).alias("seg_idx", "seg")
    ).select(
        id_col,
        F.col("seg_idx").cast("bigint").alias("seg_idx"),
        "seg",
        stable_hash64(F.col("seg")).alias("seg_hash"),
    )


def segment_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seg_words: int = 5,
) -> DataFrame:
    """C4-style corpus-wide segment dedup: tile each document into
    NON-overlapping ``seg_words``-token segments (the trailing partial
    segment included) and keep exactly ONE occurrence of each distinct
    segment text corpus-wide — the occurrence with the smallest
    (``id_col``, segment index). C4 ("Exploring the Limits of Transfer
    Learning…", Raffel et al. 2020, §2.2) applies this rule to
    three-sentence spans; this corpus has no sentence boundaries so the
    tile is a fixed token window, same survivor semantics.

    Output: (id_col, seg_idx, seg_hash, keep) — one row per segment
    occurrence, ``keep`` false for every occurrence shadowed by an
    earlier one. Callers rebuild the deduplicated text by re-joining
    kept segments in seg_idx order, or aggregate for removal stats.

    Plan shape (the 100 TB contract): one explode (rows ~ tokens /
    seg_words), then an EXPLICIT hash-repartition on the 64-bit
    segment hash — both the survivor aggregation and the join-back
    consume that same exchange, so Spark's ReuseExchange turns the
    self-join into a single scan+tokenize pass (verified in the
    physical plan: one Scan, one ReusedExchange) instead of computing
    the segment table twice. The survivor is ``min(struct(id,
    seg_idx))`` — an order-free aggregate with map-side partials,
    never a global sort or window, so a boilerplate segment duplicated
    across millions of documents is collapsed by partial aggregation
    rather than landing on one reducer. The segment text itself never
    shuffles: only its ``stable_hash64`` (md5-derived, replayed
    identically by the DuckDB oracle) is carried past the explode."""
    occ = (
        segment_occurrences(df, text_col, id_col, seg_words)
        .drop("seg")
        .repartition("seg_hash")
    )
    surv = occ.groupBy("seg_hash").agg(
        F.min(F.struct(id_col, "seg_idx")).alias("_first")
    )
    return occ.join(surv, "seg_hash").select(
        id_col,
        "seg_idx",
        "seg_hash",
        (
            (F.col(id_col) == F.col(f"_first.{id_col}"))
            & (F.col("seg_idx") == F.col("_first.seg_idx"))
        ).alias("keep"),
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    broadcast_dups: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Output: (id_col, span_start, span_end, span_tokens, n_seeds) with
    token positions 1-based inclusive; span_tokens = span_end -
    span_start + 1; n_seeds = number of duplicated k-gram windows
    merged into the span.

    Plan shape: the input is hash-spread on ``id_col`` first — the
    tokenize+md5 shingle work is the CPU-heavy step, and a small
    single-row-group file would otherwise serialize it through one
    task (at 100 TB the many input splits make this exchange a cheap
    even-out; it ALSO pre-partitions by doc so the island windows
    plan with no further Exchange). With ``broadcast_dups`` (default)
    the HAVING-filtered duplicated-hash side — the small minority of
    shingles — broadcasts into the seed join, preserving that doc
    partitioning; pass False if boilerplate is so pervasive the dup
    set itself is huge, and the join falls back to a shuffle."""
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    )
    sh = shingle_positions(spread, text_col, id_col, k)
    dup_hashes = (
        sh.groupBy("ghash")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("ghash")
    )
    if broadcast_dups:
        dup_hashes = F.broadcast(dup_hashes)
    seeds = sh.join(dup_hashes, "ghash").select(
        id_col, "pos", (F.col("pos") + F.lit(k - 1)).alias("end_pos")
    )
    # gaps-and-islands: a seed starts a new span iff it begins after
    # the running max end of all previous seeds (+1 keeps abutting
    # windows merged — the covered token range is contiguous)
    prev_end = F.max("end_pos").over(
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = seeds.withColumn(
        "new_span",
        F.when(
            F.col("pos") > F.coalesce(prev_end, F.lit(-(10 ** 9))) + 1, 1
        ).otherwise(0),
    )
    island = F.sum("new_span").over(
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("island", island)
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end_pos").alias("span_end"),
            F.count(F.lit(1)).alias("n_seeds"),
        )
        .select(
            id_col,
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("bigint")
            .alias("span_tokens"),
            F.col("n_seeds").cast("bigint").alias("n_seeds"),
        )
    )

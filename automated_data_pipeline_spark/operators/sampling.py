"""Deterministic sampling operators for corpus rebalancing.

Rate-based stratified sampling (keep X% of a stratum) lives in the
query suite as a pure filter — no shuffle at all. This module holds the
*cap*-based variant: keep at most K rows per group, the op behind
"at most N documents per domain" rebalancing rules. Hash-ordered, so
the sample is reproducible run-to-run and engine-portable (the DuckDB
oracle replays the same md5-derived order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as TX


def capped_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    seed: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, selected by ascending
    stable hash of the id — a deterministic uniform draw without a
    random state.

    Plan: one shuffle on ``group_col`` feeding a rank window; rows
    ranked past the cap are filtered before any downstream exchange.
    The sort is per-group and spill-aware, so a hot group degrades to
    disk, not OOM — but it still lands on ONE reducer (window
    partitions don't split; AQE skew-join doesn't apply to windows).
    For corpora where one group holds a double-digit share of all rows,
    first knock the group down with a rate filter (stratified hash
    sample) sized so cap-selection sees a bounded residue, then apply
    the cap — both stages stay deterministic because both draw from the
    same hash order.
    """
    h = TX.stable_hash64(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the context-window chunking step of a pretraining/RAG pipeline.
    Returns (id, chunk_id, n_tokens, chunk_text): chunk k covers
    tokens [1 + k*step, 1 + k*step + chunk_tokens) with
    step = chunk_tokens - overlap; the final chunk may be short; empty
    documents yield no chunks.

    Entirely JVM-side array expressions (split -> sequence -> explode
    -> slice -> join): one narrow pass, no UDF, no shuffle — chunking
    100 TB is embarrassingly parallel and this plan keeps it that way.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col).alias("id"), TX.tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("_n"), F.lit(1)), F.lit(step)
    )
    chunked = (
        toks.filter(F.col("_n") > 0)
        .select("id", "_toks", F.posexplode(starts).alias("chunk_id", "_start"))
        .select(
            "id",
            "chunk_id",
            F.slice("_toks", F.col("_start"), F.lit(chunk_tokens)).alias("_chunk"),
        )
    )
    return chunked.select(
        "id",
        "chunk_id",
        F.size("_chunk").alias("n_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )

"""Fuzzy entity resolution: typo-tolerant key matching at scale.

Finds pairs of records whose fixed-length string keys differ in at
most one character (Hamming distance <= 1 — the single-mistyped-digit
/ single-OCR-error class) WITHOUT an all-pairs comparison, using
masked-position blocking (the symmetric-delete idea behind SymSpell /
FastSS, public domain): each key of length L emits L variants with one
position masked out; two keys at Hamming distance <= 1 necessarily
share the variant masked at their differing position (identical keys
share all L). An equi-join on (masked_position, masked_key) therefore
yields EXACTLY the Hamming<=1 candidate set — no hot blocks, unlike
half-split pigeonhole blocking, which degenerates when keys share a
long common prefix (e.g. zero-padded ids, where the high half is a
single giant block).

Cost: L× row expansion on the masked side, one equi-join, then an
exact ``levenshtein`` verify on the (small) candidate set. At 100 TB
the expansion is map-local and the join shuffles on a well-spread
(position, masked) key.

Extends the reference's surface (its upsert matches keys exactly —
java_code MERGE semantics, SURVEY.md §2.4 J3); this is the fuzzy
variant a dedup/ER pass over scraped entities needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MASK = "§"  # section sign: never appears in the keys being masked


def masked_variants(df: DataFrame, key_col: str, length: int) -> DataFrame:
    """Explode each row into ``length`` rows with columns (mpos,
    mkey): the key with character ``mpos`` (1-based) replaced by the
    mask character."""
    return df.select(
        "*",
        F.explode(F.expr(f"sequence(1, {length})")).alias("mpos"),
    ).withColumn(
        "mkey",
        F.expr(
            f"concat(substr({key_col}, 1, mpos - 1), '{MASK}', "
            f"substr({key_col}, mpos + 1))"
        ),
    )


def hamming1_pairs(
    df: DataFrame, key_col: str, id_col: str, length: int
) -> DataFrame:
    """All pairs (id_1 < id_2) whose ``key_col`` values (of exactly
    ``length`` chars) are at Levenshtein distance <= 1, via
    masked-position blocking + exact verify.

    Output: (id_1, id_2, key_1, key_2, dist). dist = 0 marks exact
    duplicate keys under distinct ids."""
    base = df.select(
        F.col(id_col).alias("_id"), F.col(key_col).alias("_key")
    ).filter(F.length("_key") == length)
    v = masked_variants(base, "_key", length)
    a = v.select(
        F.col("_id").alias("id_1"), F.col("_key").alias("key_1"),
        "mpos", "mkey",
    )
    b = v.select(
        F.col("_id").alias("id_2"), F.col("_key").alias("key_2"),
        "mpos", "mkey",
    )
    cand = (
        a.join(b, ["mpos", "mkey"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "key_1", "key_2")
        .distinct()  # Hamming-0 pairs collide at every masked position
    )
    return cand.select(
        "*", F.levenshtein("key_1", "key_2").cast("int").alias("dist")
    ).filter(F.col("dist") <= 1)

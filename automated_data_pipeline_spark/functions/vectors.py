"""Vector expressions over ``array<float>`` embedding columns.

Built-in higher-order functions only (zip_with + aggregate): the dot
product folds in ascending index order with double accumulation, which
is deterministic and engine-portable (the DuckDB oracle reproduces it
with an index-ordered sum). For very wide vectors or huge batches a
Pandas-UDF path would win on constant factors; at 64-dim the JVM
expression path avoids the Python worker hop entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded for cross-engine determinism (float inputs, double
    accumulation: last-bit divergence is possible engine-to-engine;
    6 digits is far above the noise floor)."""
    return F.round(cosine(a, b), digits)

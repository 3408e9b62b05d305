"""Truly-empty DataFrames the optimizer can SEE are empty.

``spark.createDataFrame([], schema)`` parallelizes an RDD, so the plan
is a LogicalRDD — not provably empty. Two costs follow (r14
measurement):

- ``PropagateEmptyRelation`` cannot fire, so a fresh store's empty
  frame keeps its consumers alive: the first micro-batch's anti-join
  against an empty store executes as a REAL join over the whole batch
  pipeline instead of collapsing to the batch itself (measured: the
  incremental-dedup bench 6.8 s -> 2.7 s min-of-6 once the join
  collapses).
- any take()-style probe over it schedules real (empty) tasks —
  measured 5.9 s for a first take(1) vs 0.03 s on a LocalRelation,
  which answers driver-side with zero jobs.

r13's mitigation (``coalesce(1)``) only reduced the probe's empty
partitions; it still blocked empty-relation propagation — this helper
replaces it engine-wide. ``range(1).select(NULL casts).where(false)``
is folded by the optimizer (PruneFilters + PropagateEmptyRelation)
into an empty ``LocalRelation`` with the exact requested schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def empty_local_frame(spark: SparkSession, schema: str) -> DataFrame:
    """An empty frame with the given DDL ``schema`` that the optimizer
    provably knows is empty (LocalRelation, not an RDD scan)."""
    st = StructType.fromDDL(schema)
    cols = [
        F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields
    ]
    return spark.range(1).select(*cols).where(F.lit(False))

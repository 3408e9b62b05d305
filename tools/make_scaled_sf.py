"""Build a scaled-up copy of a fixture SF directory for scale
validation (VERDICT r5 item 3): facts ×N, dims kept.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10

Scaling design — each replica k is an INDEPENDENT universe, so the
distributional shape that drives plan choice at sf0.1 is preserved
exactly while volume grows ×N:
- orders/lineitem: o_orderkey/l_orderkey offset by k·key_span;
  customer/part/supplier FKs unchanged (facts-per-dim grows ×N — the
  usual way a warehouse actually grows against slowly-changing dims)
- events: event_id offset; user_id offset by k·user_span (per-user
  session/window structure identical, global hourly density ×N)
- documents: doc_id offset; every whitespace token gets a per-replica
  suffix for k>0, so shingle sets NEVER collide across replicas —
  the near-dup/cluster structure of sf0.1 is replicated ×N instead of
  degenerating into one giant everything-matches-everything cluster
- embeddings: vec_id offset; the vector is cyclically rotated by k
  positions (norms and coordinate distribution identical, replicas
  decorrelated)
- region/nation/customer/supplier/part: copied as-is

This is a perf/scale fixture only; the correctness gate stays on the
driver-generated SFs.

Layout pin (VERDICT r12 item 6): every FACT table is written as
exactly FACT_FILES part files (repartition before write), dims as one.
Three rounds of noise adjudications (run_number_backfill r8/r9, zipf
r11, cosine_topk r12) traced to a rebuild landing a fact as ONE part
file and serializing first stages; a pinned layout makes cross-round
scale_diff compare like-for-like, and tools/scale_validation.py
asserts + records the per-table file counts in its preamble.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# Pinned part-file count for fact tables (dims land as one file).
FACT_FILES = 32
DIMS = frozenset({"region", "nation", "customer", "supplier", "part"})


def scale_table(spark, src: str, dst: str, table: str, factor: int) -> int:
    from automated_data_pipeline_spark.suite import load

    df = load(spark, src, table)
    out_path = f"{dst}/{table}.parquet"
    if table in DIMS or factor <= 1:
        df.coalesce(1).write.mode("overwrite").parquet(out_path)
        return df.count()

    reps = spark.range(factor).withColumnRenamed("id", "_k")
    x = df.crossJoin(F.broadcast(reps))
    if table == "orders":
        span = df.agg(F.max("o_orderkey")).first()[0] + 1
        x = x.withColumn("o_orderkey", F.col("o_orderkey") + F.col("_k") * span)
    elif table == "lineitem":
        span = df.agg(F.max("l_orderkey")).first()[0] + 1
        x = x.withColumn("l_orderkey", F.col("l_orderkey") + F.col("_k") * span)
    elif table == "events":
        espan = df.agg(F.max("event_id")).first()[0] + 1
        uspan = df.agg(F.max("user_id")).first()[0] + 1
        x = x.withColumn("event_id", F.col("event_id") + F.col("_k") * espan)
        x = x.withColumn("user_id", F.col("user_id") + F.col("_k") * uspan)
    elif table == "documents":
        span = df.agg(F.max("doc_id")).first()[0] + 1
        x = x.withColumn("doc_id", F.col("doc_id") + F.col("_k") * span)
        # per-replica token suffix (replica 0 keeps the original bytes)
        x = x.withColumn(
            "text",
            F.when(F.col("_k") == 0, F.col("text")).otherwise(
                F.expr(r"regexp_replace(text, '(\\S+)', concat('$1q', _k))")
            ),
        )
        x = x.withColumn("n_chars", F.length("text").cast("long"))
    elif table == "embeddings":
        span = df.agg(F.max("vec_id")).first()[0] + 1
        x = x.withColumn("vec_id", F.col("vec_id") + F.col("_k") * span)
        dim = len(df.select("embedding").first()[0])
        rot = F.col("_k") % F.lit(dim)
        x = x.withColumn(
            "embedding",
            F.when(rot == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.expr(f"slice(embedding, cast(_k % {dim} as int) + 1, "
                           f"{dim} - cast(_k % {dim} as int))"),
                    F.expr(f"slice(embedding, 1, cast(_k % {dim} as int))"),
                )
            ),
        )
    x = x.drop("_k").select(*df.columns)
    # pinned layout: exactly FACT_FILES part files regardless of the
    # upstream stage structure (one-file rebuilds serialized first
    # stages in three prior rounds' sweeps)
    x.repartition(FACT_FILES).write.mode("overwrite").parquet(out_path)
    return x.count()


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from automated_data_pipeline_spark.session import get_spark

    spark = get_spark("make-scaled-sf")
    os.makedirs(dst, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        n = scale_table(spark, src, dst, t, factor)
        print(f"{t}: {n} rows -> {dst}/{t}.parquet", flush=True)


if __name__ == "__main__":
    main()

"""Distributed Okapi BM25 retrieval scoring.

The reference engine has no retrieval operator — this belongs to the
LLM-pipeline extension family (training-data curation needs lexical
retrieval for decontamination probes, hard-negative mining, and
seed-query corpus slicing). Standard Robertson/Walker BM25:

    score(q, d) = sum over t in q of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)      # Lucene form

Scale shape (the plan you'd want at 100 TB):
- ONE tokenize pass over the corpus feeds everything: the (doc, term)
  tf aggregate, the per-doc length table (sum of tf per doc — no
  second text scan), and the df table (rows-per-term of tf).
- The df table is vocabulary-sized and the query-term table is tiny:
  both broadcast. The corpus side never shuffles on raw text.
- Scoring is vocabulary-pruned: only (doc, term) rows whose term
  appears in some query are scored (inner join against the broadcast
  query table), so the shortlist is |matching postings|, not N×|q|.
- The final top-k is a per-query window over the scored shortlist.

Cross-engine determinism: integer tf/dl/df/N keep avgdl = SUM(int)/N
exact; idf and the saturation term are fixed-order IEEE expressions
written identically in the DuckDB oracle; per-(query, doc) scores are
rounded AFTER the term sum and ranked on the rounded value with a
doc_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def bm25_top_docs(
    spark: SparkSession,
    docs: DataFrame,
    queries: dict[int, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    checkpoint: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    ``queries`` maps query_id -> list of (already-normalized) terms.
    Returns (query_id, doc_id, score, rnk) with score rounded to 6
    decimals and rnk a dense 1..k row_number on (score desc, doc_id).
    ``checkpoint=False`` skips the result materialization (plan tests
    need the visible lineage; callers that re-use the result want the
    default eager checkpoint so the postings table can unpersist).
    """
    # hash-spread before the tokenize+explode (the r7 one-file-scan
    # lesson): a compact corpus file otherwise tokenizes on one task.
    spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, id_col
    )
    toks = spread.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TX.tokens(F.col(text_col))).alias("term"),
    )
    # tf feeds the length table, the df table, and the scored join —
    # persist so the corpus tokenize+aggregate executes once (at
    # cluster scale this is the checkpointed postings table).
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("tok_total"),
    )

    qrows = [
        (int(qid), t) for qid, terms in sorted(queries.items()) for t in terms
    ]
    qdf = spark.createDataFrame(qrows, "query_id int, term string")

    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("tok_total") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    per_term = scored.select(
        "query_id", "doc_id", (idf * sat).alias("s")
    )
    agg = per_term.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("s"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    result = (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "doc_id", "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
    if not checkpoint:
        return result
    out = result.localCheckpoint(eager=True)
    tf.unpersist()
    return out


def bm25_oracle_sql(
    queries: dict[int, list[str]],
    words_sql: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """The DuckDB twin of :func:`bm25_top_docs` — same tokenize
    convention (``words_sql``), same fixed-order score expression."""
    values = ", ".join(
        f"({int(qid)}, '{t}')"
        for qid, terms in sorted(queries.items())
        for t in terms
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({words_sql}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS tok_total FROM dl),
    q(query_id, term) AS (VALUES {values}),
    scored AS (
      SELECT q.query_id, tf.doc_id,
        ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
          * ((tf.tf * {k1 + 1.0}) / (tf.tf + {k1} * ({1.0 - b} + {b}
              * dl.dl / (stats.tok_total * 1.0 / stats.n_docs)))) AS s
      FROM tf
      JOIN q USING (term)
      JOIN dl USING (doc_id)
      JOIN dfq USING (term)
      CROSS JOIN stats
    ),
    agg AS (
      SELECT query_id, doc_id, round(sum(s), 6) AS score
      FROM scored GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS rnk
      FROM agg
    )
    SELECT query_id, doc_id, score, rnk FROM ranked WHERE rnk <= {k}
    """

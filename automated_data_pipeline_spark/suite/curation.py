"""Round-4 corpus-curation additions: SemDeDup-style semantic dedup,
Gopher-style repetition filters, cross-document n-gram repetition
(the ExactSubstr signal), nearest-centroid assignment, the
tokenizer-vocabulary coverage curve, and the data-quality expectation
report (operators/quality.py).

These extend the LLM-pipeline surface (BASELINE.json mandate) with the
curation signals a 100 TB training-data pipeline runs between raw
ingest and tokenization. Reference has no analogue (it is an ETL
orchestrator — see SURVEY.md §2.9); the semantics here follow the
published recipes: SemDeDup (Abbas et al. 2023, within-cluster cosine
pruning), Gopher repetition rules (Rae et al. 2021 §A1.1), and exact
substring dedup (Lee et al. 2022) approximated at the 5-gram level.

Cross-engine determinism: ratios are single IEEE divisions of integer
counts rounded to a fixed precision; cosines use the shared
sequential-fold ``vectors.cosine_rounded``; centroids reuse the
decimal-exact partial-sum recipe from ``label_centroids``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import similarity
from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name, oracle, doc=""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


_WORDS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"

# zero-norm guard mirrors the Spark side's cosine_rounded_safe: without
# it DuckDB yields 0/0 = NaN, and NaN >= tau is TRUE under DuckDB's
# NaN-sorts-greatest semantics — the engines would disagree on
# degenerate vectors
_COS_SQL = (
    "(CASE WHEN (SELECT sum(CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)) = 0"
    "   OR (SELECT sum(CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)) = 0"
    " THEN 0.0 ELSE "
    "round((SELECT sum(CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)) FROM range(1,65) t(i))"
    " / (sqrt((SELECT sum(CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))"
    "  * sqrt((SELECT sum(CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))), 6) END)"
)


# --------------------------------------------------------------------
@spec(
    "semdedup_prune",
    f"""
    WITH pruned AS (
      SELECT DISTINCT b.vec_id
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_COS_SQL} >= 0.25
    )
    SELECT e.vec_id, e.label,
           CASE WHEN p.vec_id IS NULL THEN true ELSE false END AS survives
    FROM embeddings e LEFT JOIN pruned p ON e.vec_id = p.vec_id
    """,
    "SemDeDup: within-cluster (label = cluster id) pairwise cosine; a "
    "vector is pruned when a lower-id cluster-mate has cosine >= 0.25. "
    "Scale path: clusters come from the IVF coarse quantizer, so the "
    "pairwise join is confined to one cluster's rows — never an "
    "all-pairs product; the equi-join on the cluster key is one "
    "shuffle and AQE handles cluster-size skew",
)
def semdedup_prune(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        e, id_col="vec_id", vec_col="embedding", cluster_col="label",
        threshold=0.25,
    )


# --------------------------------------------------------------------
@spec(
    "gopher_repetition",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    u AS (SELECT doc_id, unnest(ws) AS tok FROM w),
    wc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
    wt AS (SELECT doc_id, max(c) AS maxw, sum(c) AS total FROM wc GROUP BY 1),
    bg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
      FROM w, unnest(range(1, len(ws))) t(i) WHERE len(ws) >= 2
    ),
    bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
    bt AS (SELECT doc_id, max(c) AS maxb, sum(c) AS total FROM bc GROUP BY 1)
    SELECT wt.doc_id,
           CAST(wt.total AS BIGINT) AS n_words,
           CAST(round(wt.maxw * 1.0 / wt.total, 4) AS DOUBLE) AS top_word_frac,
           CAST(round(coalesce(bt.maxb * 1.0 / bt.total, 0.0), 4) AS DOUBLE) AS top_bigram_frac,
           (wt.maxw * 1.0 / wt.total <= 0.125
            AND coalesce(bt.maxb * 1.0 / bt.total, 0.0) <= 0.05) AS gopher_pass
    FROM wt LEFT JOIN bt ON wt.doc_id = bt.doc_id
    """,
    "Gopher-style repetition filters (Rae et al. 2021 §A1.1 adapted to "
    "single-line docs): most-common-word fraction and most-common-"
    "bigram fraction per document, plus the pass/fail flag. Plan: one "
    "tokenize scan feeds both explode streams; each is a two-level "
    "agg (map-side partial on (doc, gram) then per-doc max/sum) — "
    "raw text never shuffles, gram streams do with partial aggs",
)
def gopher_repetition(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX.tokens(F.col("text")).alias("ws"))
    words = toks.select("doc_id", F.explode("ws").alias("tok"))
    wt = (
        words.groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("maxw"), F.sum("count").alias("total"))
    )
    grams = toks.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.concat(
                    F.element_at("ws", i), F.lit(" "), F.element_at("ws", i + 1)
                ),
            )
        ).alias("g"),
    )
    bt = (
        grams.groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("maxb"))
    )
    wfrac = F.col("maxw") / F.col("total")
    bfrac = F.coalesce(F.col("maxb") / (F.col("total") - 1), F.lit(0.0))
    return (
        wt.join(bt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("total").cast("bigint").alias("n_words"),
            F.round(wfrac, 4).cast("double").alias("top_word_frac"),
            F.round(bfrac, 4).cast("double").alias("top_bigram_frac"),
            ((wfrac <= 0.125) & (bfrac <= 0.05)).alias("gopher_pass"),
        )
    )


# --------------------------------------------------------------------
@spec(
    "cross_doc_ngram_repetition",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    g5 AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(ws) - 3),
               i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS gs
      FROM w WHERE len(ws) >= 5
    ),
    u AS (SELECT doc_id, unnest(gs) AS g FROM g5),
    d AS (SELECT g, count(*) AS ndocs FROM u GROUP BY 1),
    j AS (
      SELECT u.doc_id, count(*) AS total,
             sum(CASE WHEN d.ndocs >= 2 THEN 1 ELSE 0 END) AS shared
      FROM u JOIN d USING (g) GROUP BY 1
    )
    SELECT doc_id, CAST(total AS BIGINT) AS n_grams5,
           CAST(round(shared * 1.0 / total, 4) AS DOUBLE) AS shared_frac
    FROM j
    """,
    "Cross-document repetition (the ExactSubstr dedup signal, Lee et "
    "al. 2022, at 5-gram granularity): per doc, the fraction of its "
    "distinct 5-grams that occur in at least one OTHER document. "
    "shared_frac 1.0 = fully contained in the rest of the corpus. "
    "Plan: distinct-per-doc grams explode once; (gram -> ndocs) is a "
    "count(*) agg (per-doc distinctness makes count = doc frequency, "
    "no count-distinct state); join back on gram and per-doc agg — "
    "two shuffles total, both with map-side partials; raw text never "
    "shuffles",
)
def cross_doc_ngram_repetition(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # materialize the token array in its own projection FIRST: a lambda
    # that references the raw tokens(text) EXPRESSION re-runs the whole
    # split per element access (5 accesses x ~50 grams/doc = the scan
    # re-tokenizes each doc ~250x — measured 14.5s -> sub-second at
    # sf0.1 for this exact query)
    ws = F.col("ws")
    g5 = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 4),
            lambda i: F.concat_ws(
                " ",
                F.element_at(ws, i), F.element_at(ws, i + 1),
                F.element_at(ws, i + 2), F.element_at(ws, i + 3),
                F.element_at(ws, i + 4),
            ),
        )
    )
    u = (
        d.select("doc_id", TX.tokens(F.col("text")).alias("ws"))
        .filter(F.size(ws) >= 5)
        .select("doc_id", F.explode(g5).alias("g"))
        .persist()
    )
    ndocs = u.groupBy("g").agg(F.count(F.lit(1)).alias("ndocs"))
    out = (
        u.join(ndocs, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams5"),
            F.round(
                F.sum((F.col("ndocs") >= 2).cast("int")) / F.count(F.lit(1)), 4
            ).cast("double").alias("shared_frac"),
        )
    )
    res = out.localCheckpoint(eager=True)
    u.unpersist()
    return res


# --------------------------------------------------------------------
@spec(
    "nearest_centroid_assign",
    """
    WITH u AS (
      SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(embedding[generate_subscripts(embedding, 1)] AS DECIMAL(18,9)) AS v
      FROM embeddings
    ),
    c AS (
      SELECT label AS c_label, dim,
             CAST(round(sum(v) / count(*), 6) AS DOUBLE) AS centroid
      FROM u GROUP BY 1, 2
    ),
    ca AS (
      SELECT c_label, list_transform(
               list_sort(list(struct_pack(dim := dim, centroid := centroid))),
               r -> r.centroid) AS cvec
      FROM c GROUP BY 1
    ),
    dist AS (
      SELECT e.vec_id, e.label,
             ca.c_label AS cand,
             round((SELECT sum(pow(CAST(e.embedding[i] AS DOUBLE) - ca.cvec[i], 2))
                    FROM range(1, 65) t(i)), 6) AS d2
      FROM embeddings e CROSS JOIN ca
    ),
    pick AS (
      SELECT vec_id, label, cand,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cand) AS rn
      FROM dist
    )
    SELECT label AS true_label, cand AS assigned_label,
           CAST(count(*) AS BIGINT) AS n
    FROM pick WHERE rn = 1 GROUP BY 1, 2
    """,
    "Nearest-centroid assignment (the classify half of label_centroids"
    "): per-label decimal-exact centroids, then each vector is "
    "assigned to the centroid with the smallest squared L2 distance "
    "(distance rounded to 6, centroid-label tie-break) — output is "
    "the (true label x assigned label) confusion matrix. Plan: "
    "centroids are tiny (labels x dims) and BROADCAST to the vector "
    "scan; the distance fold is a sequential per-row array reduce "
    "(deterministic, codegen); one final small-key agg",
)
def nearest_centroid_assign(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    u = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.col("v").cast("decimal(18,9)").alias("v"),
    )
    cent = u.groupBy("label", "dim").agg(
        F.round(F.sum("v") / F.count(F.lit(1)), 6).cast("double").alias("centroid")
    )
    cvec = (
        cent.groupBy(F.col("label").alias("cand"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "centroid"))),
                lambda r: r["centroid"],
            ).alias("cvec")
        )
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("cvec"),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    dist = e.crossJoin(F.broadcast(cvec)).select(
        "vec_id", "label", F.col("cand"), d2.alias("d2")
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy("d2", "cand")
    )
    pick = dist.withColumn("rn", rn).filter(F.col("rn") == 1)
    return pick.groupBy(
        F.col("label").alias("true_label"),
        F.col("cand").alias("assigned_label"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


# --------------------------------------------------------------------
@spec(
    "vocab_coverage",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    u AS (SELECT unnest(ws) AS tok FROM w),
    c AS (SELECT tok, count(*) AS freq FROM u GROUP BY 1),
    t AS (SELECT sum(freq) AS total FROM c),
    r AS (SELECT tok, freq,
                 row_number() OVER (ORDER BY freq DESC, tok) AS rank
          FROM c)
    SELECT r.tok AS token, CAST(r.rank AS BIGINT) AS rank,
           CAST(r.freq AS BIGINT) AS freq,
           CAST(round(sum(r.freq) OVER (ORDER BY r.rank) * 1.0 / t.total, 6)
                AS DOUBLE) AS cum_share
    FROM r CROSS JOIN t WHERE r.rank <= 100
    """,
    "Tokenizer-vocabulary coverage curve: corpus-wide token "
    "frequencies, ranked, with the cumulative share of all token "
    "occurrences covered by the top-k vocabulary — the "
    "how-big-must-the-vocab-be curve a tokenizer build starts from. "
    "Plan: one explode + count agg (map-side partials), scalar total "
    "broadcast, TOP-100 via orderBy+limit (TakeOrderedAndProject: "
    "distributed per-partition top-k, driver merge), and the rank + "
    "cumulative windows run over the <= 100 survivors only — no "
    "global window ever sees the full vocabulary",
)
def vocab_coverage(spark, sf_dir):
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    c = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    total = c.agg(F.sum("freq").alias("total"))
    # top-100 FIRST via orderBy+limit (TakeOrderedAndProject — a
    # distributed per-partition top-k + driver merge), THEN rank the
    # <=100 survivors; ranking the full vocabulary with a global
    # row_number window would funnel every distinct token through one
    # WindowExec partition
    top = c.orderBy(F.col("freq").desc(), F.col("tok")).limit(100)
    r = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("tok"))
        ),
    )
    cum = F.sum("freq").over(
        Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        r.crossJoin(F.broadcast(total))
        .select(
            F.col("tok").alias("token"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("freq").cast("bigint").alias("freq"),
            F.round(cum / F.col("total"), 6).cast("double").alias("cum_share"),
        )
    )


# --------------------------------------------------------------------
@spec(
    "data_quality_report",
    """
    WITH o AS (
      SELECT 'orders' AS table_name, check_name, n_rows, n_violations,
             CAST(round(n_violations * 1.0 / n_rows, 6) AS DOUBLE) AS violation_rate
      FROM (
        SELECT unnest(['not_null(o_orderkey)', 'range(o_totalprice <= 400000)',
                       'fresh(o_orderdate >= 1993-01-01)']) AS check_name,
               unnest([CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT),
                       CAST(count(*) FILTER (o_totalprice > 400000) AS BIGINT),
                       CAST(count(*) FILTER (o_orderdate < DATE '1993-01-01') AS BIGINT)]) AS n_violations,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders
      )
    ),
    l AS (
      SELECT 'lineitem' AS table_name, check_name, n_rows, n_violations,
             CAST(round(n_violations * 1.0 / n_rows, 6) AS DOUBLE) AS violation_rate
      FROM (
        SELECT unnest(['range(l_discount in [0, 0.08])', 'positive(l_quantity)']) AS check_name,
               unnest([CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.08) AS BIGINT),
                       CAST(count(*) FILTER (l_quantity <= 0) AS BIGINT)]) AS n_violations,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
      )
    ),
    u AS (
      SELECT 'lineitem' AS table_name,
             'unique(l_orderkey,l_linenumber)' AS check_name,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
             CAST((SELECT count(*) FROM lineitem)
                  - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
                  AS BIGINT) AS n_violations,
             CAST(round(((SELECT count(*) FROM lineitem)
                  - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)))
                  * 1.0 / (SELECT count(*) FROM lineitem), 6) AS DOUBLE) AS violation_rate
    )
    SELECT * FROM o UNION ALL SELECT * FROM l UNION ALL SELECT * FROM u
    """,
    "Declarative data-quality expectation report (the Deequ/dbt-test "
    "shape the reference's P2 invalid-row filter only hints at): "
    "null-rate, range, freshness, and duplicate-key checks over "
    "orders + lineitem as (table, check, n_rows, n_violations, rate) "
    "rows. Plan: ALL boolean rules for a table fold into ONE "
    "aggregate scan (sum of 0/1 casts, map-side partials); the "
    "uniqueness rule adds one groupBy shuffle on the key — a 50-rule "
    "suite still costs two scans + one shuffle, never per-rule jobs",
)
def data_quality_report(spark, sf_dir):
    from ..operators import quality

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    o_report = quality.rule_report(
        orders,
        "orders",
        [
            ("not_null(o_orderkey)", F.col("o_orderkey").isNull()),
            ("range(o_totalprice <= 400000)", F.col("o_totalprice") > 400000),
            (
                "fresh(o_orderdate >= 1993-01-01)",
                F.col("o_orderdate") < F.lit("1993-01-01").cast("date"),
            ),
        ],
    )
    l_report = quality.rule_report(
        lineitem,
        "lineitem",
        [
            (
                "range(l_discount in [0, 0.08])",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.08),
            ),
            ("positive(l_quantity)", F.col("l_quantity") <= 0),
        ],
    )
    u_report = quality.uniqueness_report(
        lineitem, "lineitem", ["l_orderkey", "l_linenumber"]
    )
    return o_report.unionAll(l_report).unionAll(u_report)


# --------------------------------------------------------------------
@spec(
    "length_vocab_correlation",
    f"""
    WITH w AS (
      SELECT lang,
             CAST(len({_WORDS_SQL}) AS BIGINT) AS x,
             CAST(len(list_distinct({_WORDS_SQL})) AS BIGINT) AS y
      FROM documents
    ),
    a AS (
      SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
      FROM w GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           CAST(round((n*sxy - sx*sy)
                / sqrt((n*sxx - sx*sx) * 1.0 * (n*syy - sy*sy)), 4)
                AS DOUBLE) AS corr_len_vocab
    FROM a
    """,
    "Per-language Pearson correlation between document length and "
    "distinct-vocabulary size — the lexical-diversity signal (near-1 "
    "= vocabulary grows linearly with length; low = repetitive "
    "corpus). The engineering point: Spark's built-in corr() "
    "accumulates FLOATS in partition order (run-to-run "
    "nondeterministic), so this hand-rolls the five moment sums as "
    "exact integers (order-independent) and evaluates the closed form "
    "once in IEEE double — bit-identical cross-engine. At 100 TB the "
    "moment sums move to DECIMAL(38,0) (int64 overflows ~2^63); the "
    "shape stays one scan + one tiny groupBy",
)
def length_vocab_correlation(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    d = d.select(
        "lang", TX.tokens(F.col("text")).alias("ws")
    ).select(
        "lang",
        F.size("ws").cast("bigint").alias("x"),
        F.size(F.array_distinct("ws")).cast("bigint").alias("y"),
    )
    a = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt(
        (n * F.col("sxx") - sx * sx) * F.lit(1.0) * (n * F.col("syy") - sy * sy)
    )
    return a.select(
        "lang",
        n.cast("bigint").alias("n_docs"),
        # a zero-variance stratum (e.g. a single-document language) has
        # den = 0: correlation is undefined -> NULL, matching DuckDB's
        # x/0 = NULL instead of raising under Spark's ANSI mode
        F.when(den == 0, F.lit(None))
        .otherwise(F.round(num / den, 4))
        .cast("double")
        .alias("corr_len_vocab"),
    )

"""LLM-data-pipeline extension queries over documents/embeddings:
dedup family, similarity search, text analysis, multimodal plumbing.

These extend the reference's surface per BASELINE.json. Every hash used
is the engine-portable md5-derived ``stable_hash64`` so MinHash/LSH is
bit-reproducible in the DuckDB oracle — the oracle runs the *same
algorithm*, so candidate generation and verification match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup, similarity
from . import QuerySpec, load

SPECS: list[QuerySpec] = []


def spec(name, oracle, doc=""):
    def deco(fn):
        SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


_WORDS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"


# --------------------------------------------------------------------
@spec(
    "dedup_exact_fingerprint",
    """
    SELECT CASE WHEN length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) > 0
                THEN md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                ELSE 'doc:' || doc_id END AS fingerprint,
           min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    "exact dedup: hash-groupBy on normalized fingerprint; degenerate "
    "(NULL/empty-normalizing) docs keep per-doc synthetic keys so they "
    "never collapse into one fake duplicate group",
)
def dedup_exact_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "doc_id", "text")


# --------------------------------------------------------------------
@spec(
    "dedup_jaccard_pairs",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 2
                  THEN list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
                  ELSE [] END AS shingles
      FROM w
    ),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(CASE WHEN len(list_distinct(list_concat(a.shingles, b.shingles))) > 0
          THEN len(list_intersect(a.shingles, b.shingles)) * 1.0
               / len(list_distinct(list_concat(a.shingles, b.shingles)))
          ELSE 0.0 END, 6) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
    """,
    "all-pairs bigram-shingle Jaccard >= 0.8",
)
def dedup_jaccard_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(d, "doc_id", "text", threshold=0.8)


# --------------------------------------------------------------------
@spec(
    "dedup_minhash_lsh",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingles
      FROM w WHERE len(ws) >= 2
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(shingles)), 1, 15)) AS BIGINT) % 2147483647 AS base
      FROM sh
    ),
    sig AS (
      SELECT doc_id, seeds.seed,
        min((base * seeds.a + seeds.b) % 2147483647) AS sig
      FROM tok CROSS JOIN (
        SELECT unnest(range(8)) AS seed,
               unnest([1103515245,1588635695,1117695901,1387672319,1289706101,1464165419,1987654321,1732584193]) AS a,
               unnest([12345,98765,54321,11111,77777,33333,55555,99999]) AS b
      ) seeds
      GROUP BY doc_id, seeds.seed
    ),
    band AS (
      SELECT doc_id, CAST(seed // 2 AS INT) AS band,
        md5(CAST(max(CASE WHEN seed % 2 = 0 THEN sig END) AS VARCHAR) || ',' ||
            CAST(max(CASE WHEN seed % 2 = 1 THEN sig END) AS VARCHAR)) AS bucket
      FROM sig GROUP BY doc_id, seed // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.id_a, c.id_b,
        round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
              / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.8
    """,
    "MinHash(8) + LSH(4 bands x 2) candidates, exact-verified",
)
def dedup_minhash_lsh(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=8, band_size=2, threshold=0.8
    )


# Shared across dedup_clusters (here) and cluster_disjoint_split
# (suite/curation.py): shingles -> MinHash(8) -> LSH bands ->
# verified 0.8-Jaccard edges -> recursive-CTE components ->
# (doc_id, rep_id) labels. ONE copy so a fix to the recipe cannot
# silently diverge between the two oracles.
_COMPONENTS_CTES = f"""w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingles
      FROM w WHERE len(ws) >= 2
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(shingles)), 1, 15)) AS BIGINT) % 2147483647 AS base
      FROM sh
    ),
    sig AS (
      SELECT doc_id, seeds.seed,
        min((base * seeds.a + seeds.b) % 2147483647) AS sig
      FROM tok CROSS JOIN (
        SELECT unnest(range(8)) AS seed,
               unnest([1103515245,1588635695,1117695901,1387672319,1289706101,1464165419,1987654321,1732584193]) AS a,
               unnest([12345,98765,54321,11111,77777,33333,55555,99999]) AS b
      ) seeds
      GROUP BY doc_id, seeds.seed
    ),
    band AS (
      SELECT doc_id, CAST(seed // 2 AS INT) AS band,
        md5(CAST(max(CASE WHEN seed % 2 = 0 THEN sig END) AS VARCHAR) || ',' ||
            CAST(max(CASE WHEN seed % 2 = 1 THEN sig END) AS VARCHAR)) AS bucket
      FROM sig GROUP BY doc_id, seed // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
            / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.8
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM verified
      UNION SELECT id_b, id_a FROM verified
    ),
    reach(src, node) AS (
      SELECT s, s FROM edges
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node AS doc_id, min(src) AS rep_id FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, coalesce(c.rep_id, d.doc_id) AS rep_id
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
"""


# --------------------------------------------------------------------
@spec(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_COMPONENTS_CTES}    SELECT l.doc_id, l.rep_id, s.cluster_size,
           l.doc_id != l.rep_id AS is_duplicate
    FROM labeled l
    JOIN (SELECT rep_id, count(*) AS cluster_size FROM labeled GROUP BY 1) s
      ON s.rep_id = l.rep_id
    """,
    "near-dup clustering: MinHash/LSH pairs -> connected components -> "
    "(doc, representative, cluster size); oracle closes the graph with a "
    "recursive CTE, the engine runs hash-min label propagation",
)
def dedup_clusters(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return dedup.dedup_components(d, "doc_id", "text", threshold=0.8)


# --------------------------------------------------------------------
# SimHash oracle: the rotation-bucket join is pigeonhole-EXACT for
# max_hamming=3 (<=3 differing bits cannot straddle all four disjoint
# 15-bit blocks), so the quadratic all-pairs spec is a true oracle —
# same pattern as dedup_jaccard_pairs' naive-spec oracle.
@spec(
    "dedup_simhash",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    bitsum AS (
      SELECT t.doc_id, b.j,
             sum(CASE WHEN (CAST(('0x' || substr(md5('sim:' || t.tok), 1, 15)) AS BIGINT) >> b.j) & 1 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM toks t, (SELECT unnest(range(60)) AS j) b
      GROUP BY t.doc_id, b.j
    ),
    packed AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      FROM bitsum GROUP BY doc_id
    ),
    sig AS (  -- token-less docs are EXCLUDED: all-zero signatures would
              -- collide in every rotation (see simhash_pairs' guard)
      SELECT doc_id, simhash FROM packed
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "SimHash-60 rotations bucket join, hamming <= 3 (oracle = the "
    "quadratic specification; the banded plan is provably equivalent)",
)
def dedup_simhash(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, "doc_id", "text", max_hamming=3)


# --------------------------------------------------------------------
@spec(
    "text_stats",
    f"""
    WITH w AS (SELECT doc_id, lang, text, {_WORDS_SQL} AS ws FROM documents)
    SELECT doc_id, lang,
      length(text) AS n_chars,
      len(ws) AS n_words,
      len(list_distinct(ws)) AS n_distinct_words,
      CASE WHEN len(ws) > 0
           THEN round(list_aggregate(list_transform(ws, x -> length(x)), 'sum') * 1.0 / len(ws), 4)
           ELSE 0.0 END AS avg_word_len,
      CASE WHEN len(ws) > 0
           THEN round(len(list_filter(ws, x -> x IN ('the','a','and','of','to','in','is'))) * 1.0 / len(ws), 4)
           ELSE 0.0 END AS stopword_ratio
    FROM w
    """,
    "per-doc quality stats",
)
def text_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    ws = TX.tokens(F.col("text"))
    d = d.withColumn("ws", ws)
    n = F.size("ws")
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        n.alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct_words"),
        F.when(
            n > 0,
            F.round(
                F.aggregate(
                    F.transform("ws", lambda x: F.length(x)),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / n,
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_word_len"),
        F.when(
            n > 0,
            F.round(TX.stopword_hits(F.col("ws"), "en") / n, 4),
        )
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
    )


# --------------------------------------------------------------------
@spec(
    "doc_quality_score",
    f"""
    WITH w AS (SELECT doc_id, lang, text, {_WORDS_SQL} AS ws FROM documents),
    c AS (
      SELECT doc_id, lang,
        len(ws) AS nw,
        length(regexp_replace(text, '[\\pL\\pN\\s]', '', 'g')) * 1.0
          / greatest(length(text), 1) AS pr,
        len(list_filter(ws, x -> x IN ('the','a','and','of','to','in','is'))) * 1.0
          / greatest(len(ws), 1) AS swr
      FROM w
    )
    SELECT doc_id, lang,
      floor((0.4 * least(nw / 100.0, 1.0)
          + 0.3 * (1.0 - least(pr * 5, 1.0))
          + 0.3 * least(swr * 5, 1.0)) * 10000 + 0.5) / 10000 AS quality
    FROM c
    """,
    "composite quality score: length + punctuation + stopword terms",
)
def doc_quality_score(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TX.quality_score(F.col("text")).alias("quality"))


# --------------------------------------------------------------------
def _hits_sql(words: list[str]) -> str:
    inlist = ",".join(f"'{w}'" for w in words)
    return f"len(list_filter(ws, x -> x IN ({inlist})))"


_LANG_SQL_CASE = " ".join(
    f"WHEN best > 0 AND h_{lang} = best THEN '{lang}'"
    for lang in TX.LANG_PRECEDENCE
)


@spec(
    "lang_id_heuristic",
    f"""
    WITH w AS (SELECT doc_id, lang, {_WORDS_SQL} AS ws FROM documents),
    scored AS (
      SELECT doc_id, lang,
        {", ".join(f"{_hits_sql(TX.STOPWORDS[lang])} AS h_{lang}" for lang in TX.LANG_PRECEDENCE)}
      FROM w
    ),
    best AS (
      SELECT *, greatest({", ".join(f"h_{lang}" for lang in TX.LANG_PRECEDENCE)}) AS best
      FROM scored
    )
    SELECT doc_id, lang AS actual_lang,
      CASE {_LANG_SQL_CASE} ELSE 'und' END AS predicted_lang
    FROM best
    """,
    "n-gram/stopword language-ID heuristic",
)
def lang_id_heuristic(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        TX.lang_id(TX.tokens(F.col("text"))).alias("predicted_lang"),
    )


# --------------------------------------------------------------------
@spec(
    "token_count_bpeish",
    r"""
    SELECT doc_id,
      length(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_tokens,
      length(text) AS n_chars
    FROM documents
    """,
    "BPE-ish regex token counting",
)
def token_count_bpeish(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count_regex(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


# --------------------------------------------------------------------
def _rhp_planes_sql(dim: int = 64, n_planes: int = 6, seed: str = "rhp") -> str:
    """The RHP hyperplanes as a SQL literal table: exactly the values
    similarity._hyperplane folds into the Spark plan, so bucket bits
    reproduce bit-for-bit across engines."""
    from ..functions.text import stable_hash64_py

    rows = []
    for p in range(n_planes):
        vals = [
            (stable_hash64_py(f"{seed}:{p}:{i}") % 2001 - 1000) / 1000.0
            for i in range(dim)
        ]
        lit = "[" + ", ".join(repr(v) for v in vals) + "]"
        rows.append(f"SELECT {p} AS p, CAST({lit} AS DOUBLE[]) AS plane")
    return " UNION ALL ".join(rows)


_COSINE_SQL = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
    pairs AS (
      -- zero-norm guard mirrors the Spark side's cosine_rounded_safe:
      -- without it DuckDB yields NULL (x/0) where Spark scores 0.0
      SELECT q.qid, e.vec_id,
        CASE WHEN (SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)) = 0
               OR (SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) FROM range(1,65) t(i)) = 0
        THEN 0.0 ELSE round(
          (SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) FROM range(1,65) t(i))
          / (sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))
           * sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) FROM range(1,65) t(i)))), 6) END AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id != q.qid
    )
"""


@spec(
    "knn_cosine_bruteforce",
    _COSINE_SQL
    + """
    , ranked AS (
      SELECT qid, vec_id, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
      FROM pairs
    )
    SELECT qid, vec_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
    "brute-force cosine top-5 for 3 query vectors",
)
def knn_cosine_bruteforce(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    out = similarity.cosine_topk(e, q, k=5)
    return out.select("qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------
@spec(
    "embedding_near_dup_brute",
    _COSINE_SQL.replace("WHERE vec_id < 3", "WHERE vec_id % 50 = 0").replace(
        "e.vec_id != q.qid", "e.vec_id > q.qid"
    )
    + """
    SELECT qid AS id_a, vec_id AS id_b, cosine FROM pairs WHERE cosine >= 0.3
    """,
    "near-dup by cosine >= 0.3, sampled anchor set",
)
def embedding_near_dup_brute(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    from ..functions import vectors as V

    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") > F.col("qid"))
    return (
        pairs.select(
            F.col("qid").alias("id_a"),
            F.col("vec_id").alias("id_b"),
            V.cosine_rounded_safe(F.col("embedding"), F.col("qe")).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


# --------------------------------------------------------------------
# ANN via random-hyperplane LSH: approximate vs brute force, but fully
# deterministic given the md5-derived hyperplanes — so the oracle
# re-derives the buckets (same literals, same left-to-right double
# accumulation) and ranks the same same-bucket candidates.
@spec(
    "ann_rhp_lsh",
    f"""
    WITH planes AS ({_rhp_planes_sql()}),
    b AS (
      SELECT e.vec_id, e.embedding,
        CAST(sum(CASE WHEN list_reduce(
               list_transform(range(1, 65),
                              i -> CAST(e.embedding[i] AS DOUBLE) * pl.plane[i]),
               (a, b) -> a + b) > 0
             THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, e.embedding
    ),
    scored AS (
      SELECT q.vec_id AS qid, c.vec_id,
        round(
          (SELECT sum(CAST(c.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) FROM range(1,65) t(i))
          / (sqrt((SELECT sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))
           * sqrt((SELECT sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))), 6) AS cosine
      FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
      WHERE q.vec_id < 3
    ),
    ranked AS (
      SELECT qid, vec_id, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    )
    SELECT qid, vec_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
    "approximate top-5 via random-hyperplane LSH buckets; oracle "
    "re-derives the deterministic buckets in SQL",
)
def ann_rhp_lsh(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    out = similarity.rhp_lsh_topk(e, q, dim=64, k=5, n_planes=6)
    return out.select("qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------
# IVF ANN: approximate by construction (k-means clustering) — rows-only;
# recall vs brute force is unit-tested (tests/test_similarity_ivf.py).
@spec(
    "ann_ivf_topk",
    None,
    "approximate top-5 via IVF (KMeans coarse quantizer, nprobe=3)",
)
def ann_ivf_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    out = similarity.ivf_topk(e, q, k=5, n_clusters=8, nprobe=3)
    return out.select("qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))


# --------------------------------------------------------------------
# mapInPandas featurization: Python-side by necessity (media decode).
# Value-level oracle: the featurizer's integer bucket accumulators
# (acc[k] = sum of payload bytes at positions i % 8 == k) are exact
# integer math, reproduced in DuckDB by extracting each UTF-8 byte
# from hex(encode(text)) with a list comprehension. sha256 pins the
# exact payload bytes; the acc columns pin the aggregation math; the
# float feature (= acc/n rounded) stays pytest-pinned because no two
# engines format floats identically.
_MM_BYTES = (
    "[ (position(substring(hex(encode(coalesce(text, ''))), 2*i+1, 1) in "
    "'0123456789ABCDEF')-1)*16 "
    "+ (position(substring(hex(encode(coalesce(text, ''))), 2*i+2, 1) in "
    "'0123456789ABCDEF')-1) "
    "for i in range(octet_length(encode(coalesce(text, '')))) ]"
)
_MM_ACCS = ",\n      ".join(
    "COALESCE(CAST(list_sum([bytes[i+1] for i in range(n_bytes) "
    f"if i % 8 = {k}]) AS BIGINT), 0) AS acc{k}"
    for k in range(8)
)


@spec(
    "multimodal_feature_extract",
    f"""
    WITH b AS (
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        octet_length(encode(coalesce(text, ''))) AS n_bytes,
        sha256(coalesce(text, '')) AS payload_sha,
        (text IS NOT NULL) AS decode_ok,
        {_MM_BYTES} AS bytes
      FROM documents
    )
    SELECT media_id, media_type, n_bytes, payload_sha, decode_ok,
      {_MM_ACCS}
    FROM b
    """,
    "binary payload -> Arrow-batched mapInPandas featurization "
    "(decode stubbed; byte-exact integer accumulators oracle-checked)",
)
def multimodal_feature_extract(spark, sf_dir):
    from ..operators import multimodal

    d = load(spark, sf_dir, "documents")
    media = multimodal.attach_fake_payload(d, "doc_id", "text")
    feats = multimodal.extract_features(media)
    # Gate output must be scalar-only: the driver's comparator sorts/hashes
    # column values and cannot handle array cells — unpack the integer
    # accumulators into columns (exact cross-engine).
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "payload_sha",
        "decode_ok",
        *[
            F.element_at(F.col("byte_acc"), k + 1).alias(f"acc{k}")
            for k in range(8)
        ],
    )


# --------------------------------------------------------------------
@spec(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
      octet_length(encode(text)) AS n_bytes,
      sha256(text) AS content_sha
    FROM documents
    """,
    "opaque binary payload + typed metadata plumbing",
)
def multimodal_binary_meta(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )


# --------------------------------------------------------------------
@spec(
    "train_val_test_split",
    """
    WITH b AS (
      SELECT doc_id,
        CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN bucket < 80 THEN 'train'
           WHEN bucket < 90 THEN 'val'
           ELSE 'test' END AS split
    FROM b
    """,
    "deterministic hash split 80/10/10 (stable across runs and engines)",
)
def train_val_test_split(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    bucket = F.pmod(
        TX.stable_hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    return d.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


# --------------------------------------------------------------------
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"


@spec(
    "pii_redaction_stats",
    f"""
    SELECT doc_id,
      length(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
      length(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
      length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_len
    FROM documents
    """,
    "PII scrubbing: email/phone detection counts + redacted text length",
)
def pii_redaction_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
    )


# --------------------------------------------------------------------
@spec(
    "stratified_hash_sample",
    """
    WITH b AS (
      SELECT doc_id, lang,
        CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 80 ELSE 100 END
    """,
    "deterministic per-stratum downsampling (50% en, 80% de, 100% rest)",
)
def stratified_hash_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    bucket = F.pmod(
        TX.stable_hash64(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    rate = (
        F.when(F.col("lang") == "en", 50).when(F.col("lang") == "de", 80).otherwise(100)
    )
    return d.filter(bucket < rate).select("doc_id", "lang")


# --------------------------------------------------------------------
@spec(
    "repeated_ngram_ratio",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    g AS (
      SELECT doc_id,
        CASE WHEN len(ws) >= 2
             THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
             ELSE [] END AS grams
      FROM w
    )
    SELECT doc_id,
      len(grams) AS n_bigrams,
      CASE WHEN len(grams) > 0
           THEN round(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 4)
           ELSE 0.0 END AS dup_bigram_ratio
    FROM g
    """,
    "repetition quality signal: fraction of duplicated word bigrams",
)
def repeated_ngram_ratio(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # tokens materialized in their own projection: a lambda that binds
    # the raw tokens(text) expression re-runs the split on every
    # element_at access (see cross_doc_ngram_repetition)
    d = d.select("doc_id", TX.tokens(F.col("text")).alias("ws"))
    ws = F.col("ws")
    grams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat(
                F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", grams.alias("grams"))
    n = F.size("grams")
    return d.select(
        "doc_id",
        n.alias("n_bigrams"),
        F.when(
            n > 0, F.round(1.0 - F.size(F.array_distinct("grams")) / n, 4)
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_ratio"),
    )


# --------------------------------------------------------------------
# LSH-bucketed near-dup (the scale path of embedding_near_dup_brute).
# The hyperplanes are deterministic md5-derived literals, so the
# bucketing is fully reproducible in SQL: the oracle re-derives the
# same 6 sign bits (list_reduce = Spark aggregate's left-to-right
# double accumulation) and the same candidate join — an exact twin,
# not just a spec.
@spec(
    "embedding_near_dup_lsh",
    f"""
    WITH planes AS ({_rhp_planes_sql()}),
    b AS (
      SELECT e.vec_id, e.embedding,
        CAST(sum(CASE WHEN list_reduce(
               list_transform(range(1, 65),
                              i -> CAST(e.embedding[i] AS DOUBLE) * pl.plane[i]),
               (a, b) -> a + b) > 0
             THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, e.embedding
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      round(
        (SELECT sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) FROM range(1,65) t(i))
        / (sqrt((SELECT sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))
         * sqrt((SELECT sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))), 6) AS cosine
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(
        (SELECT sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) FROM range(1,65) t(i))
        / (sqrt((SELECT sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))
         * sqrt((SELECT sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) FROM range(1,65) t(i)))), 6) >= 0.3
    """,
    "near-dup pairs cosine >= 0.3 via RHP-LSH buckets (scale path); "
    "oracle re-derives the deterministic hyperplane buckets in SQL",
)
def embedding_near_dup_lsh(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup(
        e, threshold=0.3, dim=64, n_planes=6
    )


# --------------------------------------------------------------------
# The flagship LLM-curation composition: language-ID -> quality filter
# -> near-dup-cluster survivors, reported as a funnel of cumulative
# counts. The oracle re-derives every stage (including the
# recursive-CTE component closure) so the composition is value-checked
# end to end. The SQL textually mirrors doc_quality_score /
# lang_id_heuristic / dedup_clusters — identical expression structure
# keeps the IEEE-double arithmetic bit-reproducible across engines.
_CURATION_SQL = f"""
    WITH RECURSIVE w AS (SELECT doc_id, text, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingles
      FROM w WHERE len(ws) >= 2
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(shingles)), 1, 15)) AS BIGINT) % 2147483647 AS base
      FROM sh
    ),
    sig AS (
      SELECT doc_id, seeds.seed,
        min((base * seeds.a + seeds.b) % 2147483647) AS sig
      FROM tok CROSS JOIN (
        SELECT unnest(range(8)) AS seed,
               unnest([1103515245,1588635695,1117695901,1387672319,1289706101,1464165419,1987654321,1732584193]) AS a,
               unnest([12345,98765,54321,11111,77777,33333,55555,99999]) AS b
      ) seeds
      GROUP BY doc_id, seeds.seed
    ),
    band AS (
      SELECT doc_id, CAST(seed // 2 AS INT) AS band,
        md5(CAST(max(CASE WHEN seed % 2 = 0 THEN sig END) AS VARCHAR) || ',' ||
            CAST(max(CASE WHEN seed % 2 = 1 THEN sig END) AS VARCHAR)) AS bucket
      FROM sig GROUP BY doc_id, seed // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
            / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.8
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM verified
      UNION SELECT id_b, id_a FROM verified
    ),
    reach(src, node) AS (
      SELECT s, s FROM edges
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node AS doc_id, min(src) AS rep_id FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, coalesce(c.rep_id, d.doc_id) AS rep_id
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    qc AS (
      SELECT doc_id,
        len(ws) AS nw,
        length(regexp_replace(text, '[\\pL\\pN\\s]', '', 'g')) * 1.0
          / greatest(length(text), 1) AS pr,
        len(list_filter(ws, x -> x IN ('the','a','and','of','to','in','is'))) * 1.0
          / greatest(len(ws), 1) AS swr
      FROM w
    ),
    qual AS (
      SELECT doc_id,
        floor((0.4 * least(nw / 100.0, 1.0)
            + 0.3 * (1.0 - least(pr * 5, 1.0))
            + 0.3 * least(swr * 5, 1.0)) * 10000 + 0.5) / 10000 AS quality
      FROM qc
    ),
    scored AS (
      SELECT doc_id,
        {{hits}}
      FROM w
    ),
    best AS (
      SELECT *, greatest({{bests}}) AS best
      FROM scored
    ),
    pred AS (
      SELECT doc_id, CASE {{langcase}} ELSE 'und' END AS plang
      FROM best
    )
    SELECT CAST(count(*) AS BIGINT) AS n_total,
      CAST(sum(CASE WHEN p.plang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_english,
      CAST(sum(CASE WHEN p.plang = 'en' AND q.quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      CAST(sum(CASE WHEN p.plang = 'en' AND q.quality >= 0.5 AND l.doc_id = l.rep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_curated
    FROM labeled l
    JOIN qual q ON q.doc_id = l.doc_id
    JOIN pred p ON p.doc_id = l.doc_id
"""


@spec(
    "corpus_curation_funnel",
    None,  # patched with _CURATION_SQL below (lang helpers defined above)
    "curation funnel: total -> predicted-English -> quality>=0.5 -> "
    "dedup-cluster representative; cumulative counts per stage",
)
def corpus_curation_funnel(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    comp = dedup.dedup_components(d, "doc_id", "text", threshold=0.8)
    enr = d.select(
        "doc_id",
        TX.lang_id(TX.tokens(F.col("text"))).alias("plang"),
        TX.quality_score(F.col("text")).alias("quality"),
    ).join(comp.select("doc_id", "is_duplicate"), "doc_id")
    en = F.col("plang") == "en"
    qual = en & (F.col("quality") >= 0.5)
    curated = qual & ~F.col("is_duplicate")
    return enr.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(en, 1).otherwise(0)).alias("n_english"),
        F.sum(F.when(qual, 1).otherwise(0)).alias("n_quality"),
        F.sum(F.when(curated, 1).otherwise(0)).alias("n_curated"),
    )


SPECS[-1] = QuerySpec(
    SPECS[-1].name,
    SPECS[-1].fn,
    _CURATION_SQL.format(
        hits=", ".join(
            f"{_hits_sql(TX.STOPWORDS[lang])} AS h_{lang}" for lang in TX.LANG_PRECEDENCE
        ),
        bests=", ".join(f"h_{lang}" for lang in TX.LANG_PRECEDENCE),
        langcase=_LANG_SQL_CASE,
    ),
    SPECS[-1].doc,
)


# --------------------------------------------------------------------
@spec(
    "capped_sample_per_lang",
    """
    WITH r AS (
      SELECT doc_id, lang,
        row_number() OVER (
          PARTITION BY lang
          ORDER BY CAST(('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
                   doc_id ASC
        ) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM r WHERE rn <= 25
    """,
    "hard cap per group: at most 25 docs per language, drawn in "
    "deterministic stable-hash order (corpus rebalancing op)",
)
def capped_sample_per_lang(spark, sf_dir):
    from ..operators import sampling

    d = load(spark, sf_dir, "documents")
    return sampling.capped_sample_per_group(
        d, "lang", "doc_id", cap=25
    ).select("doc_id", "lang")


# --------------------------------------------------------------------
@spec(
    "chunk_documents_64",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    s AS (
      SELECT doc_id, ws, unnest(range(1, greatest(len(ws), 1) + 1, 48)) AS start,
             CAST((unnest(range(1, greatest(len(ws), 1) + 1, 48)) - 1) / 48 AS INT) AS chunk_id
      FROM w WHERE len(ws) > 0
    )
    SELECT doc_id, chunk_id,
           len(ws[start:start+63]) AS n_tokens,
           array_to_string(ws[start:start+63], ' ') AS chunk_text
    FROM s
    """,
    "context-window chunking: 64-token windows, 16-token overlap "
    "(step 48), final chunk short, empty docs dropped",
)
def chunk_documents_64(spark, sf_dir):
    from ..operators import sampling

    d = load(spark, sf_dir, "documents")
    return sampling.chunk_documents(
        d, "doc_id", "text", chunk_tokens=64, overlap=16
    ).withColumnRenamed("id", "doc_id")


# --------------------------------------------------------------------
@spec(
    "mixture_sample_by_lang",
    """
    WITH w AS (
      SELECT doc_id, lang,
        CASE WHEN lang = 'en' THEN 2.5 WHEN lang = 'de' THEN 0.5 ELSE 1.0 END AS wt,
        (CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) / 1000000.0 AS unit
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
        CAST(floor(wt) AS INT)
          + CASE WHEN unit < wt - floor(wt) THEN 1 ELSE 0 END AS copies
      FROM w
    )
    SELECT c.doc_id, c.lang, CAST(t.copy AS INT) AS copy
    FROM c, UNNEST(range(1, copies + 1)) AS t(copy)
    WHERE copies >= 1
    """,
    "domain-mixture resampling: en x2.5 epochs, de x0.5, rest x1 — "
    "floor(w) copies plus a frac(w)-probability extra, hash-drawn",
)
def mixture_sample_by_lang(spark, sf_dir):
    from ..operators import sampling

    d = load(spark, sf_dir, "documents")
    out = sampling.mixture_sample(
        d, "lang", "doc_id", weights={"en": 2.5, "de": 0.5}
    )
    return out.select("doc_id", "lang", "copy")


# --------------------------------------------------------------------
@spec(
    "pack_sequences_128",
    f"""
    WITH t AS (
      SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens,
        CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, {{words}} AS ws FROM documents)
      WHERE len(ws) > 0
    )
    SELECT CAST(h % 8 AS INT) AS shard, doc_id, n_tokens,
      CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS tok_start,
      CAST(sum(n_tokens) OVER w AS BIGINT) AS tok_end,
      CAST(floor((sum(n_tokens) OVER w - n_tokens) / 128) AS BIGINT) AS pack_first,
      CAST(floor((sum(n_tokens) OVER w - 1) / 128) AS BIGINT) AS pack_last
    FROM t
    WINDOW w AS (PARTITION BY h % 8 ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """.format(words=_WORDS_SQL),
    "GPT-style sequence packing: 8 hash shards, per-shard token "
    "cumsum split into 128-token packs; straddles visible as "
    "pack_first != pack_last",
)
def pack_sequences_128(spark, sf_dir):
    from ..operators import sampling

    d = load(spark, sf_dir, "documents")
    return sampling.pack_sequences(
        d, "doc_id", "text", budget=128, n_shards=8
    )


# --------------------------------------------------------------------
@spec(
    "decontaminate_vs_holdout",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    g AS (
      SELECT doc_id,
        unnest(list_distinct(list_transform(range(1, len(ws) - 1),
          i -> CAST(('0x' || substr(md5('ngram:' || array_to_string(ws[i:i+2], ' ')), 1, 15)) AS BIGINT)))) AS gram
      FROM w WHERE len(ws) >= 3
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
    hits AS (
      SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
      FROM g JOIN bench USING (gram)
      GROUP BY g.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(h.n_hits > 0, FALSE) AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    "benchmark decontamination: flag docs sharing any word trigram "
    "with the holdout set (doc_id % 20 = 0), broadcast semi-aggregate",
)
def decontaminate_vs_holdout(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    return dedup.decontaminate(d, bench, "doc_id", "text", n=3)


# --------------------------------------------------------------------
@spec(
    "minhash_containment_pairs",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingles
      FROM w WHERE len(ws) >= 2
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(shingles)), 1, 15)) AS BIGINT) % 2147483647 AS base
      FROM sh
    ),
    sig AS (
      SELECT doc_id, seeds.seed,
        min((base * seeds.a + seeds.b) % 2147483647) AS sig
      FROM tok CROSS JOIN (
        SELECT unnest(range(8)) AS seed,
               unnest([1103515245,1588635695,1117695901,1387672319,1289706101,1464165419,1987654321,1732584193]) AS a,
               unnest([12345,98765,54321,11111,77777,33333,55555,99999]) AS b
      ) seeds
      GROUP BY doc_id, seeds.seed
    ),
    band AS (
      SELECT doc_id, CAST(seed // 2 AS INT) AS band,
        md5(CAST(max(CASE WHEN seed % 2 = 0 THEN sig END) AS VARCHAR) || ',' ||
            CAST(max(CASE WHEN seed % 2 = 1 THEN sig END) AS VARCHAR)) AS bucket
      FROM sig GROUP BY doc_id, seed // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, containment FROM (
      SELECT c.id_a, c.id_b,
        round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
              / least(len(sa.shingles), len(sb.shingles)), 6) AS containment
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
    ) WHERE containment >= 0.9
    """,
    "asymmetric containment (|A∩B|/min|A|,|B| >= 0.9) over the same "
    "MinHash/LSH candidates — catches quote-inclusion near-dups whose "
    "symmetric jaccard is low; oracle reproduces the identical banding",
)
def minhash_containment_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        d, "doc_id", "text", threshold=0.9, num_hashes=8, band_size=2
    )


# --------------------------------------------------------------------
@spec(
    "tfidf_top_terms_per_doc",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n * 1.0 / dfq.df), 6) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
             ) AS rnk
      FROM scored
    )
    SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 3
    """,
    "per-document top-3 TF-IDF terms: raw term frequency x ln(N/df), "
    "ranked on the rounded score with a term tie-break. The document "
    "frequency table is a linear explode+groupBy; it joins back "
    "broadcast (vocabulary << corpus) so the corpus side never "
    "shuffles on text",
)
def tfidf_top_terms_per_doc(spark, sf_dir):
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("term")
    )
    # persist: tf feeds BOTH the document-frequency aggregate and the
    # score join — without it the corpus explode+groupBy executes twice
    # (two full tokenize scans at 100 TB). At cluster scale this is a
    # checkpointed intermediate table.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    # document frequency: distinct docs per term == rows of tf per term
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    result = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rnk").cast("long").alias("rnk"))
    )
    # materialize, then drop the cached tf table — repeated invocations
    # (bench warm + min-of-2 = 3x) must not accrete cached partitions
    out = result.localCheckpoint(eager=True)
    tf.unpersist()
    return out


# --------------------------------------------------------------------
@spec(
    "embedding_int8_quantize",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, scale,
        CASE WHEN scale = 0
             THEN list_transform(embedding, x -> 0)
             ELSE list_transform(embedding,
                    x -> CAST(greatest(-127.0, least(127.0,
                           round(CAST(x AS DOUBLE) / scale, 0))) AS INT))
        END AS qv
      FROM s
    )
    SELECT vec_id, round(scale, 6) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max,
           CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT) AS n_sat
    FROM q
    """,
    "symmetric per-vector int8 quantization (scale = max|v|/127, "
    "round-half-away): the 4x-smaller storage/IO form for ANN at "
    "scale. Output is the per-vector scale + integer-code summary "
    "stats (exact-matched cross-engine); codes themselves are "
    "pinned by tests/test_training_ops.py",
)
def embedding_int8_quantize(spark, sf_dir):
    from ..functions import vectors as V

    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.round(V.int8_scale(F.col("embedding")), 6).alias("scale"),
        V.int8_quantize(F.col("embedding")).alias("qv"),
    )
    return q.select(
        "vec_id",
        "scale",
        F.aggregate(
            "qv", F.lit(0).cast("bigint"), lambda a, v: a + v
        ).alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.size(F.filter("qv", lambda v: F.abs(v) == 127))
        .cast("bigint")
        .alias("n_sat"),
    )


# --------------------------------------------------------------------
@spec(
    "dedup_keep_best_quality",
    f"""
    WITH RECURSIVE w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingles
      FROM w WHERE len(ws) >= 2
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(shingles)), 1, 15)) AS BIGINT) % 2147483647 AS base
      FROM sh
    ),
    sig AS (
      SELECT doc_id, seeds.seed,
        min((base * seeds.a + seeds.b) % 2147483647) AS sig
      FROM tok CROSS JOIN (
        SELECT unnest(range(8)) AS seed,
               unnest([1103515245,1588635695,1117695901,1387672319,1289706101,1464165419,1987654321,1732584193]) AS a,
               unnest([12345,98765,54321,11111,77777,33333,55555,99999]) AS b
      ) seeds
      GROUP BY doc_id, seeds.seed
    ),
    band AS (
      SELECT doc_id, CAST(seed // 2 AS INT) AS band,
        md5(CAST(max(CASE WHEN seed % 2 = 0 THEN sig END) AS VARCHAR) || ',' ||
            CAST(max(CASE WHEN seed % 2 = 1 THEN sig END) AS VARCHAR)) AS bucket
      FROM sig GROUP BY doc_id, seed // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
            / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.8
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM verified
      UNION SELECT id_b, id_a FROM verified
    ),
    reach(src, node) AS (
      SELECT s, s FROM edges
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node AS doc_id, min(src) AS rep_id FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, coalesce(c.rep_id, d.doc_id) AS rep_id
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    qual AS (
      SELECT doc_id,
        floor((0.4 * least(len(ws) / 100.0, 1.0)
            + 0.3 * (1.0 - least(
                (SELECT length(regexp_replace(d2.text, '[\\pL\\pN\\s]', '', 'g')) * 1.0
                   / greatest(length(d2.text), 1)
                 FROM documents d2 WHERE d2.doc_id = w.doc_id) * 5, 1.0))
            + 0.3 * least(len(list_filter(ws, x -> x IN ('the','a','and','of','to','in','is'))) * 1.0
                / greatest(len(ws), 1) * 5, 1.0)) * 10000 + 0.5) / 10000 AS quality
      FROM w
    ),
    ranked AS (
      SELECT l.doc_id, l.rep_id, q.quality,
             row_number() OVER (
               PARTITION BY l.rep_id ORDER BY q.quality DESC, l.doc_id ASC
             ) AS rn
      FROM labeled l JOIN qual q ON q.doc_id = l.doc_id
    )
    SELECT doc_id, rep_id, quality, rn = 1 AS keep FROM ranked
    """,
    "quality-aware dedup survivor selection: near-dup clusters (same "
    "MinHash/LSH + connected components as dedup_clusters) but the "
    "survivor per cluster is the HIGHEST-QUALITY document (composite "
    "score, doc_id tie-break), not the smallest id — the policy an "
    "actual training-corpus curation pipeline wants. One extra window "
    "pass over the labeled corpus; filter keep=true for the deduped set",
)
def dedup_keep_best_quality(spark, sf_dir):
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    comp = dedup.dedup_components(d, "doc_id", "text", threshold=0.8)
    q = d.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))
    w = Window.partitionBy("rep_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        comp.select("doc_id", "rep_id")
        .join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "rep_id", "quality", (F.col("rn") == 1).alias("keep"))
    )


# --------------------------------------------------------------------
@spec(
    "dedup_jaccard_blocked_lang",
    f"""
    WITH w AS (SELECT doc_id, lang, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id, lang,
             CASE WHEN len(ws) >= 2
                  THEN list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
                  ELSE [] END AS shingles
      FROM w
    ),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(CASE WHEN len(list_distinct(list_concat(a.shingles, b.shingles))) > 0
          THEN len(list_intersect(a.shingles, b.shingles)) * 1.0
               / len(list_distinct(list_concat(a.shingles, b.shingles)))
          ELSE 0.0 END, 6) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
    )
    SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
    """,
    "semantically-blocked Jaccard dedup: pairs are only considered "
    "WITHIN a language — blocking both changes the result (cross-lang "
    "near-dups are deliberately out of scope) and multiplies the "
    "prefix-filter's pruning power, since the equi-join key becomes "
    "(prefix token, lang). The pattern generalizes to any partition "
    "column: domain, source, time bucket",
)
def dedup_jaccard_blocked_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(
        d, "doc_id", "text", threshold=0.8, block_cols=["lang"]
    )


# --------------------------------------------------------------------
@spec(
    "source_mix_report",
    """
    WITH s AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT sum(n_docs) AS total FROM s)
    SELECT source, lang, n_docs, total_chars,
           CAST(round(n_docs * 1.0 / t.total, 6) AS DOUBLE) AS doc_share,
           CAST(round(total_chars * 1.0 / n_docs, 2) AS DOUBLE) AS mean_chars
    FROM s CROSS JOIN t
    """,
    "training-data mixture report: per (source, lang) document counts, "
    "char volume, corpus share, and mean length — the table every "
    "data-mixing decision starts from. One shuffle (map-side partial "
    "agg) + a broadcast scalar total; integer sums are exact so the "
    "shares are engine-identical",
)
def source_mix_report(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    total = per.agg(F.sum("n_docs").alias("total"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("doc_share"),
        F.round(F.col("total_chars") / F.col("n_docs"), 2).alias("mean_chars"),
    )


# --------------------------------------------------------------------
@spec(
    "label_centroids",
    """
    WITH u AS (
      SELECT label,
             unnest(list_transform(range(len(embedding)),
                    i -> struct_pack(dim := i, v := embedding[i+1]))) AS s
      FROM embeddings
    )
    SELECT label, CAST(s.dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(s.v AS DECIMAL(18,9))) / count(*), 6)
                AS DOUBLE) AS centroid
    FROM u GROUP BY 1, 2
    """,
    "embedding-space class centroids: per (label, dimension) the mean "
    "component over all vectors of that label — the standard "
    "diagnostic/nearest-class-mean primitive. posexplode -> one "
    "groupBy(label, dim) with map-side partial sums; the float "
    "components are cast to DECIMAL before summing so the distributed "
    "sum is exact and order-independent (a double sum would drift "
    "between engines), divided once at the end",
)
def label_centroids(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    u = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.col("v").cast("decimal(18,9)").alias("v"),
    )
    return u.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v") / F.count(F.lit(1)), 6)
        .cast("double")
        .alias("centroid"),
    )


# --------------------------------------------------------------------
@spec(
    "lm_bigram_fluency",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    bg AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM w, unnest(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY 1),
    v AS (
      -- vocabulary of the bigram TRAINING STREAM: distinct tokens of
      -- docs that contribute bigrams (>= 2 tokens). In such a doc every
      -- token is some bigram's w1 or w2, so this equals the Spark
      -- side's w1-union-w2 lexicon; tokens appearing only in 1-token
      -- docs are outside the LM by construction.
      SELECT count(DISTINCT tok) AS vocab
      FROM (SELECT unnest(ws) AS tok FROM w WHERE len(ws) >= 2)
    ),
    scored AS (
      SELECT bg.doc_id,
        CAST(round((c12.c + 1) * 1.0 / (c1.c + v.vocab), 9)
             AS DECIMAL(12,9)) AS p
      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(round(sum(p) / count(*), 6) AS DOUBLE) AS mean_bigram_prob
    FROM scored GROUP BY 1
    """,
    "bigram-LM fluency proxy: train add-one-smoothed bigram "
    "probabilities ON the corpus itself, score each document by its "
    "mean bigram probability — high = built from corpus-typical word "
    "transitions (fluent/templated), low = unusual transitions "
    "(noisy OR novel); a standard cheap quality signal next to "
    "perplexity. Portability: each P is ONE IEEE division of integers "
    "(bit-identical across engines), rounded and cast to DECIMAL "
    "before the per-doc sum, so the aggregation is exact and "
    "order-independent — no float-sum drift, no ln() library "
    "differences. Plan: one tokenize pass -> bigram explode, two "
    "linear count aggs, counts join back BROADCAST (vocabulary << "
    "corpus), one final groupBy(doc_id) — raw text never shuffles",
)
def lm_bigram_fluency(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX.tokens(F.col("text")).alias("ws"))
    # persist: the bigram stream feeds the c12 count table, the c1
    # count table, AND the scoring join — 3 references that would each
    # re-run the tokenize+explode pass otherwise (the same single-scan
    # discipline as tfidf); unpersisted after the eager materialization
    bg = (
        toks.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("w1"),
                        F.element_at("ws", i + 1).alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .persist()
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # vocab from the bigram lexicon: every token of a >=2-token doc
    # appears as some bigram's w1 or w2, and 1-token docs score no
    # bigrams — matches the oracle's count(DISTINCT tok) over the same
    # tokenizer. Computed from cached bg, not a fresh tokenize pass.
    vocab = (
        bg.select(F.col("w1").alias("tok"))
        .union(bg.select(F.col("w2").alias("tok")))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    scored = (
        bg.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                (F.col("c12") + 1) / (F.col("c1") + F.col("vocab")), 9
            )
            .cast("decimal(12,9)")
            .alias("p"),
        )
    )
    result = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("p") / F.count(F.lit(1)), 6)
        .cast("double")
        .alias("mean_bigram_prob"),
    )
    out = result.localCheckpoint(eager=True)
    bg.unpersist()
    return out

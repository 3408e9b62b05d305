"""Property-based tests (hypothesis): randomized invariant checks for
the graph, temporal, and quantization operators against brute-force
Python oracles. Spark jobs per example are expensive — example counts
are kept small; the properties, not the volume, carry the value.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from automated_data_pipeline_spark.functions import vectors as V
from automated_data_pipeline_spark.operators import dedup, scd

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute_components(edges, vertices):
    """Union-find ground truth: min-id representative per component."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then map every vertex to its component min
    comp = {}
    for v in vertices:
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)).filter(
            lambda p: p[0] != p[1]
        ),
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    vertices = list(range(20))
    vdf = spark.createDataFrame([(v,) for v in vertices], "id bigint")
    if edges:
        edf = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "id_a bigint, id_b bigint"
        )
    else:
        edf = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = {
        r["id"]: r["rep_id"]
        for r in dedup.connected_components(edf, vertices=vdf).collect()
    }
    assert got == _brute_components(edges, vertices)


@given(
    obs=st.lists(
        st.tuples(
            st.integers(1, 3),        # key
            st.sampled_from("ABC"),   # attr
            st.integers(0, 30),       # ts
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_scd2_intervals_tile_the_timeline(spark, obs):
    rows = [(k, a, t, i) for i, (k, a, t) in enumerate(obs)]
    df = spark.createDataFrame(rows, "k int, attr string, ts int, tb int")
    out = (
        scd.scd2_history(df, "k", "attr", "ts", tiebreak_col="tb")
        .orderBy("k", "version")
        .collect()
    )
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivs in by_key.items():
        seen = sorted(
            [(t, i, a) for (kk, a, t, i) in rows if kk == k],
        )
        # versions are 1..n and intervals tile: valid_to(k) == valid_from(k+1)
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        assert ivs[0]["valid_from"] == seen[0][0]  # opens at first observation
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["attr"] != nxt["attr"]  # consecutive intervals differ
        assert ivs[-1]["valid_to"] is None and ivs[-1]["is_current"]
        # point-in-time reconstruction: the interval covering each
        # observation's (ts, tiebreak) position carries the attr of the
        # latest change at or before it
        state = None
        expect = {}
        for t, i, a in seen:
            if state != a:
                state = a
            expect[(t, i)] = state
        # last observation's state must equal the open interval's attr
        assert ivs[-1]["attr"] == expect[seen[-1][:2]]


@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=1, max_size=16
    )
)
@settings(**_SETTINGS)
def test_int8_quantize_bounds_and_scale(spark, vec):
    df = spark.createDataFrame([(1, vec)], "vec_id bigint, embedding array<float>")
    r = df.select(
        V.int8_scale(F.col("embedding")).alias("s"),
        V.int8_quantize(F.col("embedding")).alias("qv"),
    ).first()
    assert len(r["qv"]) == len(vec)
    assert all(-127 <= c <= 127 for c in r["qv"])
    if r["s"] == 0:
        assert all(c == 0 for c in r["qv"])
    else:
        # dequantization error bounded by half a quantization step
        for orig, code in zip(vec, r["qv"]):
            assert abs(code * r["s"] - orig) <= r["s"] / 2 + 1e-5


def _brute_jaccard_pairs(docs, threshold):
    """Ground truth: all-pairs bigram-shingle Jaccard in pure Python."""
    def shingles(text):
        ws = [w for w in text.lower().split() if w]
        return set(f"{a} {b}" for a, b in zip(ws, ws[1:]))

    sh = {i: shingles(t) for i, t in docs}
    out = set()
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sh[ids[i]], sh[ids[j]]
            u = len(a | b)
            jac = (len(a & b) / u) if u else 0.0
            if round(jac, 6) >= threshold:
                out.add((ids[i], ids[j]))
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.5, 0.8, 0.9]),
)
@settings(**_SETTINGS)
def test_jaccard_prefix_filter_is_lossless(spark, docs, threshold):
    # tiny 7-word vocabulary forces heavy shingle collisions — the
    # adversarial regime for the prefix + positional + size filters
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(
            df, "doc_id", "text", threshold=threshold
        ).collect()
    }
    assert got == _brute_jaccard_pairs(rows, threshold)
    spark.catalog.clearCache()


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"]),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_simhash_rotation_buckets_are_pigeonhole_exact(spark, docs):
    from automated_data_pipeline_spark.functions import text as TX

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(
            df, "doc_id", "text", max_hamming=3, n_rotations=4
        ).collect()
    }
    # brute force: compute every signature, compare all pairs
    sigs = {
        r["id"]: r["simhash"]
        for r in TX.simhash_frame(df, "doc_id", "text").collect()
    }
    ids = sorted(sigs)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(sigs[ids[i]] ^ sigs[ids[j]]).count("1")
            if h <= 3:
                want.add((ids[i], ids[j], h))
    assert got == want
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# conversion_funnel: the running-min window rewrite must match a pure-
# Python walk of the oracle semantics (t_view = min view; t_click =
# min click > t_view; t_purchase = min purchase > t_click) — including
# a hyperactive bot user (the skew case that motivated dropping the
# collect_list formulation, VERDICT r3 item 3) and same-timestamp ties.
def _brute_funnel(events):
    """events: list of (user_id, event_type, ts_int)."""
    per_user = {}
    for u, t, ts in events:
        per_user.setdefault(u, []).append((t, ts))
    n_view = n_click = n_purchase = 0
    for evs in per_user.values():
        views = [ts for t, ts in evs if t == "view"]
        if not views:
            continue
        n_view += 1
        t_view = min(views)
        clicks = [ts for t, ts in evs if t == "click" and ts > t_view]
        if not clicks:
            continue
        n_click += 1
        t_click = min(clicks)
        purchases = [ts for t, ts in evs if t == "purchase" and ts > t_click]
        if purchases:
            n_purchase += 1
    return n_view, n_click, n_purchase


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(0, 20),
        ),
        max_size=40,
    ),
    bot_events=st.integers(100, 400),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_conversion_funnel_matches_brute_force_with_bot_user(
    spark, tmp_path_factory, events, bot_events
):
    import itertools

    # user 99 is the bot: an interleaved flood of all three types with
    # heavy timestamp ties — the case that made one unbounded task in
    # the collect_list formulation and stresses tie handling here
    bot = [
        (99, t, ts % 23)
        for ts, t in zip(
            range(bot_events),
            itertools.cycle(["view", "click", "purchase", "click"]),
        )
    ]
    all_events = events + bot
    sf_dir = str(tmp_path_factory.mktemp("funnel"))
    rows = [
        (i, u, t, __import__("datetime").datetime(2024, 1, 1, 0, 0, ts), 1.0)
        for i, (u, t, ts) in enumerate(all_events)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    from automated_data_pipeline_spark.suite.events import conversion_funnel

    got = conversion_funnel(spark, sf_dir).first()
    exp = _brute_funnel([(u, t, ts) for u, t, ts in all_events])
    assert (got["n_view"], got["n_click"], got["n_purchase"]) == exp


# ------------------------------------------------------------------
# SemDeDup pruning (round 4): Spark result must equal the brute-force
# definition — a vector is pruned iff SOME lower-id vector in the same
# cluster has rounded cosine >= threshold (NOT transitive closure: a
# pruned vector still prunes its own higher-id neighbors).
def _brute_semdedup(rows, threshold):
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return 0.0
        return round(d / (na * nb), 6)

    survives = {}
    for vid, label, vec in rows:
        pruned = any(
            o_label == label and o_vid < vid and cos(o_vec, vec) >= threshold
            for o_vid, o_label, o_vec in rows
        )
        survives[vid] = not pruned
    return survives


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 30),  # ids (dupes filtered below)
            st.integers(0, 2),   # cluster label
            st.lists(
                st.floats(-1, 1, allow_nan=False, width=32),
                min_size=4, max_size=4,
            ),
        ),
        min_size=2, max_size=14,
        unique_by=lambda r: r[0],
    ),
    threshold=st.sampled_from([0.3, 0.7, 0.95]),
)
@settings(**_SETTINGS)
def test_semdedup_matches_bruteforce(spark, rows, threshold):
    from automated_data_pipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [(vid, label, [float(x) for x in vec]) for vid, label, vec in rows],
        "vec_id int, label int, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["survives"]
        for r in similarity.semantic_dedup(df, threshold=threshold).collect()
    }
    # brute force must see the same float32 values Spark stored
    import numpy as np

    rows32 = [
        (vid, label, [float(np.float32(x)) for x in vec])
        for vid, label, vec in rows
    ]
    want = _brute_semdedup(rows32, threshold)
    # cosine values that land EXACTLY on the threshold after rounding
    # are engine-order-robust (both sides compare the same rounded
    # value), so exact dict equality is the right assertion
    assert got == want
    # the lowest id of every cluster always survives
    by_label = {}
    for vid, label, _ in rows:
        by_label.setdefault(label, []).append(vid)
    for label, ids in by_label.items():
        assert got[min(ids)] is True


@given(
    hashes=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_hamming_block_join_is_pigeonhole_lossless(spark, hashes):
    """The generic hamming block join (backing image dHash and audio
    fingerprint near-dup) must find EXACTLY the pairs the naive
    all-pairs popcount finds for max_hamming < n_blocks — losslessness
    of the pigeonhole bucketing over arbitrary signed 64-bit hashes."""
    rows = list(enumerate(hashes))
    df = spark.createDataFrame(rows, "id bigint, h bigint")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.hamming_near_dup_pairs(
            df, "id", "h", bits=64, max_hamming=6, n_blocks=8
        ).collect()
    }
    want = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want.add((i, j, d))
    assert got == want


@given(
    keys=st.lists(
        st.text(alphabet="AB", min_size=3, max_size=3),
        min_size=2, max_size=12,
    ),
)
@settings(**_SETTINGS)
def test_hamming1_pairs_property(spark, keys):
    """Masked-position blocking == brute-force Hamming<=1 pairs, on a
    dense 2-letter alphabet where collisions/dups/near-misses abound."""
    from automated_data_pipeline_spark.operators.linkage import hamming1_pairs

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "rid long, key string"
    )
    got = {
        (r["id_1"], r["id_2"], r["dist"])
        for r in hamming1_pairs(df, "key", "rid", length=3).collect()
    }
    expected = set()
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            d = sum(1 for x, y in zip(keys[i], keys[j]) if x != y)
            if d <= 1:
                expected.add((i, j, d))
    assert got == expected


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=5,
    ),
)
@settings(**_SETTINGS)
def test_duplicated_spans_property(spark, docs):
    """Span cover == brute-force 'token lies inside a duplicated
    k-gram' set, on tiny-alphabet corpora where within-doc repetition,
    overlapping seeds, and doc-straddling duplicates all occur."""
    from automated_data_pipeline_spark.operators.spans import duplicated_spans

    k = 3
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = duplicated_spans(df, "text", "doc_id", k=k).collect()
    covered = {
        (r["doc_id"], t)
        for r in rows
        for t in range(r["span_start"], r["span_end"] + 1)
    }
    grams: dict[tuple, list] = {}
    for d, ws in enumerate(docs):
        for i in range(len(ws) - k + 1):
            grams.setdefault(tuple(ws[i:i + k]), []).append((d, i + 1))
    expected = set()
    for occ in grams.values():
        if len(occ) >= 2:
            for d, pos in occ:
                for t in range(pos, pos + k):
                    expected.add((d, t))
    assert covered == expected


# ---- round-7 curation operators ----------------------------------------


def _brute_segment_keep(texts, seg_words):
    first = {}
    occs = []
    for doc, t in enumerate(texts):
        toks = t.split(" ")
        segs = [
            " ".join(toks[i: i + seg_words])
            for i in range(0, len(toks), seg_words)
        ]
        for idx, seg in enumerate(segs):
            occs.append((doc, idx, seg))
            if seg not in first or (doc, idx) < first[seg]:
                first[seg] = (doc, idx)
    return {(d, i): first[s] == (d, i) for d, i, s in occs}


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dog", "x1"]), min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    seg_words=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_segment_dedup_property(spark, texts, seg_words):
    """Keep-set == brute-force min-(doc, seg_idx)-survivor rule, for
    random corpora over a tiny vocabulary (maximizing collisions) and
    random window sizes, partial tails included."""
    from automated_data_pipeline_spark.operators.spans import segment_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["seg_idx"]): r["keep"]
        for r in segment_dedup(df, "text", "doc_id", seg_words).collect()
    }
    assert got == _brute_segment_keep(texts, seg_words)


@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["tok%d" % i for i in range(9)]),
                min_size=1, max_size=8,
            ).map(" ".join),
            st.booleans(),
        ),
        min_size=2,
        max_size=6,
    ).filter(lambda d: any(t for _, t in d)),
)
@settings(**_SETTINGS)
def test_dsir_importance_property(spark, docs):
    """Weights == brute-force hashed-bucket log-likelihood ratios for
    random corpora and random target subsets (at least one target doc,
    else the formula is all-smoothing and still fine — filtered for
    a non-degenerate target)."""
    import math

    from automated_data_pipeline_spark.functions.text import stable_hash64_py
    from automated_data_pipeline_spark.operators.sampling import (
        dsir_importance,
    )

    B = 8
    n_t = [0] * B
    n_r = [0] * B
    for text, is_t in docs:
        for tok in text.lower().split():
            b = stable_hash64_py(tok) % B
            n_r[b] += 1
            if is_t:
                n_t[b] += 1
    tot_t, tot_r = sum(n_t), sum(n_r)
    expected = {}
    for i, (text, _) in enumerate(docs):
        w = 0.0
        for tok in text.lower().split():
            b = stable_hash64_py(tok) % B
            w += math.log((n_t[b] + 1) / (tot_t + B)) - math.log(
                (n_r[b] + 1) / (tot_r + B)
            )
        expected[i] = w

    df = spark.createDataFrame(
        [(i, t, is_t) for i, (t, is_t) in enumerate(docs)],
        "doc_id long, text string, is_t boolean",
    )
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance(
            df, "text", "doc_id", F.col("is_t"), n_buckets=B
        ).collect()
    }
    assert set(got) == set(expected)
    for i, w in expected.items():
        assert abs(got[i] - w) < 1e-9

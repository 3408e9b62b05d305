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

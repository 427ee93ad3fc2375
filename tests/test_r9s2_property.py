"""Property-based invariants for the round-9 second-session kernels:
2-D skyline, k-core peeling, salted join, binary sign codes, and OOF
target encoding — each checked against a pure-Python reference over
hypothesis-generated adversarial inputs (tie-heavy point sets, random
multigraph edge lists, duplicate-row fact tables, degenerate fold
assignments)."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mobilityduck_spark.operators import graph as G
from mobilityduck_spark.operators import skewjoin as SJ
from mobilityduck_spark.operators import skyline as SK

COMMON = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ---- skyline --------------------------------------------------------

points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=1,
    max_size=40,
)


def _sky_ref(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dom = any(
            ox <= x and oy >= y and (ox < x or oy > y)
            for j, (ox, oy) in enumerate(pts)
            if j != i
        )
        if not dom:
            out.append((x, y))
    return sorted(out)


@settings(**COMMON)
@given(points)
def test_skyline_property(spark, pts):
    """Windowed two-phase skyline == quadratic dominance reference on
    tie-heavy small-domain points (every tie/dominance corner case
    appears at domain width 9)."""
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )
    got = sorted(
        (r.x, r.y)
        for r in SK.skyline_min_max(df, "x", "y", "id", n_parts=4).collect()
    )
    assert got == _sky_ref(pts)


# ---- k-core ---------------------------------------------------------

edges_strategy = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _kcore_ref(edges, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {
            n for n in alive if sum(1 for m in adj[n] if m in alive) < k
        }
        if not drop:
            break
        alive -= drop
    return {
        (n, sum(1 for m in adj[n] if m in alive)) for n in alive
    }


@settings(**COMMON)
@given(edges_strategy, st.integers(min_value=2, max_value=4))
def test_kcore_property(spark, edges, k):
    canon = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(canon), "a long, b long")
    got = {(r.node, r.core_deg) for r in G.kcore(df, k=k).collect()}
    assert got == _kcore_ref(canon, k)


# ---- salted join ----------------------------------------------------

fact_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=3),
    ),
    min_size=0,
    max_size=25,
)
dim_rows = st.sets(st.integers(min_value=0, max_value=7), max_size=8)


@settings(**COMMON)
@given(fact_rows, dim_rows)
def test_salted_join_property(spark, fact, dim):
    """salted_join == plain join under duplicate fact rows (which
    share a deterministic salt) and partial key overlap, inner and
    left."""
    if not fact or not dim:
        return
    fdf = spark.createDataFrame(fact, "k long, v long")
    ddf = spark.createDataFrame([(k, k * 10) for k in dim], "k long, w long")
    for how in ("inner", "left"):
        want = sorted(
            (r.k, r.v, r.w) for r in fdf.join(ddf, "k", how).collect()
        )
        got = sorted(
            (r.k, r.v, r.w)
            for r in SJ.salted_join(fdf, ddf, "k", n_salts=5, how=how)
            .collect()
        )
        assert got == want, how


# ---- OOF target encoding -------------------------------------------


@settings(**COMMON)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_target_encoding_property(spark, rows):
    """OOF encodings equal the python fold-exclusion reference; the
    prior fallback fires exactly when a fold swallowed its category."""
    from mobilityduck_spark.operators import events as EV

    data = [(i, c, t) for i, (c, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, cat string, t long")
    out = {
        (r.category, r.fold): (r.enc, r.enc_defined)
        for r in EV.target_encoding_oof(
            df, "cat", F.col("t"), "id", n_folds=3
        ).collect()
    }

    def fold(i):
        return int(hashlib.md5(f"{i}te1".encode()).hexdigest()[:4], 16) % 3

    import collections

    s = collections.defaultdict(int)
    n = collections.defaultdict(int)
    for i, c, t in data:
        s[(c, fold(i))] += t
        n[(c, fold(i))] += 1
    tot_s = sum(t for _, _, t in data)
    tot_n = len(data)
    for (c, f), (enc, defined) in out.items():
        sc = sum(v for (cc, _), v in s.items() if cc == c)
        nc = sum(v for (cc, _), v in n.items() if cc == c)
        so, no = sc - s.get((c, f), 0), nc - n.get((c, f), 0)
        if no > 0:
            assert defined and enc == round(so / no, 6), (c, f)
        else:
            assert not defined and enc == round(tot_s / tot_n, 6), (c, f)

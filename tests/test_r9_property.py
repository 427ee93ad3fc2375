"""Property-based invariants for the round-9 session kernels: CDC
last-writer-wins apply, sorted-neighborhood linkage, and item-item
cosine, each checked against a pure-Python reference over
hypothesis-generated adversarial inputs (duplicate sequences on
distinct keys, tombstone/resurrect interleavings, tie-heavy sort keys,
shared baskets)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mobilityduck_spark.operators import basket as BK
from mobilityduck_spark.operators import entities as EN
from mobilityduck_spark.operators import governance as GV

# ---- CDC apply ------------------------------------------------------

# one change per (key, seq): the CDC LSN contract the operator documents
cdc_strategy = st.dictionaries(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # key
        st.integers(min_value=1, max_value=8),   # seq
    ),
    st.tuples(
        st.sampled_from(["U", "D"]),
        st.sampled_from(["a", "b", None]),
        st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
    ),
    min_size=0,
    max_size=25,
)


def _cdc_ref(snap, log):
    cur = {k: (0, "U", s, v) for k, s, v in snap}
    for (k, seq), (op, s, v) in log.items():
        if k not in cur or seq > cur[k][0]:
            cur[k] = (seq, op, s, v)
    return {
        k: (s, v, seq) for k, (seq, op, s, v) in cur.items() if op != "D"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=cdc_strategy)
def test_cdc_apply_matches_reference(spark, log):
    snap_rows = [(0, "s0", 10), (1, "s1", 11), (2, "s2", 12)]
    snap = spark.createDataFrame(snap_rows, "k int, st string, v int")
    log_rows = [
        (k, seq, op, s, v) for (k, seq), (op, s, v) in log.items()
    ]
    schema = "k int, seq long, op string, st string, v int"
    log_df = (
        spark.createDataFrame(log_rows, schema)
        if log_rows
        else spark.createDataFrame([], schema)
    )
    got = {
        r["k"]: (r["st"], r["v"], r["applied_seq"])
        for r in GV.cdc_apply(snap, log_df, ["k"]).collect()
    }
    assert got == _cdc_ref(snap_rows, log)


# ---- sorted-neighborhood --------------------------------------------

names_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=999),       # id (deduped below)
        st.text(alphabet="abc", min_size=3, max_size=5),  # name
        st.integers(min_value=0, max_value=1),         # attr
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def _snm_ref(rows, window, prefix_len, max_dist):
    from collections import defaultdict

    groups = defaultdict(list)
    for i, nm, at in rows:
        groups[nm[:prefix_len]].append((nm, i, at))
    out = set()
    for g in groups.values():
        g.sort()
        for a in range(len(g)):
            for gap in range(1, window + 1):
                b = a + gap
                if b >= len(g):
                    break
                (nm1, i1, a1), (nm2, i2, a2) = g[a], g[b]
                if a1 == a2 and _lev(nm1, nm2) <= max_dist:
                    out.add((min(i1, i2), max(i1, i2), _lev(nm1, nm2), gap))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=names_strategy)
def test_sorted_neighborhood_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "id bigint, name string, attr int")
    got = {
        (r["id_a"], r["id_b"], r["name_dist"], r["gap"])
        for r in EN.sorted_neighborhood_matches(
            df, "id", "name", ("attr",), window=3, prefix_len=2,
            max_name_dist=1,
        ).collect()
    }
    assert got == _snm_ref(rows, window=3, prefix_len=2, max_dist=1)


# ---- item-item cosine ------------------------------------------------

baskets_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # basket
        st.sampled_from(["x", "y", "z", "w"]),  # item
    ),
    min_size=1,
    max_size=20,
)


def _cosine_ref(rows, min_co):
    from collections import defaultdict
    from math import sqrt

    items = set(rows)
    by_item = defaultdict(set)
    for b, i in items:
        by_item[i].add(b)
    out = {}
    keys = sorted(by_item)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            a, b = keys[x], keys[y]
            co = len(by_item[a] & by_item[b])
            if co >= min_co:
                cos = co / sqrt(len(by_item[a]) * len(by_item[b]))
                out[(a, b)] = (
                    co, len(by_item[a]), len(by_item[b]),
                    round(1e6 * cos),
                )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=baskets_strategy)
def test_item_cosine_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "b int, i string")
    got = {
        (r["item_a"], r["item_b"]):
            (r["n_co"], r["n_a"], r["n_b"], r["cos_micro"])
        for r in BK.item_cosine(df, "b", "i", min_co=1).collect()
    }
    assert got == _cosine_ref(rows, min_co=1)

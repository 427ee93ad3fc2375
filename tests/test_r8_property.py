"""Property-based invariants for the round-8 kernels: attribution,
SCD2 compaction, and chunk-dedup rewrite, each checked against a pure-
Python reference over hypothesis-generated adversarial inputs
(simultaneous events, single-row keys, duplicate runs, shared
chunks)."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mobilityduck_spark.operators import events as EV
from mobilityduck_spark.operators import governance as GV
from mobilityduck_spark.operators import text as TX

BASE = dt.datetime(2024, 1, 1)
HZ_US = 86_400_000_000  # 1 day horizon

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # user
        st.integers(min_value=0, max_value=200_000),    # ts offset seconds
        st.sampled_from(["touch_a", "touch_b", "purchase"]),
        st.integers(min_value=0, max_value=5),          # value units
    ),
    min_size=1,
    max_size=30,
)


def _attr_ref(rows):
    """Pure-python last-touch attribution, 1-day horizon."""
    by_user = {}
    for i, (u, s, t, v) in enumerate(rows):
        by_user.setdefault(u, []).append((s * 1_000_000, i, t, v))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        lt = None  # (ts, type)
        for ts, _i, t, v in evs:
            if t == "purchase":
                if lt is not None and lt[0] >= ts - HZ_US:
                    ch = lt[1]
                else:
                    ch = "direct"
                n, rv = out.get(ch, (0, 0))
                out[ch] = (n + 1, rv + v * 1_000_000)
            else:
                lt = (ts, t)
    return out


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_attribution_matches_reference(spark, rows):
    data = [
        (i, u, BASE + dt.timedelta(seconds=s), t, float(v))
        for i, (u, s, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )
    got = {
        r["channel"]: (r["n_conversions"], r["revenue_micro"])
        for r in EV.attribution(df, horizon="1 day").collect()
    }
    assert got == _attr_ref(rows)


log_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # key
        st.integers(min_value=0, max_value=50),      # day offset
        st.sampled_from(["A", "B"]),                 # attr
    ),
    min_size=1,
    max_size=25,
)


def _scd2_ref(rows):
    by_key = {}
    for i, (k, d, a) in enumerate(rows):
        by_key.setdefault(k, []).append((d * 86_400_000_000, i, a))
    out = []
    for k, evs in by_key.items():
        evs.sort()
        runs = []
        for ts, _i, a in evs:
            if not runs or runs[-1][0] != a:
                runs.append([a, ts])
        base = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        for j, (a, frm) in enumerate(runs):
            to = runs[j + 1][1] + base if j + 1 < len(runs) else -1
            out.append((k, a, frm + base, to, j + 1 == len(runs)))
    return sorted(out)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=log_strategy)
def test_scd2_compact_matches_reference(spark, rows):
    data = [
        (k, BASE + dt.timedelta(days=d), a, i)
        for i, (k, d, a) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "k long, ts timestamp, a string, tb long"
    )
    got = sorted(
        (r["key"], r["attr"], r["valid_from_us"], r["valid_to_us"],
         r["is_current"])
        for r in GV.scd2_compact(df, "k", "ts", "a", "tb").collect()
    )
    assert got == _scd2_ref(rows)


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["w1", "w2", "w3"]), min_size=1, max_size=9
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy)
def test_chunk_dedup_rewrite_matches_reference(spark, docs):
    C = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_removed"])
        for r in TX.chunk_dedup_rewrite(df, chunk_tokens=C).collect()
    }
    # reference: global first-occurrence by (doc_id, idx)
    seen = set()
    exp = {}
    for i, toks in enumerate(docs):
        chunks = [
            " ".join(toks[j : j + C]) for j in range(0, len(toks), C)
        ]
        removed = 0
        for ch in chunks:
            if ch in seen:
                removed += 1
            else:
                seen.add(ch)
        exp[i] = (len(chunks), removed)
    assert got == exp
    # global invariant: total kept chunks == distinct chunk strings
    total_kept = sum(n - r for n, r in got.values())
    assert total_kept == len(seen)

"""Property-based invariants for sessionize and markov_transitions:
hypothesis drives randomized event sets through the Spark operators and
a pure-Python reference. Example counts are small (Spark round-trips
are ~1s each) but the generator covers the adversarial shapes a fixed
fixture misses: simultaneous events, single-event users, exact-gap
boundaries."""

import datetime as dt

import pyspark.sql.functions as F  # noqa: F401  (schema side effects)
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mobilityduck_spark.operators import events as EV

GAP_US = 3600 * 1_000_000  # 1 hour
BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user_id
        st.integers(min_value=0, max_value=50_000),     # ts offset seconds
        st.sampled_from(["a", "b", "c"]),               # event_type
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    data = [
        (i, u, BASE + dt.timedelta(seconds=s), t)
        for i, (u, s, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _sessions_ref(rows, gap_us):
    by_user = {}
    for i, (u, s, t) in enumerate(rows):
        by_user.setdefault(u, []).append((s * 1_000_000, i, t))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        sessions = []
        for ts, _i, _t in evs:
            # strict >: an event exactly at the gap boundary continues
            if sessions and ts <= sessions[-1][-1] + gap_us:
                sessions[-1].append(ts)
            else:
                sessions.append([ts])
        out[u] = [(s[0], s[-1], len(s)) for s in sessions]
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=events_strategy)
def test_sessionize_matches_reference(spark, rows):
    got = {}
    base_us = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    for r in EV.sessionize(_df(spark, rows), gap="1 hour").collect():
        got.setdefault(r.user_id, []).append(
            (r.start_us - base_us, r.end_us - base_us, r.n_events)
        )
    assert got == _sessions_ref(rows, GAP_US)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=events_strategy)
def test_markov_conserves_transitions(spark, rows):
    out = EV.markov_transitions(_df(spark, rows)).collect()
    n_users = len({u for u, _, _ in rows})
    assert sum(r.cnt for r in out) == len(rows) - n_users
    assert all(0.0 < r.p <= 1.0 for r in out)


# ---------------------------------------------------------------------
# Space-Saving (streaming heavy hitters) — pure-kernel property tests:
# drive the applyInPandasWithState update function directly with a fake
# GroupState across randomized multi-batch streams and check the classic
# guarantees against exact counts. No Spark round-trip, so hypothesis
# can afford many examples.
# ---------------------------------------------------------------------
import collections

import pandas as pd

from mobilityduck_spark.streaming.heavy_hitters import _make_update


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


ss_stream = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=30).map(str),  # item ids
        min_size=1,
        max_size=40,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=200, deadline=None)
@given(ss_stream, st.integers(min_value=1, max_value=8))
def test_space_saving_guarantees(batches, k):
    update = _make_update(k)
    state = _FakeState()
    emitted = None
    for batch in batches:
        rows = list(
            update((0,), [pd.DataFrame({"item": batch})], state)
        )
        emitted = rows[-1]
    true = collections.Counter(
        it for batch in batches for it in batch
    )
    n = sum(true.values())
    got = {
        r.item: (r.cnt, r.err)
        for r in emitted.itertuples(index=False)
    }
    # state bound holds always
    assert len(got) <= k
    # overestimate-only, bounded by the recorded error
    for it, (cnt, err) in got.items():
        assert true[it] <= cnt <= true[it] + err
    # no false negatives above the n/k threshold
    for it, c in true.items():
        if c > n / k:
            assert it in got, f"heavy item {it} (count {c} > {n}/{k}) missing"
    # exact regime: fewer distinct items than counters -> exact, no error
    if len(true) <= k:
        assert {i: c for i, (c, _) in got.items()} == dict(true)
        assert all(e == 0 for _, e in got.values())

"""Unit invariants for operators/events.py and dedup.fuzzy_pairs
(oracle parity is covered by test_queries_oracle.py)."""

import pyspark.sql.functions as F

from mobilityduck_spark.operators import dedup as DD
from mobilityduck_spark.operators import events as EV
from mobilityduck_spark.sources import tables as SRC

SF_DIR = "/root/testdata/sf0.001"

GAP_US = 12 * 3600 * 1_000_000


def test_sessionize_partition_invariants(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    out = EV.sessionize(ev, gap="12 hours").collect()
    # sessions cover every event exactly once
    assert sum(r.n_events for r in out) == ev.count()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.session_idx)
        # contiguous 1-based indices, non-negative durations
        assert [r.session_idx for r in rows] == list(range(1, len(rows) + 1))
        assert all(r.dur_us == r.end_us - r.start_us >= 0 for r in rows)
        # consecutive sessions are separated by MORE than the gap
        for a, b in zip(rows, rows[1:]):
            assert b.start_us > a.end_us + GAP_US


def test_sessionize_single_exchange_for_windows(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    plan = EV.sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    # the lag + running-sum windows share ONE user_id hash exchange;
    # only the final per-session groupBy adds a second
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in plan.split("TakeOrdered")[0]


def test_funnel_monotone_and_lagged(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    rows = EV.funnel(
        ev, ["view", "click", "purchase"], horizon="7 days"
    ).collect()
    assert [r.step_idx for r in rows] == [1, 2, 3]
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].sum_lag_us == 0
    for r in rows[1:]:
        # converting users took strictly positive time per step
        assert (r.sum_lag_us > 0) == (r.n_users > 0)


def test_funnel_empty_step_yields_zero_row(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    rows = EV.funnel(ev, ["view", "no_such_type"], horizon="7 days").collect()
    assert rows[1].n_users == 0 and rows[1].sum_lag_us == 0


def test_retention_offset_zero_is_cohort_size(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    out = EV.retention(ev).collect()
    assert all(r.week_offset >= 0 and r.n_active > 0 for r in out)
    cohort0 = {r.cohort_week_us: r.n_active for r in out if r.week_offset == 0}
    # every user is active in their own first week, and later weeks
    # never exceed the cohort size
    n_users = ev.select("user_id").distinct().count()
    assert sum(cohort0.values()) == n_users
    for r in out:
        assert r.n_active <= cohort0[r.cohort_week_us]


def test_fuzzy_pairs_block_and_distance_contract(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    out = DD.fuzzy_pairs(docs, block_len=16, cmp_len=64, max_dist=10)
    rows = out.collect()
    assert len(rows) > 0
    txt = {
        r.doc_id: (r.text or "").lower()
        for r in docs.select("doc_id", "text").collect()
    }
    for r in rows:
        assert r.id_a < r.id_b and 0 <= r.dist <= 10
        assert txt[r.id_a][:16] == txt[r.id_b][:16]
    # exact duplicates appear at distance 0
    assert any(r.dist == 0 for r in rows)


def test_fuzzy_pairs_block_cap_drops_oversized(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    # with a 1-doc cap every block is oversized -> no pairs at all
    assert DD.fuzzy_pairs(docs, max_block=1).count() == 0


def test_value_outliers_match_numpy(spark):
    import numpy as np

    ev = SRC.load(spark, SF_DIR, "events")
    out = EV.value_outliers(ev, z=3.0).collect()
    rows = ev.select("event_id", "event_type", "value").collect()
    by_type = {}
    for r in rows:
        if r.value is not None:
            by_type.setdefault(r.event_type, []).append(
                (r.event_id, round(r.value * 1e6))
            )
    expect = set()
    for t, vals in by_type.items():
        xs = np.array([v for _, v in vals], dtype=np.float64)
        mu, var = xs.mean(), xs.var()
        for eid, x in vals:
            if (x - mu) ** 2 > 9.0 * var:
                expect.add(eid)
    got = {r.event_id for r in out}
    assert got == expect
    assert all(r.z2 > 9.0 for r in out)


def test_markov_transitions_are_row_stochastic(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    rows = EV.markov_transitions(ev).collect()
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every non-final event emits exactly one transition
    assert sum(r.cnt for r in rows) == n_events - n_users
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src_type, []).append(r)
    for src_rows in by_src.values():
        assert abs(sum(r.p for r in src_rows) - 1.0) < 1e-4


def test_fuzzy_pairs_plan_is_equi_join(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    plan = (
        DD.fuzzy_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_decay_scores_exact_vs_python(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    out = {r.user_id: (r.n_events, r.score_micro) for r in EV.decay_scores(ev).collect()}
    rows = ev.select("user_id", "ts", "value").collect()
    d_max = max(r.ts.date() for r in rows)
    agg = {}
    for r in rows:
        if r.value is None:
            continue
        age = (d_max - r.ts.date()).days
        c = round(r.value * 1e6 * 2.0 ** (-age / 7.0))
        n, s = agg.get(r.user_id, (0, 0))
        agg[r.user_id] = (n + 1, s + c)
    assert out == agg


def test_rolling_stats_window_semantics(spark):
    ev = SRC.load(spark, SF_DIR, "events")
    out = EV.rolling_stats(ev, window_rows=5).collect()
    rows = sorted(
        ev.select("event_id", "user_id", "ts", "value").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user = {}
    expect = {}
    for r in rows:
        hist = by_user.setdefault(r.user_id, [])
        hist.append(round(r.value * 1e6))
        expect[r.event_id] = (min(5, len(hist)), sum(hist[-5:]))
    got = {r.event_id: (r.n_win, r.sum_micro) for r in out}
    assert got == expect


def test_robust_outliers_match_numpy(spark):
    import numpy as np

    ev = SRC.load(spark, SF_DIR, "events")
    got = {r.event_id for r in EV.robust_outliers(ev, k=5).collect()}
    rows = ev.select("event_id", "event_type", "value").collect()
    by_type = {}
    for r in rows:
        if r.value is not None:
            by_type.setdefault(r.event_type, []).append(
                (r.event_id, round(r.value * 1e6))
            )
    expect = set()
    for vals in by_type.values():
        xs = sorted(x for _, x in vals)
        med = xs[(len(xs) + 1) // 2 - 1]  # exact lower median
        devs = sorted(abs(x - med) for x in xs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        for eid, x in vals:
            if abs(x - med) > 5 * mad:
                expect.add(eid)
    assert got == expect and len(got) > 0


def test_user_features_asof_is_leakage_free(spark):
    """Mutating every event AT or AFTER a user's label_ts must not
    change that user's as-of features — the point-in-time contract."""
    ev = SRC.load(spark, SF_DIR, "events")
    labels = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("label_ts"))
    )
    base = EV.user_features_asof(ev, labels).collect()
    # poison the future: blow up values and retype events at/after label
    poisoned = (
        ev.join(labels, "user_id", "left")
        .withColumn(
            "value",
            F.when(
                F.col("label_ts").isNotNull()
                & (F.col("ts") >= F.col("label_ts")),
                F.col("value") * 1000 + 7,
            ).otherwise(F.col("value")),
        )
        .withColumn(
            "event_type",
            F.when(
                F.col("label_ts").isNotNull()
                & (F.col("ts") >= F.col("label_ts")),
                F.lit("POISON"),
            ).otherwise(F.col("event_type")),
        )
        .drop("label_ts")
    )
    after = EV.user_features_asof(poisoned, labels).collect()
    assert base == after
    # and the features genuinely differ from the full-history assembly
    full = {r.user_id: r.n_events for r in EV.user_features(ev).collect()}
    asof = {r.user_id: r.n_events for r in base}
    assert all(asof[u] < full[u] for u in asof)


def test_user_features_asof_null_value_prefix(spark):
    """A user whose entire pre-label history has NULL values gets
    decay_micro = 0, not a dropped row."""
    rows = [
        (1, 10, "2024-01-01 00:00:00", "view", None),
        (1, 11, "2024-01-01 01:00:00", "click", None),
        (1, 12, "2024-01-02 00:00:00", "purchase", 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    labels = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("label_ts"))
    )
    out = EV.user_features_asof(ev, labels).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.n_types, r.decay_micro) == (2, 2, 0)


def test_user_features_asof_multi_strict_boundary(spark):
    """The label boundary is STRICT: an event at exactly label_ts never
    counts toward its own label's features, and each label sees only
    its own prefix (distinct types via the first-occurrence flags)."""
    rows = [
        (1, 10, "2024-01-01 00:00:00", "view", 1.0),
        (1, 11, "2024-01-02 00:00:00", "click", 1.0),
        (1, 12, "2024-01-02 00:00:00", "purchase", 5.0),  # label 1
        (1, 13, "2024-01-03 00:00:00", "view", 1.0),
        (1, 14, "2024-01-04 00:00:00", "purchase", 7.0),  # label 2
        (2, 20, "2024-01-01 00:00:00", "purchase", 9.0),  # cold start
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    labels = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("label_ts")
    )
    out = {
        (r.user_id, r.label_us): (
            r.n_events_before, r.n_types_before, r.first_us, r.last_us
        )
        for r in EV.user_features_asof_multi(ev, labels).collect()
    }
    us = lambda s: int(  # noqa: E731
        __import__("datetime").datetime.fromisoformat(s + "+00:00").timestamp()
    ) * 1_000_000
    # label 1: only the 2024-01-01 view and 2024-01-02 click precede it
    # strictly?? the click shares ts with the label -> EXCLUDED
    assert out[(1, us("2024-01-02 00:00:00"))] == (
        1, 1, us("2024-01-01 00:00:00"), us("2024-01-01 00:00:00")
    )
    # label 2 sees view, click, purchase@02, view@03 = 4 events, 3 types
    assert out[(1, us("2024-01-04 00:00:00"))] == (
        4, 3, us("2024-01-01 00:00:00"), us("2024-01-03 00:00:00")
    )
    # cold start: zero history, 0 sentinels
    assert out[(2, us("2024-01-01 00:00:00"))] == (0, 0, 0, 0)


def test_active_users_window_invariants(spark):
    """WAU dominates DAU pointwise, never exceeds the user universe,
    and equals DAU when the window is 1 day."""
    ev = SRC.load(spark, SF_DIR, "events")
    out = EV.active_users(ev, window_days=7).collect()
    n_users = ev.select("user_id").distinct().count()
    assert len(out) > 0
    for r in out:
        assert r.dau <= r.wau <= n_users
    one = {r.day_us: (r.dau, r.wau) for r in EV.active_users(ev, window_days=1).collect()}
    assert all(d == w for d, w in one.values())


# ------------------------------------------------- round 9 operators
def test_seasonal_outliers_separates_regimes(spark):
    import datetime as dt

    from mobilityduck_spark.operators import events as EV

    # two hour-of-week cells with different levels: value 100 in cell A,
    # value 1 in cell B; one anomalous 100 planted INTO cell B must
    # flag, while the same value in cell A must not (a global z-score
    # would either flag both or neither)
    base = dt.datetime(2024, 1, 1, 0, 0)   # epoch-anchored cell
    rows = []
    eid = 0
    for k in range(20):   # cell A: weekly repeats at hour 0
        rows.append((eid, base + dt.timedelta(weeks=k), "t", 100.0))
        eid += 1
    for k in range(20):   # cell B: weekly repeats at hour 5
        v = 100.0 if k == 0 else 1.0      # one planted anomaly
        rows.append((eid, base + dt.timedelta(weeks=k, hours=5), "t", v))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    out = EV.seasonal_outliers(df, z=3.0).collect()
    assert [r["event_id"] for r in out] == [20]
    assert out[0]["value_micro"] == 100_000_000


def test_incremental_rollup_merge_equals_recompute(spark):
    import datetime as dt

    from pyspark.sql import functions as F2

    from mobilityduck_spark.operators import events as EV

    rows = [
        (1, "a", dt.datetime(2024, 1, 1), 1.5),
        (1, "a", dt.datetime(2024, 1, 2), 2.5),
        (1, "b", dt.datetime(2024, 1, 3), 4.0),
        (2, "a", dt.datetime(2024, 1, 4), -1.0),
        (2, "a", dt.datetime(2024, 1, 5), None),   # dropped
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp, value double"
    )
    hist = ev.where(F2.col("ts") < dt.datetime(2024, 1, 3))
    delta = ev.where(F2.col("ts") >= dt.datetime(2024, 1, 3))
    merged = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["sum_micro"])
        for r in EV.incremental_rollup_merge(
            hist, delta, ["user_id", "event_type"]
        ).collect()
    }
    full = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["sum_micro"])
        for r in EV.incremental_rollup_merge(
            ev, ev.limit(0), ["user_id", "event_type"]
        ).collect()
    }
    assert merged == full
    assert merged[(1, "a")] == (2, 4_000_000)
    assert merged[(2, "a")] == (1, -1_000_000)


def test_key_skew_profile_exact(spark):
    from mobilityduck_spark.operators import governance as GV

    rows = [(k,) for k in [7] * 6 + [3] * 3 + [9] * 1]
    df = spark.createDataFrame(rows, "k bigint")
    out = GV.key_skew_profile(df, "k", top_n=2).collect()
    assert [(r["rank"], r["key"], r["n_rows"]) for r in out] == [
        (1, "7", 6), (2, "3", 3),
    ]
    r1 = out[0]
    assert r1["n_keys"] == 3 and r1["total"] == 10
    assert r1["share_ppm"] == 600_000 and r1["max_share_ppm"] == 600_000


def test_rrf_fuse_math_and_tiebreak(spark):
    from mobilityduck_spark.operators import retrieval as RT

    a = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2)], "query_id string, doc_id bigint, rnk int"
    )
    b = spark.createDataFrame(
        [("q", 20, 1), ("q", 30, 2)], "query_id string, doc_id bigint, rnk int"
    )
    out = RT.rrf_fuse([a, b], rrf_k=60, top_k=10).collect()
    got = {r["doc_id"]: (r["rank"], r["rrf_micro"]) for r in out}
    # doc 20: 1M//62 + 1M//61 = 16129 + 16393 = 32522 (rank 1)
    # doc 10: 1M//61 = 16393; doc 30: 1M//62 = 16129
    assert got[20] == (1, 32522)
    assert got[10] == (2, 16393)
    assert got[30] == (3, 16129)


def test_walkforward_split_embargo_and_no_future(spark):
    """Walk-forward invariants: no train row at or after its fold's
    test window (no future leakage), every train row clears the
    embargo gap, test windows partition the span, and fold 0 has no
    train rows at all."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mobilityduck_spark.operators import events as EV

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = EV.walkforward_split(df, n_folds=4, embargo_us=3_600_000_000 * 5)
    got = out.select(
        "event_id", "fold", "role",
        F.unix_micros("ts").alias("tus"),
    ).collect()
    t0 = min(r["tus"] for r in got)
    span = max(r["tus"] for r in got) - t0 + 1
    w = -(-span // 4)
    for r in got:
        lo = t0 + r["fold"] * w
        hi = lo + w
        if r["role"] == "test":
            assert lo <= r["tus"] < hi
        else:
            assert r["role"] == "train"
            assert r["tus"] < lo - 3_600_000_000 * 5  # embargo cleared
    assert not [r for r in got if r["fold"] == 0 and r["role"] == "train"]
    # test windows cover every event exactly once across folds
    tests = [r for r in got if r["role"] == "test"]
    assert len(tests) == 100
    assert len({r["event_id"] for r in tests}) == 100


def test_twap_exact_small_and_uneven(spark):
    """TWAP vs hand computation on an uneven timeline: value 10 held
    2 s, value 20 held 8 s -> twap 18, while plain AVG says 15; a
    single-event key yields NULL (zero duration)."""
    import datetime as dt

    from mobilityduck_spark.operators import events as EV

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(seconds=2), 20.0),
        (1, base + dt.timedelta(seconds=10), 99.0),  # last: zero weight
        (2, base, 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["key"]: (r["n_events"], r["dur_us"], r["twap_micro"])
        for r in EV.time_weighted_avg(df, key_col="user_id").collect()
    }
    assert got[1] == (3, 10_000_000, 18_000_000)
    assert got[2] == (1, 0, None)


def test_m4_downsample_pins_extremes_and_boundaries(spark):
    import datetime as dt

    from mobilityduck_spark.operators import events as EV

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(seconds=i), v)
        for i, v in enumerate([5.0, 1.0, 9.0, 3.0])
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        (r["key"], r["bucket"]): (r["n"], r["v_min"], r["v_max"],
                                  r["v_first"], r["v_last"])
        for r in EV.m4_downsample(df, n_buckets=2).collect()
    }
    assert out[("a", 0)] == (2, 1_000_000, 5_000_000, 5_000_000, 1_000_000)
    assert out[("a", 1)] == (2, 3_000_000, 9_000_000, 9_000_000, 3_000_000)

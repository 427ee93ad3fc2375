"""Unit tests for the governance operators (dq_audit / scd2_compact /
purge_audit) and the round-8 event analytics (attribution, RFM with the
scalable exact NTILE)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mobilityduck_spark.operators import events as EV
from mobilityduck_spark.operators import governance as GV


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- dq_audit
def test_dq_audit_counts(spark):
    child = spark.createDataFrame(
        [(1, 10, 5.0), (2, 11, -1.0), (2, 99, 0.0), (3, None, 2.0)],
        "id bigint, fk bigint, val double",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk bigint")
    out = GV.dq_audit(
        row_checks=[("nonpos_val", child, F.col("val") <= 0)],
        pk_checks=[("child_pk", child, "id")],
        fk_checks=[("child_fk", child, "fk", parent, "pk")],
    )
    got = {r["check"]: (r["n_bad"], r["n_rows"]) for r in out.collect()}
    assert got == {
        "nonpos_val": (2, 4),       # -1.0 and 0.0
        "child_pk": (1, 4),         # id=2 twice
        "child_fk": (1, 3),         # fk=99 orphan; NULL fk excluded
    }


def test_dq_audit_folds_checks_per_table(spark):
    df = spark.createDataFrame([(1,), (2,)], "x bigint")
    out = GV.dq_audit(
        row_checks=[
            ("a", df, F.col("x") > 1),
            ("b", df, F.col("x") < 0),
        ]
    )
    got = {r["check"]: r["n_bad"] for r in out.collect()}
    assert got == {"a": 1, "b": 0}
    # both checks ride one scan: a single inline(array) projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ") == 1


# ------------------------------------------------------------ scd2_compact
def test_scd2_compact_runs_and_ties(spark):
    rows = [
        # key 1: A, A (dup collapses), B, A again -> 3 intervals
        (1, _ts("2024-01-01"), "A", 1),
        (1, _ts("2024-01-02"), "A", 2),
        (1, _ts("2024-01-03"), "B", 3),
        (1, _ts("2024-01-04"), "A", 4),
        # key 2: two rows at the SAME ts -> tiebreak orders (5 then 6)
        (2, _ts("2024-01-01"), "X", 6),
        (2, _ts("2024-01-01"), "Y", 5),
    ]
    log = spark.createDataFrame(rows, "k bigint, ts timestamp, a string, tb bigint")
    out = GV.scd2_compact(log, "k", "ts", "a", "tb")
    got = sorted(
        (r["key"], r["attr"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
        for r in out.collect()
    )
    us = lambda s: int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert got == [
        (1, "A", us("2024-01-01"), us("2024-01-03"), False),
        (1, "A", us("2024-01-04"), -1, True),
        (1, "B", us("2024-01-03"), us("2024-01-04"), False),
        # same-ts: tb=5 (Y) opens first, tb=6 (X) supersedes at the
        # same instant (zero-width first interval, deterministic)
        (2, "X", us("2024-01-01"), -1, True),
        (2, "Y", us("2024-01-01"), us("2024-01-01"), False),
    ]


# ------------------------------------------------------------- purge_audit
def test_purge_audit(spark):
    tomb = spark.createDataFrame([(1,), (1,), (3,)], "user_id bigint")
    t1 = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "user_id bigint, v string"
    )
    t2 = spark.createDataFrame([(9, 5.0)], "uid bigint, v double")
    out = GV.purge_audit(
        tomb, [("t1", t1, "user_id"), ("t2", t2, "uid")]
    )
    got = {
        r["table_name"]: (r["n_purge"], r["n_retain"], r["n_ids_present"])
        for r in out.collect()
    }
    assert got == {"t1": (2, 1, 1), "t2": (0, 1, 0)}


# ------------------------------------------------------------- attribution
def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double"
    )


def test_attribution_last_touch_and_direct(spark):
    ev = _events(
        spark,
        [
            # user 1: view then click then purchase -> credits click
            (1, _ts("2024-01-01 10:00"), 1, "view", 0.0),
            (1, _ts("2024-01-01 11:00"), 2, "click", 0.0),
            (1, _ts("2024-01-02 09:00"), 3, "purchase", 10.0),
            # user 2: touch OUTSIDE the 7-day horizon -> direct
            (2, _ts("2024-01-01 00:00"), 4, "view", 0.0),
            (2, _ts("2024-01-09 00:00"), 5, "purchase", 5.0),
            # user 3: purchase with no preceding event -> direct
            (3, _ts("2024-01-01 00:00"), 6, "purchase", 1.0),
        ],
    )
    out = EV.attribution(ev, horizon="7 days")
    got = {
        r["channel"]: (r["n_conversions"], r["revenue_micro"])
        for r in out.collect()
    }
    assert got == {"click": (1, 10_000_000), "direct": (2, 6_000_000)}


def test_attribution_same_ts_tiebreak_and_self_exclusion(spark):
    ev = _events(
        spark,
        [
            # touch at the SAME ts with a smaller event_id precedes the
            # purchase deterministically; an earlier purchase never
            # credits itself or another purchase
            (1, _ts("2024-01-01 00:00"), 1, "purchase", 2.0),
            (1, _ts("2024-01-01 00:00"), 2, "click", 0.0),
            (1, _ts("2024-01-01 00:00"), 3, "purchase", 4.0),
        ],
    )
    got = {
        r["channel"]: (r["n_conversions"], r["revenue_micro"])
        for r in EV.attribution(ev, horizon="7 days").collect()
    }
    assert got == {"direct": (1, 2_000_000), "click": (1, 4_000_000)}


# ---------------------------------------------------------------- RFM
def test_scalable_ntile_matches_global_ntile(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, rnd.randrange(0, 50)) for i in range(103)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    out = EV._scalable_ntile(
        df, "v", (F.col("v") / F.lit(10)).cast("bigint"), "k", 5, "s"
    )
    got = {r["k"]: r["s"] for r in out.collect()}
    # reference: standard-SQL NTILE over the same deterministic order
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    n, b = len(ordered), 5
    q, rr = divmod(n, b)
    exp = {}
    for i, (k, _) in enumerate(ordered, start=1):
        if i <= rr * (q + 1):
            exp[k] = (i + q) // (q + 1)
        else:
            exp[k] = rr + (i - rr * (q + 1) + q - 1) // max(q, 1)
    assert got == exp


def test_rfm_scores_small(spark):
    ev = _events(
        spark,
        [
            (1, _ts("2024-01-01"), 1, "purchase", 1.0),
            (1, _ts("2024-01-05"), 2, "purchase", 2.0),
            (2, _ts("2024-01-03"), 3, "purchase", 100.0),
            (3, _ts("2024-01-06"), 4, "purchase", 0.5),
            (3, _ts("2024-01-06"), 5, "click", 9.0),  # ignored
        ],
    )
    out = {r["user_id"]: r.asDict() for r in EV.rfm_scores(ev).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["frequency"] == 2
    assert out[1]["monetary_micro"] == 3_000_000
    assert out[2]["monetary_micro"] == 100_000_000
    assert out[3]["recency_days"] == 0
    assert out[1]["recency_days"] == 1
    # 3 users, 5 buckets: ntile assigns 1,2,3 in sort order
    # monetary asc: user3 (0.5) -> 1, user1 (3.0) -> 2, user2 (100) -> 3
    assert out[1]["m_score"] == 2 and out[2]["m_score"] == 3
    assert out[3]["r_score"] == 3  # most recent purchase
    assert out[1]["rfm"] == out[1]["r_score"] * 100 + out[1]["f_score"] * 10 + out[1]["m_score"]


# ---------------------------------------------------------------- PSI
def test_psi_drift_known_distribution(spark):
    import datetime as dt
    import math

    # old half: values uniform 1..10 (one each); new half: all 10s.
    rows = []
    for i, v in enumerate(range(1, 11)):
        rows.append((i, dt.datetime(2024, 1, 1, i), "t", float(v)))
    for i in range(10):
        rows.append((100 + i, dt.datetime(2024, 1, 3, i), "t", 10.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    out = EV.psi_drift(df, n_buckets=10).collect()
    assert len(out) == 10  # full grid for one type
    by_bucket = {r["bucket"]: r for r in out}
    # boundaries = old deciles 1..9; a value EQUAL to a boundary lands
    # in the upper bucket, so old value v -> bucket v (v=1..9 with 9
    # and 10 sharing bucket 9) and bucket 0 stays empty
    assert by_bucket[0]["n_old"] == 0
    assert all(by_bucket[b]["n_old"] == 1 for b in range(1, 9))
    assert by_bucket[9]["n_old"] == 2
    assert by_bucket[9]["n_new"] == 10
    assert all(by_bucket[b]["n_new"] == 0 for b in range(9))
    # spot-check one smoothed term against the closed form
    po, pn = (1 + 1.0) / (10 + 10.0), (0 + 1.0) / (10 + 10.0)
    exp = round((pn - po) * math.log(pn / po) * 1e6)
    assert by_bucket[1]["psi_term_micro"] == exp
    # drift concentrates in the top bucket
    assert by_bucket[9]["psi_term_micro"] == max(
        r["psi_term_micro"] for r in out
    )


# ------------------------------------------------------- reconciliation
def test_reconcile_aggregates_mismatches_only(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200), (3, 30, 300)],
        "k bigint, n bigint, v bigint",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (2, 21, 200), (4, 5, 50)],
        "k bigint, n bigint, v bigint",
    )
    out = {
        r["k"]: (r["n_l"], r["n_r"], r["n_delta"], r["v_delta"])
        for r in GV.reconcile_aggregates(
            left, right, ["k"], ["n", "v"]
        ).collect()
    }
    assert out == {
        2: (20, 21, -1, 0),        # measure drift
        3: (30, 0, 30, 300),       # missing on the right
        4: (0, 5, -5, -50),        # extra on the right
    }


# ---------------------------------------------------- forecast / CUSUM
def test_forecast_backtest_lag7(spark):
    import datetime as dt

    rows = []
    # day 0..13: value = day index; forecast(day d) = total(d-7)
    for d in range(14):
        rows.append((d, dt.datetime(2024, 1, 1 + d), "t", float(d)))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    r = EV.forecast_backtest(df, season_days=7).collect()[0]
    # backtest days 7..13: each error = 7 (in micro units)
    assert r["n_days"] == 7
    assert r["mae_num_micro"] == 7 * 7_000_000
    assert r["bias_micro"] == 7 * 7_000_000


def test_cusum_changepoint_finds_level_shift(spark):
    import datetime as dt

    rows = []
    # 10 days at 1.0, then 10 days at 5.0 -> CUSUM peaks at the last
    # low day (day index 9, absolute day = epoch day of 2024-01-10)
    for d in range(20):
        v = 1.0 if d < 10 else 5.0
        rows.append((d, dt.datetime(2024, 1, 1 + d), "t", v))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    r = EV.cusum_changepoint(df).collect()[0]
    epoch_day = (dt.date(2024, 1, 10) - dt.date(1970, 1, 1)).days
    assert r["change_day"] == epoch_day
    assert r["n_days"] == 20
    # scaled statistic at k=10: |n*cum - k*tot| = |20*10e6 - 10*60e6|
    assert r["s_abs_scaled"] == abs(20 * 10_000_000 - 10 * 60_000_000)


# ----------------------------------------------- profiler / A/B readout
def test_table_profile_values_and_strategies(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k bigint, s string"
    )
    for strategy in ("per_column", "expand"):
        out = {r["column_name"]: r.asDict() for r in GV.table_profile(
            df, ["k", "s"], strategy=strategy
        ).collect()}
        assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 0
        assert out["k"]["n_distinct"] == 2
        assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
        assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    # expand strategy: ONE scan for every aggregate (the EXPAND plan)
    plan = GV.table_profile(df, ["k", "s"], strategy="expand")
    final = plan._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("Scan ") == 1
    # per_column strategy: no Expand node anywhere (pruned scans instead)
    plan2 = GV.table_profile(df, ["k", "s"])._jdf.queryExecution()
    assert "Expand" not in plan2.executedPlan().toString()


def test_ab_test_readout_deterministic_and_exact(spark):
    import datetime as dt
    import math

    rows = []
    for u in range(40):
        # users 0..19 get 2 purchases (converted at min_conversions=2),
        # users 20..39 get 1
        n = 2 if u < 20 else 1
        for j in range(n):
            rows.append((u * 10 + j, u, dt.datetime(2024, 1, 1 + j),
                         "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double"
    )
    out = EV.ab_test_readout(df, salt="s1", min_conversions=2).collect()
    assert len(out) == 2
    got = {r["variant"]: r.asDict() for r in out}
    assert got["A"]["n_users"] + got["B"]["n_users"] == 40
    assert got["A"]["n_converted"] + got["B"]["n_converted"] == 20
    # z matches the closed form computed from the emitted exact counts
    na, ca = got["A"]["n_users"], got["A"]["n_converted"]
    nb, cb = got["B"]["n_users"], got["B"]["n_converted"]
    p = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / math.sqrt(
        p * (1 - p) * (1 / na + 1 / nb)
    )
    assert got["A"]["z_micro"] == round(z * 1e6)
    # rerun is bit-identical (deterministic hash assignment)
    out2 = {r["variant"]: r["n_users"] for r in EV.ab_test_readout(
        df, salt="s1", min_conversions=2
    ).collect()}
    assert out2 == {v: got[v]["n_users"] for v in got}


def test_scd2_compact_null_attrs(spark):
    # NULL is a first-class SCD2 value: non-NULL -> NULL opens a
    # NULL-valued interval, consecutive NULLs collapse, and a key whose
    # FIRST value is NULL still opens an interval (lag-is-NULL alone
    # can't tell "first row" from "previous value was NULL")
    rows = [
        (1, _ts("2024-01-01"), "A", 1),
        (1, _ts("2024-01-02"), None, 2),   # opens NULL interval
        (1, _ts("2024-01-03"), None, 3),   # collapses into it
        (1, _ts("2024-01-04"), "A", 4),    # closes the NULL interval
        (2, _ts("2024-01-01"), None, 5),   # first value NULL
        (2, _ts("2024-01-02"), "B", 6),
    ]
    log = spark.createDataFrame(
        rows, "k bigint, ts timestamp, a string, tb bigint"
    )
    out = GV.scd2_compact(log, "k", "ts", "a", "tb")
    us = lambda s: int(
        _ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    key = lambda t: tuple(str(x) for x in t)  # noqa: E731
    got = sorted(
        (
            (r["key"], r["attr"], r["valid_from_us"], r["valid_to_us"],
             r["is_current"])
            for r in out.collect()
        ),
        key=key,
    )
    assert got == sorted([
        (1, "A", us("2024-01-01"), us("2024-01-02"), False),
        (1, None, us("2024-01-02"), us("2024-01-04"), False),
        (1, "A", us("2024-01-04"), -1, True),
        (2, None, us("2024-01-01"), us("2024-01-02"), False),
        (2, "B", us("2024-01-02"), -1, True),
    ], key=key)


def test_dq_audit_empty_table_and_special_names(spark):
    empty = spark.createDataFrame([], "x bigint")
    out = GV.dq_audit(
        row_checks=[
            # names carrying quotes/backticks are data, not SQL
            ("bad 'quoted' `name`", empty, F.col("x") < 0),
        ],
        fk_checks=[(
            "empty_fk", empty, "x",
            spark.createDataFrame([(1,)], "pk bigint"), "pk",
        )],
    )
    got = {r["check"]: (r["n_bad"], r["n_rows"]) for r in out.collect()}
    # empty table audits as 0 bad rows, never NULL
    assert got == {"bad 'quoted' `name`": (0, 0), "empty_fk": (0, 0)}


def test_ab_test_degenerate_split_surfaces_rows(spark):
    import datetime as dt2

    # a single user lands in exactly one variant: the readout must
    # still surface that variant's row, with NULL z (not zero rows)
    df = spark.createDataFrame(
        [(1, 7, dt2.datetime(2024, 1, 1), "purchase", 2.0)],
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double",
    )
    out = EV.ab_test_readout(df, salt="s1", min_conversions=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_users"] == 1 and r["n_converted"] == 1
    assert r["z_micro"] is None


def test_cdc_apply_merge_edges(spark):
    from mobilityduck_spark.operators import governance as GOV

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k int, st string, v int",
    )
    log = spark.createDataFrame(
        [
            (1, 1, "U", "a2", 11),   # plain update
            (1, 2, "U", "a3", 12),   # update-over-update: seq 2 wins
            (2, 1, "D", None, None),  # delete wins over snapshot
            (3, 1, "D", None, None),  # delete...
            (3, 2, "U", "c2", 31),   # ...then resurrect at higher seq
            (4, 1, "U", "d", 40),    # insert of an absent key
        ],
        "k int, seq long, op string, st string, v int",
    )
    out = {
        r["k"]: (r["st"], r["v"], r["applied_seq"])
        for r in GOV.cdc_apply(snap, log, ["k"]).collect()
    }
    assert out == {
        1: ("a3", 12, 2),
        3: ("c2", 31, 2),
        4: ("d", 40, 1),
    }  # key 2 tombstoned away


def test_cdc_apply_plan_is_one_hash_aggregate(spark):
    from mobilityduck_spark.operators import governance as GOV

    snap = spark.createDataFrame([(1, "a")], "k int, st string")
    log = spark.createDataFrame(
        [(1, 1, "U", "b")], "k int, seq long, op string, st string"
    )
    plan = GOV.cdc_apply(snap, log, ["k"])._jdf.queryExecution() \
        .executedPlan().toString()
    # one-pass argmax: a single exchange, partial max_by map-side,
    # never a Window (the struct buffer plans as SortAggregate — the
    # partition-LOCAL sort before the exchange, not a row_number over
    # the shuffled data)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan and "max_by" in plan


def test_incremental_join_view_all_terms_nonempty(spark):
    """The delta-join identity only proves something if every term
    contributes: check each of the four partials is non-empty on the
    registered split, and the merged view equals the full recompute."""
    from pyspark.sql import functions as F

    from mobilityduck_spark.operators import governance as GOV
    from mobilityduck_spark.sources import tables as SRC

    sf = "/root/testdata/sf0.001"
    orders = SRC.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = SRC.load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.lit(1).alias("measure"),
    )
    d_o = F.col("o_orderkey") % 10 == 7
    d_l = ((F.col("o_orderkey") % 10 == 7) & (F.col("l_linenumber") >= 2)) | (
        (F.col("o_orderkey") % 10 == 3) & (F.col("l_linenumber") >= 5)
    )
    a_old, a_new = orders.where(~d_o), orders.where(d_o)
    b_old = li.where(~d_l).drop("l_linenumber")
    b_new = li.where(d_l).drop("l_linenumber")
    for name, (a, b) in {
        "dA_B": (a_new, b_old), "A_dB": (a_old, b_new),
        "dA_dB": (a_new, b_new),
    }.items():
        assert a.join(b, "o_orderkey").count() > 0, name
    inc = GOV.incremental_join_view(
        a_old, a_new, b_old, b_new, "o_orderkey", ["o_custkey"]
    )
    full = (
        orders.join(li.drop("l_linenumber"), "o_orderkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("measure").alias("msum"))
    )
    got = {r["o_custkey"]: (r["n_rows"], r["msum"]) for r in inc.collect()}
    exp = {r["o_custkey"]: (r["n_rows"], r["msum"]) for r in full.collect()}
    assert got == exp

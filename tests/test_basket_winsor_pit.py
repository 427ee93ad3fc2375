"""Unit tests for basket pair rules, winsorized stats, and the SCD2
point-in-time lookup."""

import datetime as dt

from pyspark.sql import functions as F

from mobilityduck_spark.operators import basket as BK
from mobilityduck_spark.operators import events as EV
from mobilityduck_spark.operators import governance as GV


def test_pair_rules_support_and_lift(spark):
    # items A,B co-occur in 2 of 4 baskets; A,C only once (pruned)
    rows = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"),
        (3, "A"),
        (4, "D"),
        (4, "D"),  # duplicate item rows collapse (distinct)
    ]
    df = spark.createDataFrame(rows, "b bigint, i string")
    out = {
        (r["item_a"], r["item_b"]): (r["n_co"], r["lift_micro"])
        for r in BK.pair_rules(df, "b", "i", min_support=2).collect()
    }
    # lift(A,B) = nb * n_co / (m_A * m_B) = 4*2/(3*2) = 4/3
    assert out == {("A", "B"): (2, 1333333)}


def test_pair_rules_max_basket_cap(spark):
    rows = [(1, f"i{k}") for k in range(6)] + [(2, "x"), (2, "y"),
                                               (3, "x"), (3, "y")]
    df = spark.createDataFrame(rows, "b bigint, i string")
    out = BK.pair_rules(df, "b", "i", min_support=2, max_basket=5).collect()
    assert {(r["item_a"], r["item_b"]) for r in out} == {("x", "y")}


def test_winsorized_stats_exact(spark):
    vals = [1.0] * 10 + [2.0] * 80 + [3.0] * 9 + [100.0]
    rows = [(i, dt.datetime(2024, 1, 1), "t", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    r = EV.winsorized_stats(df, p_lo=5, p_hi=95).collect()[0]
    # n=100: rank ceil(5)=5 -> 1.0; rank ceil(95)=95 -> 3.0
    assert r["n"] == 100
    assert r["p_lo_micro"] == 1_000_000
    assert r["p_hi_micro"] == 3_000_000
    # winsorized sum: 10*1 + 80*2 + 9*3 + 1*3 (100 clipped to 3)
    assert r["win_sum_micro"] == (10 * 1 + 80 * 2 + 9 * 3 + 3) * 1_000_000


def test_scd2_pit_lookup(spark):
    log = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), "A", 1),
            (1, dt.datetime(2024, 1, 10), "B", 2),
        ],
        "k bigint, ts timestamp, a string, tb bigint",
    )
    dim = GV.scd2_compact(log, "k", "ts", "a", "tb")
    us = lambda s: int(
        dt.datetime.fromisoformat(s)
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
        * 1e6
    )
    facts = spark.createDataFrame(
        [
            (1, us("2024-01-05"), 10.0),   # inside [A)
            (1, us("2024-01-10"), 20.0),   # exactly at the boundary -> B
            (1, us("2024-02-01"), 30.0),   # open current interval -> B
            (1, us("2023-12-01"), 40.0),   # before first change -> dropped
            (2, us("2024-01-05"), 50.0),   # unknown key -> dropped
        ],
        "k bigint, t_us bigint, q double",
    )
    out = sorted(
        (r["attr"], r["q"])
        for r in GV.scd2_pit_lookup(facts, dim, "k", "t_us").collect()
    )
    assert out == [("A", 10.0), ("B", 20.0), ("B", 30.0)]

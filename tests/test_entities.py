"""Unit tests for entity resolution (blocked_matches) and the
k-anonymity audit."""

from pyspark.sql import functions as F

from mobilityduck_spark.operators import entities as EN


def test_blocked_matches_blocking_and_distance(spark):
    df = spark.createDataFrame(
        [
            (1, "Alice Smith", "A"),
            (2, "alice smyth", "A"),   # dist 1 within block A
            (3, "Alice Smith", "B"),   # identical name, different block
            (4, "Bob Jones", "A"),     # too far from everyone
        ],
        "id bigint, name string, seg string",
    )
    out = sorted(
        (r["id_a"], r["id_b"], r["name_dist"])
        for r in EN.blocked_matches(
            df, "id", "name", ("seg",), max_name_dist=2
        ).collect()
    )
    assert out == [(1, 2, 1)]


def test_blocked_matches_drops_oversized_blocks(spark):
    rows = [(i, "same name", "big") for i in range(5)] + [
        (10, "x", "ok"),
        (11, "x", "ok"),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, seg string")
    out = sorted(
        (r["id_a"], r["id_b"])
        for r in EN.blocked_matches(
            df, "id", "name", ("seg",), max_name_dist=0, max_block=4
        ).collect()
    )
    assert out == [(10, 11)]  # the 5-member block was capped away


def test_k_anonymity_groups_and_generalization(spark):
    df = spark.createDataFrame(
        [(30, "M", 1200.0), (30, "M", 1900.0), (30, "F", 500.0),
         (40, "M", 100.0)],
        "age int, sex string, bal double",
    )
    out = EN.k_anonymity(
        df,
        ["age", "sex", ("band", F.floor(F.col("bal") / 1000.0).cast("bigint"))],
        k=2,
    ).collect()
    got = {(r["age"], r["sex"], r["band"]): r["n"] for r in out}
    # (30,M,band=1) has 2 members -> safe; the three singletons are at risk
    assert got == {(30, "F", 0): 1, (40, "M", 0): 1}

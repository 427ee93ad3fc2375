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


def test_sorted_neighborhood_catches_last_char_typo(spark):
    # names sort adjacently once attribute agreement filters the
    # digit-neighbor noise; typo twin is 2 sorted positions away here
    rows = [
        (1, "customer#001", 7, 100),
        (2, "customer#002", 7, 200),
        (3, "customer#003", 7, 300),
        (1001, "customer#00x", 7, 100),  # typo twin of id 1
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, nat int, bal bigint")
    out = sorted(
        (r["id_a"], r["id_b"], r["name_dist"], r["gap"])
        for r in EN.sorted_neighborhood_matches(
            df, "id", "name", ("nat", "bal"), window=6, prefix_len=8
        ).collect()
    )
    assert out == [(1, 1001, 1, 3)]


def test_sorted_neighborhood_window_bound(spark):
    # the twin sits window+1 positions away -> sorted-neighborhood
    # recall limit: NOT reported (the documented SNM trade-off)
    rows = [(i, f"customer#00{i}", 1, 9) for i in range(1, 9)] + [
        (1001, "customer#00x", 1, 9)
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, nat int, bal bigint")
    out = EN.sorted_neighborhood_matches(
        df, "id", "name", ("nat", "bal"), window=2, prefix_len=8,
    ).collect()
    # with window=2 only ids 7,8 reach the twin (digit neighbors also
    # pair with each other here — identical attrs by construction)
    got = sorted((r["id_a"], r["id_b"]) for r in out)
    assert (1, 1001) not in got
    assert [p for p in got if p[1] == 1001] == [(7, 1001), (8, 1001)]


def test_l_diversity_flags_homogeneous_groups(spark):
    df = spark.createDataFrame(
        [(30, "flu"), (30, "flu"), (30, "flu"),
         (40, "flu"), (40, "cold"), (40, "hiv")],
        "age int, dx string",
    )
    out = EN.l_diversity(df, ["age"], "dx", l=3).collect()
    assert [(r["age"], r["n"], r["n_sensitive"]) for r in out] == [(30, 3, 1)]


def test_t_closeness_exact_tv_and_zero_cells(spark):
    """Hand-computed total-variation distances for two groups against
    the global sensitive distribution, including the ZERO cells (group
    A has no cold/hiv rows — those cells still contribute)."""
    rows = [("A", "flu")] * 4 + [
        ("B", "flu"), ("B", "cold"), ("B", "cold"), ("B", "hiv"),
        ("B", "hiv"), ("B", "hiv"),
    ]
    df = spark.createDataFrame(rows, "grp string, dx string")
    out = {
        r["grp"]: (r["n"], r["tv_micro"])
        for r in EN.t_closeness(df, ["grp"], "dx", t_micro=0).collect()
    }
    # N=10: p = (flu .5, cold .2, hiv .3)
    # A (n=4, all flu): TV = .5*(|1-.5|+|0-.2|+|0-.3|) = .5
    # B (n=6: flu 1/6, cold 2/6, hiv 3/6):
    #   TV = .5*(|1/6-.5|+|1/3-.2|+|.5-.3|) = .5*(1/3+2/15+1/5) = 1/3
    assert out["A"] == (4, 500_000)
    assert out["B"] == (6, 333_333)

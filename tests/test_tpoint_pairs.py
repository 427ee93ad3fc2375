"""Pairwise trajectory ops (pandas-UDF path) — eDwithin/aDisjoint/
tDwithin semantics from src/geo/tgeompoint.cpp:279-311."""

from pyspark.sql import functions as F

from mobilityduck_spark.functions import tpoint as TP
from mobilityduck_spark.operators import tpoint_pairs as PP


def _mk(spark):
    def traj(points):
        arr = F.array(
            *[
                F.struct(
                    F.to_timestamp(F.lit(t)).alias("t"),
                    TP.point(F.lit(float(x)), F.lit(float(y))).alias("v"),
                )
                for t, x, y in points
            ]
        )
        return TP.tpoint_seq(arr)

    # a: moves 0,0 → 10,0 over 10 days; b: parallel at y=3; c: crosses a
    a = traj([("2000-01-01", 0, 0), ("2000-01-11", 10, 0)])
    b = traj([("2000-01-01", 0, 3), ("2000-01-11", 10, 3)])
    c = traj([("2000-01-01", 0, -5), ("2000-01-11", 10, 5)])
    d = traj([("2001-06-01", 0, 0), ("2001-06-02", 1, 0)])  # no time overlap
    return spark.range(1).select(
        a.alias("a"), b.alias("b"), c.alias("c"), d.alias("d")
    )


def test_pairwise_ops(spark):
    df = _mk(spark)
    u = PP.register_pair_udfs(spark)
    r = df.select(
        u["min_pair_distance"]("a", "b").alias("dab"),
        u["min_pair_distance"]("a", "c").alias("dac"),
        u["e_dwithin"]("a", "b", F.lit(3.5)).alias("w35"),
        u["e_dwithin"]("a", "b", F.lit(2.0)).alias("w20"),
        u["a_disjoint"]("a", "b").alias("disj_ab"),
        u["a_disjoint"]("a", "c").alias("disj_ac"),
        u["a_disjoint"]("a", "d").alias("disj_ad"),
    ).collect()[0]
    assert r["dab"] == 3.0  # constant parallel offset
    assert abs(r["dac"]) < 1e-9  # crossing → 0
    assert r["w35"] is True and r["w20"] is False
    assert r["disj_ab"] is True
    assert r["disj_ac"] is False  # they touch
    assert r["disj_ad"] is True  # disjoint in time


def test_tdwithin_periods(spark):
    df = _mk(spark)
    dw = PP.register_tdwithin_udf(spark)
    rows = df.select(dw("a", "c", F.lit(1.0)).alias("ss")).collect()[0]["ss"]
    # |dy(t)| where dy goes 5 → -5 linearly over 10 days; within 1.0 for
    # dy ∈ [-1, 1] → days 4.0..6.0 (u ∈ [0.4, 0.6])
    assert len(rows) == 1
    sp = rows[0]
    assert sp["lower"].day == 5 and sp["lower"].hour == 0  # Jan 1 + 4d = Jan 5
    assert sp["upper"].day == 7 and sp["upper"].hour == 0

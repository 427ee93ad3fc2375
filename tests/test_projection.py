"""Distributed-reprojection tier tests (functions/projection.py).

The column-level surface must never diverge from the scalar
wkt.project_wkt path the golden replay pins — every tier is compared
against the scalar kernels on the same coordinates.
"""

import math

import pytest
from pyspark.sql import functions as F

from mobilityduck_spark import wkt as W
from mobilityduck_spark.functions import projection as PJ

_PTS = [
    (-0.1276, 51.5074),
    (2.3522, 48.8566),
    (13.4050, 52.5200),
    (18.0686, 59.3293),
    (-73.9857, 40.7484),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(_PTS)],
        "id long, lon double, lat double",
    )


def test_catalyst_web_mercator_matches_scalar_kernel(spark):
    rows = (
        _df(spark)
        .select(
            "id",
            PJ.web_mercator_x(F.col("lon")).alias("x"),
            PJ.web_mercator_y(F.col("lat")).alias("y"),
        )
        .orderBy("id")
        .collect()
    )
    for r, (lon, lat) in zip(rows, _PTS):
        x, y = W._web_mercator(lon, lat)
        assert abs(r.x - x) < 1e-6 and abs(r.y - y) < 1e-6


def test_catalyst_web_mercator_stays_in_codegen(spark):
    plan = (
        _df(spark)
        .select(PJ.web_mercator_x(F.col("lon")).alias("x"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.mark.parametrize("dst", [3857, 32633, 2154, 27700, 2056, 28992])
def test_project_xy_udf_matches_scalar_kernels(spark, dst):
    udf = PJ.project_xy_udf(4326, dst)
    rows = (
        _df(spark)
        .select("id", "lon", "lat", udf(F.col("lon"), F.col("lat")).alias("p"))
        .orderBy("id")
        .collect()
    )
    for r in rows:
        wkt_out = W.project_wkt(f"POINT({r.lon} {r.lat})", 4326, dst)
        xs, ys = wkt_out[6:-1].split(" ")
        assert math.hypot(r.p.x - float(xs), r.p.y - float(ys)) < 1e-6


def test_project_xy_udf_southern_utm_false_northing(spark):
    # 32733 (UTM 33S) carries FN 10 000 000 — the y0 arm of the numpy
    # batch kernel; southern-hemisphere points must land on the scalar
    # path's values, not 10 000 km off
    pts = [(18.4233, -33.9188), (15.0, -10.0), (13.2, -25.7)]
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(pts)],
        "id long, lon double, lat double",
    )
    udf = PJ.project_xy_udf(4326, 32733)
    rows = (
        df.select("id", "lon", "lat", udf(F.col("lon"), F.col("lat")).alias("p"))
        .orderBy("id")
        .collect()
    )
    for r in rows:
        wkt_out = W.project_wkt(f"POINT({r.lon} {r.lat})", 4326, 32733)
        xs, ys = wkt_out[6:-1].split(" ")
        assert math.hypot(r.p.x - float(xs), r.p.y - float(ys)) < 1e-6
        assert 0 < r.p.y < 10000000.0  # FN applied, south of equator


def test_project_xy_udf_raises_at_build_time_for_unsupported():
    with pytest.raises(ValueError):
        PJ.project_xy_udf(4326, 99999)

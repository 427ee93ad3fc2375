"""area(GEODSTBOX): WGS84 ellipsoidal box area (geodesy.py).

The reference value is the golden in /root/reference/test/sql/stbox.test:83-86
(MEOS stbox_area with spheroid=true → GeographicLib polygon area); the
other cases are exact invariants of the Green's-theorem formulation.
"""

import math

import pytest

from mobilityduck_spark import geodesy


def test_reference_golden_value():
    a = geodesy.geodetic_box_area(1.0, 2.0, 4.0, 5.0)
    assert round(a, 1) == 110593375170.3


def test_mirror_symmetry_exact():
    n = geodesy.geodetic_box_area(1, 2, 4, 5)
    s = geodesy.geodetic_box_area(1, -5, 4, -2)
    assert n == s


def test_latitude_additivity_exact():
    # splitting at a parallel shares the mid geodesic edge, which
    # cancels exactly in the boundary integral
    whole = geodesy.geodetic_box_area(1, 2, 4, 5)
    parts = geodesy.geodetic_box_area(1, 2, 4, 3.5) + geodesy.geodetic_box_area(
        1, 3.5, 4, 5
    )
    assert whole == pytest.approx(parts, abs=1e-2)


def test_equator_spanning():
    sym = geodesy.geodetic_box_area(-3, -3, 3, 3)
    north = geodesy.geodetic_box_area(-3, 0, 3, 3)
    assert sym == pytest.approx(2 * north, abs=1e-2)


def test_tiny_box_matches_local_metric():
    # 0.01° box at lat 45: area ≈ M(φ)·N(φ)·cosφ·dφ·dλ
    lat, d = 45.0, 0.01
    a, f = geodesy.A, geodesy.FLAT
    e2 = f * (2 - f)
    phi = math.radians(lat + d / 2)
    M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
    N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    approx = M * N * math.cos(phi) * math.radians(d) ** 2
    got = geodesy.geodetic_box_area(10, lat, 10 + d, lat + d)
    assert got == pytest.approx(approx, rel=1e-6)


def test_degenerate_boxes_are_zero():
    assert geodesy.geodetic_box_area(1, 2, 1, 5) == 0.0
    assert geodesy.geodetic_box_area(1, 2, 4, 2) == pytest.approx(0.0, abs=1e-6)


def test_wide_box_single_geodesic_edges():
    # spans < 180° use ONE vertex-to-vertex geodesic per edge (reference
    # parity): the whole-box area must EXCEED the 60°+60° segmentized
    # sum, because the single 120° north edge bulges much further
    # poleward than two 60° sub-edges pinned at the base latitude
    whole = geodesy.geodetic_box_area(0, 10, 120, 20)
    halves = geodesy.geodetic_box_area(0, 10, 60, 20) + geodesy.geodetic_box_area(
        60, 10, 120, 20
    )
    assert whole > halves * 1.001
    # latitude additivity stays exact at wide spans (shared mid edge
    # cancels in the boundary integral)
    parts = geodesy.geodetic_box_area(0, 10, 120, 15) + geodesy.geodetic_box_area(
        0, 15, 120, 20
    )
    assert whole == pytest.approx(parts, rel=1e-12)


def test_wide_box_matches_spherical_excess_in_sphere_limit():
    """Independent cross-check of the 170°-span single-edge geometry:
    with flattening → 0 the geodesic polygon area must equal the exact
    spherical-excess (Oosterom–Strackee) area of the great-circle
    corner polygon — a corner-only closed form sharing no code with the
    Green's-theorem evaluation."""
    import numpy as np

    saved = (geodesy.FLAT, geodesy.E2, geodesy.EP2, geodesy.B)
    f = 1e-9
    geodesy.FLAT = f
    geodesy.E2 = f * (2 - f)
    geodesy.EP2 = geodesy.E2 / (1 - geodesy.E2)
    geodesy.B = geodesy.A * (1 - f)
    try:
        got = geodesy.geodetic_box_area(0, 10, 170, 25)
    finally:
        geodesy.FLAT, geodesy.E2, geodesy.EP2, geodesy.B = saved

    def to_xyz(lon, lat):
        lo, la = math.radians(lon), math.radians(lat)
        return np.array(
            [math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la)]
        )

    corners = [(0, 10), (170, 10), (170, 25), (0, 25)]
    pts = [to_xyz(*c) for c in corners]
    excess = 0.0
    for i in range(1, len(pts) - 1):
        a, b, c = pts[0], pts[i], pts[i + 1]
        num = float(np.dot(a, np.cross(b, c)))
        den = 1 + float(np.dot(a, b) + np.dot(b, c) + np.dot(a, c))
        excess += 2 * math.atan2(num, den)
    sphere = abs(excess) * geodesy.A**2
    assert got == pytest.approx(sphere, rel=1e-6)


def test_narrow_box_close_to_zone():
    # for a 1°-wide box the geodesic edges bulge only ~0.002°, so the
    # area sits within ~1e-4 of the parallel-bounded zone slice (and
    # slightly off it in a direction set by the competing N/S bulges)
    a, f = geodesy.A, geodesy.FLAT
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def q(lat):
        s = math.sin(math.radians(lat))
        return s / (1 - e2 * s * s) + math.atanh(e * s) / e

    zone = math.radians(1) * a * a * (1 - e2) / 2 * (q(50) - q(40))
    got = geodesy.geodetic_box_area(7, 40, 8, 50)
    assert got == pytest.approx(zone, rel=1e-4)


def test_geodetic_area_column(spark):
    from pyspark.sql import functions as F

    from mobilityduck_spark.functions import box as BX

    df = spark.range(1).select(
        BX.geodetic_area(
            BX.stbox(F.lit(1.0), F.lit(2.0), F.lit(4.0), F.lit(5.0))
        ).alias("a")
    )
    assert round(df.collect()[0]["a"], 1) == 110593375170.3


def test_pole_touching_box():
    # the polar edge is a point: additivity across an inner parallel
    # must still hold, and the cap slice is positive and finite
    whole = geodesy.geodetic_box_area(0, 80, 30, 90)
    parts = geodesy.geodetic_box_area(0, 80, 30, 89) + geodesy.geodetic_box_area(
        0, 89, 30, 90
    )
    assert whole > 0
    assert whole == pytest.approx(parts, rel=1e-9)


def test_geodetic_area_column_null_rows(spark):
    from pyspark.sql import functions as F

    from mobilityduck_spark.functions import box as BX

    df = spark.createDataFrame(
        [(1.0, 2.0, 4.0, 5.0), (None, None, None, None)],
        "x0 double, y0 double, x1 double, y1 double",
    ).select(
        BX.geodetic_area(
            BX.stbox(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
        ).alias("a")
    )
    got = [r["a"] for r in df.collect()]
    assert round(got[0], 1) == 110593375170.3 and got[1] is None

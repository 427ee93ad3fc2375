"""Spark-free unit tests for goldens-harness python-side evaluation:
the atGeometry restriction paths no golden case exercises (partial
coverage, single-crossing), 3-D literal helpers, and projections."""

import math

from mobilityduck_spark import goldens as G
from mobilityduck_spark import wkt


def _eval(sql: str) -> str:
    return G.render_python(G.python_eval(G.parse_select(sql)))


def test_atgeometry_crossing_singleton():
    # diagonal path crosses the horizontal line y=1 at (1,1), midpoint
    # in time -> singleton instant restriction
    got = _eval(
        "SELECT asText(atGeometry(tgeompoint "
        "'[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]', "
        "geometry 'Linestring(0 1,2 1)'::WKB_BLOB));"
    )
    assert got == "[POINT(1 1)@2000-01-02 00:00:00+00]"


def test_atgeometry_partial_collinear():
    # first half of the path lies on the line; boundary instant is
    # interpolated at the coverage edge
    got = _eval(
        "SELECT asText(atGeometry(tgeompoint "
        "'[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]', "
        "geometry 'Linestring(0 0,1 1)'::WKB_BLOB));"
    )
    assert got == (
        "[POINT(0 0)@2000-01-01 00:00:00+00, "
        "POINT(1 1)@2000-01-02 00:00:00+00]"
    )


def test_atgeometry_disjoint_is_null():
    got = _eval(
        "SELECT asText(atGeometry(tgeompoint "
        "'[Point(0 0)@2000-01-01, Point(1 0)@2000-01-02]', "
        "geometry 'Linestring(5 5,6 6)'::WKB_BLOB));"
    )
    assert got == "NULL"


def test_tg3d_length():
    got = _eval(
        "SELECT length(tgeompoint '[Point(0 0 0)@2000-01-01, "
        "Point(1 2 2)@2000-01-02]');"
    )
    assert got == "3"  # sqrt(1+4+4)


def test_project_wkt_web_mercator_origin():
    out = wkt.project_wkt("Point(0 0)", 4326, 3857)
    typ, coords = wkt.parse_wkt(out)
    assert typ == "POINT"
    assert abs(coords[0][0]) < 1e-9 and abs(coords[0][1]) < 1e-9


def test_project_wkt_lcc_roundtrip_consistency():
    # projecting the EPSG:3812 origin parameters lands near false
    # easting/northing (the projection is anchored there)
    out = wkt.project_wkt("Point(4.359215833333 50.797815)", 4326, 3812)
    _, coords = wkt.parse_wkt(out)
    x, y = coords[0]
    assert math.isclose(x, 649328.0, abs_tol=0.5)
    assert math.isclose(y, 665262.0, abs_tol=0.5)

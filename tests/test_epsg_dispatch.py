"""EPSG parameter-table dispatcher tests (VERDICT r10 item 6).

No PROJ in this container, so every projection is validated the way
the UTM family was (tests/test_utm_transform.py): against an
INDEPENDENT published formulation of the same transform plus exact
frame anchors.

- OSGB 27700 TM kernel: the Ordnance Survey worked example from "A
  guide to coordinate systems in Great Britain" (OSGB36 geodetic →
  grid), which the OS computed with THEIR series — agreement < 1 mm is
  cross-implementation evidence. The Krüger-series kernel is also
  compared against an independent generalized Snyder TM inside the
  ±3° envelope where the Snyder truncation is sub-mm.
- The WGS84→OSGB36 Helmert is re-derived in matrix form with Bowring's
  direct (non-iterative) geodetic recovery — < 1 mm against the
  engine's fixed-point form. (Both use the OS single Helmert; the
  ~2 m datum-model residual vs OSTN15 is documented, not tested.)
- Lambert-93 / CC zones: exact natural-origin anchors, central-
  meridian invariant, and < 1 mm against an independent IGN-style LCC
  written with the isometric-latitude formulation.
"""

import math

import pytest

from mobilityduck_spark import wkt as W

# --------------------------------------------------------- OSGB kernel

_OSGB_TM = W._kruger_tm(
    "airy1830", 49.0, -2.0, 0.9996012717, 400000.0, -100000.0
)


def test_osgb_tm_matches_os_worked_example_under_1mm():
    # OS guide worked example: φ 52°39'27.2531"N, λ 1°43'4.5177"E
    # (OSGB36) → E 651409.903, N 313177.270
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = _OSGB_TM(lon, lat)
    assert abs(e - 651409.903) < 1e-3
    assert abs(n - 313177.270) < 1e-3


def _snyder_tm(a, f, lat0_deg, lon0_deg, k0, x0, y0):
    """Independent check implementation: Snyder eq. 8-9..8-17 with a
    parameterized ellipsoid and latitude of natural origin."""
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    lon0 = math.radians(lon0_deg)
    m1 = 1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256
    m2 = 3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024
    m3 = 15 * e2**2 / 256 + 45 * e2**3 / 1024
    m4 = 35 * e2**3 / 3072

    def arc(phi):
        return a * (
            m1 * phi - m2 * math.sin(2 * phi) + m3 * math.sin(4 * phi)
            - m4 * math.sin(6 * phi)
        )

    arc0 = arc(math.radians(lat0_deg))

    def fwd(lon, lat):
        phi, lam = math.radians(lat), math.radians(lon)
        sp, cp, tp = math.sin(phi), math.cos(phi), math.tan(phi)
        nu = a / math.sqrt(1 - e2 * sp * sp)
        t = tp * tp
        c = ep2 * cp * cp
        big_a = (lam - lon0) * cp
        x = k0 * nu * (
            big_a
            + (1 - t + c) * big_a**3 / 6
            + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * big_a**5 / 120
        )
        y = k0 * (
            arc(phi) - arc0
            + nu * tp * (
                big_a**2 / 2
                + (5 - t + 9 * c + 4 * c * c) * big_a**4 / 24
                + (61 - 58 * t + t * t + 600 * c - 330 * ep2)
                * big_a**6 / 720
            )
        )
        return x0 + x, y0 + y

    return fwd


@pytest.mark.parametrize(
    "lon,lat",
    [
        (-0.1276, 51.5074),   # London
        (-2.0, 54.0),         # on the central meridian
        (-3.1883, 55.9533),   # Edinburgh
        (-4.2518, 55.8642),   # Glasgow (Δλ 2.25°)
        (0.9, 51.9),          # East Anglia (Δλ 2.9°)
    ],
)
def test_osgb_tm_matches_independent_snyder_under_1mm(lon, lat):
    # inside ±3° of the central meridian the truncated Snyder series
    # is itself sub-mm, so disagreement would indict the Krüger kernel
    a, f = W._ELLIPSOIDS["airy1830"]
    snyder = _snyder_tm(a, f, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0)
    e1, n1 = _OSGB_TM(lon, lat)
    e2_, n2 = snyder(lon, lat)
    assert math.hypot(e1 - e2_, n1 - n2) < 1e-3


def _independent_osgb(lon, lat):
    """WGS84 → 27700 with an independently-written Helmert: explicit
    rotation matrix and Bowring's direct geodetic recovery (vs the
    engine's component-wise transform + fixed-point iteration)."""
    aw, fw = 6378137.0, 1 / 298.257223563
    e2w = fw * (2 - fw)
    phi, lam = math.radians(lat), math.radians(lon)
    nu = aw / math.sqrt(1 - e2w * math.sin(phi) ** 2)
    p0 = [
        nu * math.cos(phi) * math.cos(lam),
        nu * math.cos(phi) * math.sin(lam),
        nu * (1 - e2w) * math.sin(phi),
    ]
    tx, ty, tz, rxs, rys, rzs, ppm = W._HELMERT_PARAMS["OSGB36"]
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rxs, rys, rzs))
    s = 1 + ppm * 1e-6
    rot = [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]]
    t = [tx, ty, tz]
    p = [
        t[i] + s * sum(rot[i][j] * p0[j] for j in range(3))
        for i in range(3)
    ]
    # Bowring 1976 direct solution on Airy 1830
    a, f = W._ELLIPSOIDS["airy1830"]
    b = a * (1 - f)
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    x, y, z = p
    r = math.hypot(x, y)
    u = math.atan2(z * a, r * b)
    phi2 = math.atan2(
        z + ep2 * b * math.sin(u) ** 3, r - e2 * a * math.cos(u) ** 3
    )
    lam2 = math.atan2(y, x)
    return _OSGB_TM(math.degrees(lam2), math.degrees(phi2))


@pytest.mark.parametrize(
    "lon,lat",
    [(-0.1276, 51.5074), (-3.1883, 55.9533), (-1.2577, 51.7520)],
)
def test_osgb_end_to_end_matches_independent_helmert_under_1mm(lon, lat):
    e1, n1 = W._PROJECTIONS[(4326, 27700)](lon, lat)
    e2_, n2 = _independent_osgb(lon, lat)
    assert math.hypot(e1 - e2_, n1 - n2) < 1e-3


# ----------------------------------------------------- Lambert zones


def _ign_lcc(lat1_deg, lat2_deg, lat0_deg, lon0_deg, x0, y0):
    """Independent LCC-2SP: the IGN formulation through the isometric
    latitude (NTG_71 conventions) rather than Snyder's t/m functions."""
    a, f = W._ELLIPSOIDS["GRS80"]
    e = math.sqrt(f * (2 - f))

    def iso(phi):
        es = e * math.sin(phi)
        return math.log(
            math.tan(math.pi / 4 + phi / 2)
        ) - e / 2 * math.log((1 + es) / (1 - es))

    def gn(phi):  # grande normale
        return a / math.sqrt(1 - (e * math.sin(phi)) ** 2)

    p1, p2 = math.radians(lat1_deg), math.radians(lat2_deg)
    p0 = math.radians(lat0_deg)
    n = math.log(
        (gn(p2) * math.cos(p2)) / (gn(p1) * math.cos(p1))
    ) / (iso(p1) - iso(p2))
    c = gn(p1) * math.cos(p1) / n * math.exp(n * iso(p1))
    ys = y0 + c * math.exp(-n * iso(p0))

    def fwd(lon, lat):
        phi, lam = math.radians(lat), math.radians(lon)
        r = c * math.exp(-n * iso(phi))
        g = n * (lam - math.radians(lon0_deg))
        return x0 + r * math.sin(g), ys - r * math.cos(g)

    return fwd


def test_lambert93_origin_and_meridian_anchors():
    fwd = W._PROJECTIONS[(4326, 2154)]
    x, y = fwd(3.0, 46.5)
    assert abs(x - 700000.0) < 1e-6 and abs(y - 6600000.0) < 1e-6
    for lat in (42.0, 46.5, 51.0):
        x, _ = fwd(3.0, lat)
        assert abs(x - 700000.0) < 1e-9  # central meridian → x = FE


@pytest.mark.parametrize(
    "lon,lat",
    [
        (2.3522, 48.8566),    # Paris
        (5.3698, 43.2965),    # Marseille
        (-4.4861, 48.3904),   # Brest
        (7.75, 48.58),        # Strasbourg
    ],
)
def test_lambert93_matches_independent_ign_under_1mm(lon, lat):
    fwd = W._PROJECTIONS[(4326, 2154)]
    ign = _ign_lcc(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0)
    x1, y1 = fwd(lon, lat)
    x2, y2 = ign(lon, lat)
    assert math.hypot(x1 - x2, y1 - y2) < 1e-3


@pytest.mark.parametrize("z", range(9))
def test_cc_zone_anchors_and_independent_agreement(z):
    code = 3942 + z
    lat0 = 42.0 + z
    fwd = W._PROJECTIONS[(4326, code)]
    x, y = fwd(3.0, lat0)
    assert abs(x - 1700000.0) < 1e-6
    assert abs(y - (z * 1000000.0 + 1200000.0)) < 1e-6
    ign = _ign_lcc(
        lat0 - 0.75, lat0 + 0.75, lat0, 3.0,
        1700000.0, z * 1000000.0 + 1200000.0,
    )
    for lon, lat in [(1.5, lat0 + 0.6), (5.2, lat0 - 0.7)]:
        x1, y1 = fwd(lon, lat)
        x2, y2 = ign(lon, lat)
        assert math.hypot(x1 - x2, y1 - y2) < 1e-3


# ------------------------------------------- round-11 family growth
# SWEREF99 TM / Poland CS92 / NZTM2000 (pure GRS80 TM parameters),
# DHDN Gauss-Krüger (Bessel + BKG Helmert), LAEA Europe 3035.


@pytest.mark.parametrize(
    "code,lon0,k0,x0,y0,pts",
    [
        (3006, 15.0, 0.9996, 500000.0, 0.0,
         [(14.5, 60.0), (16.5, 57.0), (13.0, 55.6)]),
        (2180, 19.0, 0.9993, 500000.0, -5300000.0,
         [(21.01, 52.23), (19.94, 50.06), (17.0, 51.1)]),
        (2193, 173.0, 0.9996, 1600000.0, 10000000.0,
         [(174.7762, -41.2865), (172.6362, -43.5321)]),
    ],
)
def test_tm_entries_match_independent_snyder_under_1mm(
    code, lon0, k0, x0, y0, pts
):
    # all sample points sit inside ±3° of the central meridian, where
    # the truncated Snyder series is itself sub-mm
    a, f = W._ELLIPSOIDS["GRS80"]
    snyder = _snyder_tm(a, f, 0.0, lon0, k0, x0, y0)
    fwd = W._PROJECTIONS[(4326, code)]
    for lon, lat in pts:
        x1, y1 = fwd(lon, lat)
        x2, y2 = snyder(lon, lat)
        assert math.hypot(x1 - x2, y1 - y2) < 1e-3
    # natural-origin anchor: equator × central meridian → (FE, FN)
    x, y = fwd(lon0, 0.0)
    assert abs(x - x0) < 1e-6 and abs(y - y0) < 1e-6


def test_dhdn_gk_kernel_matches_independent_snyder_under_1mm():
    a, f = W._ELLIPSOIDS["bessel1841"]
    kruger = W._kruger_tm("bessel1841", 0.0, 9.0, 1.0, 3500000.0, 0.0)
    snyder = _snyder_tm(a, f, 0.0, 9.0, 1.0, 3500000.0, 0.0)
    for lon, lat in [(9.99, 53.55), (9.18, 48.78), (11.5, 48.1)]:
        x1, y1 = kruger(lon, lat)
        x2, y2 = snyder(lon, lat)
        assert math.hypot(x1 - x2, y1 - y2) < 1e-3


def _independent_dhdn_gk3(lon, lat):
    """WGS84 → 31467 with the independently-written Helmert of
    _independent_osgb (matrix form + Bowring direct recovery) swapped
    onto the DHDN parameters and Bessel 1841."""
    aw, fw = 6378137.0, 1 / 298.257223563
    e2w = fw * (2 - fw)
    phi, lam = math.radians(lat), math.radians(lon)
    nu = aw / math.sqrt(1 - e2w * math.sin(phi) ** 2)
    p0 = [
        nu * math.cos(phi) * math.cos(lam),
        nu * math.cos(phi) * math.sin(lam),
        nu * (1 - e2w) * math.sin(phi),
    ]
    tx, ty, tz, rxs, rys, rzs, ppm = W._HELMERT_PARAMS["DHDN"]
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rxs, rys, rzs))
    s = 1 + ppm * 1e-6
    rot = [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]]
    t = [tx, ty, tz]
    p = [
        t[i] + s * sum(rot[i][j] * p0[j] for j in range(3))
        for i in range(3)
    ]
    a, f = W._ELLIPSOIDS["bessel1841"]
    b = a * (1 - f)
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    x, y, z = p
    r = math.hypot(x, y)
    u = math.atan2(z * a, r * b)
    phi2 = math.atan2(
        z + ep2 * b * math.sin(u) ** 3, r - e2 * a * math.cos(u) ** 3
    )
    lam2 = math.atan2(y, x)
    gk = W._kruger_tm("bessel1841", 0.0, 9.0, 1.0, 3500000.0, 0.0)
    return gk(math.degrees(lam2), math.degrees(phi2))


@pytest.mark.parametrize(
    "lon,lat",
    [(9.99, 53.55), (9.18, 48.78), (8.68, 50.11)],
)
def test_dhdn_end_to_end_matches_independent_helmert_under_1mm(lon, lat):
    x1, y1 = W._PROJECTIONS[(4326, 31467)](lon, lat)
    x2, y2 = _independent_dhdn_gk3(lon, lat)
    assert math.hypot(x1 - x2, y1 - y2) < 1e-3


def test_dhdn_zone_false_eastings():
    # zone z carries FE = z*1e6 + 500000 at lon0 = 3z; project a point
    # ON each central meridian and check x ≈ FE (the Helmert shifts the
    # meridian by only ~ the datum offset, so allow metres, not mm)
    for code, z in [(31466, 2), (31467, 3), (31468, 4), (31469, 5)]:
        x, _ = W._PROJECTIONS[(4326, code)](3.0 * z, 51.0)
        assert abs(x - (z * 1e6 + 500000.0)) < 200.0


# ------------------------------------------------------ LAEA (3035)


def _authalic_series_laea(lon, lat, lat0_deg=52.0, lon0_deg=10.0,
                          x0=4321000.0, y0=3210000.0):
    """Independent LAEA: authalic latitude via the Snyder eq. 3-18
    SERIES (vs the kernel's exact asin(q/qp)), then the oblique
    azimuthal equal-area on the authalic sphere."""
    a, f = W._ELLIPSOIDS["GRS80"]
    e2 = f * (2 - f)
    e4, e6 = e2 * e2, e2 * e2 * e2

    def beta(phi):
        return (
            phi
            - (e2 / 3 + 31 * e4 / 180 + 59 * e6 / 560) * math.sin(2 * phi)
            + (17 * e4 / 360 + 61 * e6 / 1260) * math.sin(4 * phi)
            - (383 * e6 / 45360) * math.sin(6 * phi)
        )

    e = math.sqrt(e2)
    sp = 1.0
    qp = (1 - e2) * (
        sp / (1 - e2) - (1 / (2 * e)) * math.log((1 - e) / (1 + e))
    )
    rq = a * math.sqrt(qp / 2)
    phi0 = math.radians(lat0_deg)
    b0 = beta(phi0)
    m0 = math.cos(phi0) / math.sqrt(1 - e2 * math.sin(phi0) ** 2)
    d = a * m0 / (rq * math.cos(b0))
    bp = beta(math.radians(lat))
    dl = math.radians(lon - lon0_deg)
    bb = rq * math.sqrt(
        2 / (
            1 + math.sin(b0) * math.sin(bp)
            + math.cos(b0) * math.cos(bp) * math.cos(dl)
        )
    )
    return (
        x0 + bb * d * math.cos(bp) * math.sin(dl),
        y0 + (bb / d) * (
            math.cos(b0) * math.sin(bp)
            - math.sin(b0) * math.cos(bp) * math.cos(dl)
        ),
    )


def test_laea_origin_anchor_and_meridian():
    fwd = W._PROJECTIONS[(4326, 3035)]
    x, y = fwd(10.0, 52.0)
    assert abs(x - 4321000.0) < 1e-6 and abs(y - 3210000.0) < 1e-6
    for lat in (40.0, 52.0, 65.0):
        x, _ = fwd(10.0, lat)
        assert abs(x - 4321000.0) < 1e-9  # central meridian → x = FE


@pytest.mark.parametrize(
    "lon,lat",
    [
        (2.3522, 48.8566),    # Paris
        (24.9384, 60.1699),   # Helsinki
        (-9.1393, 38.7223),   # Lisbon
        (25.2797, 54.6872),   # Vilnius
    ],
)
def test_laea_matches_independent_series_under_1mm(lon, lat):
    x1, y1 = W._PROJECTIONS[(4326, 3035)](lon, lat)
    x2, y2 = _authalic_series_laea(lon, lat)
    assert math.hypot(x1 - x2, y1 - y2) < 1e-3


@pytest.mark.parametrize(
    "lon,lat",
    [(2.3522, 48.8566), (24.9384, 60.1699), (10.0, 52.0), (-5.0, 40.0)],
)
def test_laea_jacobian_is_equal_area(lon, lat):
    # formulation-independent property: an equal-area projection's
    # Jacobian determinant equals the ellipsoidal area element
    # M·N·cosφ per radian² everywhere
    fwd = W._PROJECTIONS[(4326, 3035)]
    a, f = W._ELLIPSOIDS["GRS80"]
    e2 = f * (2 - f)
    h = 1e-5  # radians
    hd = math.degrees(h)
    xe, _ye = fwd(lon + hd, lat)
    xw, _yw = fwd(lon - hd, lat)
    xn, yn = fwd(lon, lat + hd)
    xs, ys = fwd(lon, lat - hd)
    _xe, ye = fwd(lon + hd, lat)
    _xw, yw = fwd(lon - hd, lat)
    dxdl, dydl = (xe - xw) / (2 * h), (ye - yw) / (2 * h)
    dxdp, dydp = (xn - xs) / (2 * h), (yn - ys) / (2 * h)
    jac = abs(dxdl * dydp - dydl * dxdp)
    phi = math.radians(lat)
    w2 = 1 - e2 * math.sin(phi) ** 2
    m = a * (1 - e2) / w2**1.5
    n = a / math.sqrt(w2)
    assert abs(jac - m * n * math.cos(phi)) / (m * n) < 1e-4


# ------------------------- RD New (28992) + Swiss LV95/LV03 kernels


def _numeric_scale_and_angle(fwd, lon, lat, a, f):
    """Local scale along meridian/parallel and the angle between their
    images — formulation-independent conformality probes: a conformal
    projection has equal scales and a 90° intersection everywhere."""
    e2 = f * (2 - f)
    phi = math.radians(lat)
    w2 = 1 - e2 * math.sin(phi) ** 2
    m = a * (1 - e2) / w2**1.5
    n = a / math.sqrt(w2)
    h = 1e-6  # radians
    hd = math.degrees(h)
    xn, yn = fwd(lon, lat + hd)
    xs, ys = fwd(lon, lat - hd)
    xe, ye = fwd(lon + hd, lat)
    xw, yw = fwd(lon - hd, lat)
    dmer = (xn - xs, yn - ys)
    dpar = (xe - xw, ye - yw)
    k_mer = math.hypot(*dmer) / (2 * h * m)
    k_par = math.hypot(*dpar) / (2 * h * n * math.cos(phi))
    cosang = (dmer[0] * dpar[0] + dmer[1] * dpar[1]) / (
        math.hypot(*dmer) * math.hypot(*dpar)
    )
    return k_mer, k_par, cosang


_RD_LAT0 = 52 + 9 / 60 + 22.178 / 3600
_RD_LON0 = 5 + 23 / 60 + 15.500 / 3600


def _rd_kernel():
    return W._oblique_stereographic(
        "bessel1841", _RD_LAT0, _RD_LON0, 0.9999079, 155000.0, 463000.0
    )


def test_rd_kernel_matches_epsg_worked_example_under_1mm():
    # EPSG Guidance Note 7-2, method 9809 worked example (Amersfoort
    # geodetic, no datum step): 53°N 6°E → E 196105.283, N 557057.739
    x, y = _rd_kernel()(6.0, 53.0)
    assert abs(x - 196105.283) < 1e-3
    assert abs(y - 557057.739) < 1e-3


def test_rd_kernel_origin_anchor_and_scale():
    rd = _rd_kernel()
    x, y = rd(_RD_LON0, _RD_LAT0)
    assert abs(x - 155000.0) < 1e-6 and abs(y - 463000.0) < 1e-6
    a, f = W._ELLIPSOIDS["bessel1841"]
    k_mer, k_par, cosang = _numeric_scale_and_angle(
        rd, _RD_LON0, _RD_LAT0, a, f
    )
    # stereographic about the natural origin: local scale there is k0
    assert abs(k_mer - 0.9999079) < 1e-6
    assert abs(k_par - 0.9999079) < 1e-6
    assert abs(cosang) < 1e-6


@pytest.mark.parametrize(
    "lon,lat", [(4.9, 52.37), (6.57, 53.22), (5.12, 52.09), (3.61, 51.5)]
)
def test_rd_kernel_is_conformal(lon, lat):
    a, f = W._ELLIPSOIDS["bessel1841"]
    k_mer, k_par, cosang = _numeric_scale_and_angle(
        _rd_kernel(), lon, lat, a, f
    )
    assert abs(k_mer / k_par - 1) < 1e-6
    assert abs(cosang) < 1e-6


def test_swiss_origin_anchor_scale_and_conformality():
    sw = W._swiss_oblique_mercator()
    lon0 = 7 + 26 / 60 + 22.50 / 3600
    lat0 = 46 + 57 / 60 + 8.66 / 3600
    x, y = sw(lon0, lat0)
    assert abs(x - 2600000.0) < 1e-6 and abs(y - 1200000.0) < 1e-6
    a, f = W._ELLIPSOIDS["bessel1841"]
    # Rosenmund has no k0: unit scale and zero convergence at Bern —
    # this pins alpha/b0/K, which a pure conformality test cannot (any
    # composition of conformal maps stays conformal)
    k_mer, k_par, cosang = _numeric_scale_and_angle(sw, lon0, lat0, a, f)
    assert abs(k_mer - 1.0) < 1e-6 and abs(k_par - 1.0) < 1e-6
    assert abs(cosang) < 1e-6
    for lon, lat in [(8.54, 47.38), (6.14, 46.2), (9.84, 46.5)]:
        k_mer, k_par, cosang = _numeric_scale_and_angle(sw, lon, lat, a, f)
        assert abs(k_mer / k_par - 1) < 1e-6
        assert abs(cosang) < 1e-6


def test_lv03_is_lv95_minus_false_origin_shift():
    e95, n95 = W._PROJECTIONS[(4326, 2056)](8.5417, 47.3769)
    e03, n03 = W._PROJECTIONS[(4326, 21781)](8.5417, 47.3769)
    assert abs((e95 - e03) - 2000000.0) < 1e-9
    assert abs((n95 - n03) - 1000000.0) < 1e-9


def _swisstopo_approx_inverse(e03, n03):
    """swisstopo's published approximate polynomials LV03 → WGS84
    ("Approximate formulas for the transformation between Swiss
    projection coordinates and WGS84", ~1 m accuracy) — a fitted,
    fully independent formulation including the datum step."""
    yp = (e03 - 600000.0) / 1e6
    xp = (n03 - 200000.0) / 1e6
    lam = (
        2.6779094 + 4.728982 * yp + 0.791484 * yp * xp
        + 0.1306 * yp * xp * xp - 0.0436 * yp**3
    )
    phi = (
        16.9023892 + 3.238272 * xp - 0.270978 * yp * yp
        - 0.002528 * xp * xp - 0.0447 * yp * yp * xp - 0.0140 * xp**3
    )
    return lam * 100 / 36, phi * 100 / 36  # 10000" → degrees


@pytest.mark.parametrize(
    "lon,lat", [(7.4474, 46.9480), (8.5417, 47.3769), (6.1432, 46.2044)]
)
def test_swiss_end_to_end_roundtrips_published_approx_inverse(lon, lat):
    # WGS84 → (this dispatcher) → LV03 → (swisstopo approx inverse) →
    # WGS84 must close within the approx formulas' ~1 m (≈ 1.3e-5°)
    # plus the single-Helmert class — allow 3 m
    e03, n03 = W._PROJECTIONS[(4326, 21781)](lon, lat)
    lon2, lat2 = _swisstopo_approx_inverse(e03, n03)
    assert abs(lon2 - lon) < 4e-5 and abs(lat2 - lat) < 3e-5


def test_project_wkt_dispatch_and_boundary():
    out = W.project_wkt("POINT(2.3522 48.8566)", 4326, 2154)
    assert out.startswith("POINT(65")  # Paris ≈ x 652 km
    # ETRS89 source reuses the WGS84-coincident closed forms
    out2 = W.project_wkt("POINT(2.3522 48.8566)", 4258, 2154)
    assert out == out2
    # new-family dispatch goes through project_wkt too
    out3 = W.project_wkt("POINT(18.0686 59.3293)", 4326, 3006)
    assert out3.startswith("POINT(67")  # Stockholm ≈ x 674 km
    for bad in (27701, 2155, 3941, 3951, 31370, 31465, 31470, 3007):
        with pytest.raises(ValueError):
            W.project_wkt("POINT(0 50)", 4326, bad)

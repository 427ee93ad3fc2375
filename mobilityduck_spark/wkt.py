"""Minimal WKT/WKB utilities (pure Python, no geometry libs).

Supports POINT / LINESTRING / POLYGON — the geometry subset the
reference's test corpus and workload use (SURVEY.md §2.9). Two render
styles: MEOS-style (`LINESTRING(0 0,0 1)`) and duckdb-spatial-style
(`LINESTRING (0 0, 0 1)`).
"""

from __future__ import annotations

import math
import re
import struct

_GEOM_RE = re.compile(r"(?is)^\s*(point|linestring|polygon)\s*\((.*)\)\s*$")


def parse_wkt(s: str) -> tuple[str, list]:
    """→ (TYPE, coords): POINT → [(x,y)], LINESTRING → [(x,y)...],
    POLYGON → [ring][(x,y)...]."""
    m = _GEOM_RE.match(s.strip())
    if not m:
        raise ValueError(f"unsupported WKT: {s!r}")
    typ = m.group(1).upper()
    body = m.group(2)

    def coords(txt):
        out = []
        for pair in txt.split(","):
            xs = pair.split()
            out.append((float(xs[0]), float(xs[1])))
        return out

    if typ == "POINT":
        return typ, coords(body)
    if typ == "LINESTRING":
        return typ, coords(body)
    rings = []
    for ring in re.findall(r"\(([^()]*)\)", body):
        rings.append(coords(ring))
    return typ, rings


def _n(x: float, precision: int | None = None) -> str:
    if precision is not None:
        s = f"{x:.{precision}f}"
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return "0" if s == "-0" else s
    return str(int(x)) if x == int(x) else repr(x)


def render_wkt(
    typ: str, coords, style: str = "meos", precision: int | None = None
) -> str:
    """style 'meos': LINESTRING(0 0,0 1); 'duckdb': LINESTRING (0 0, 0 1).
    precision: max decimal digits (MEOS asText/asEWKT maxdd — trailing
    zeros trimmed)."""
    sp = " " if style == "duckdb" else ""
    join = ", " if style == "duckdb" else ","

    def pts(cs):
        return join.join(
            f"{_n(x, precision)} {_n(y, precision)}" for x, y in cs
        )

    if typ == "POINT":
        return f"POINT{sp}({pts(coords)})"
    if typ == "LINESTRING":
        return f"LINESTRING{sp}({pts(coords)})"
    inner = join.join(f"({pts(r)})" for r in coords)
    return f"POLYGON{sp}({inner})"


def normalize_wkt(
    s: str, style: str = "meos", precision: int | None = None
) -> str:
    typ, coords = parse_wkt(s)
    return render_wkt(typ, coords, style, precision)


# ------------------------------------------------------------- projections
# Closed-form forward projections for the SRIDs the reference corpus
# transforms to (tpoint_transform golden cases use 3857; geoset.test uses
# 3812). Formulas: Snyder, "Map Projections — A Working Manual" (public).
_GRS80_A = 6378137.0
_GRS80_F = 1 / 298.257222101


def _lcc_2sp(lat1_deg, lat2_deg, lat0_deg, lon0_deg, x0, y0):
    """Lambert Conformal Conic 2SP on GRS80 (Snyder eq. 15-1..15-9)."""
    a, f = _GRS80_A, _GRS80_F
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    lat1, lat2 = math.radians(lat1_deg), math.radians(lat2_deg)
    lat0, lon0 = math.radians(lat0_deg), math.radians(lon0_deg)

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    def t(phi):
        es = e * math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)

    n = (math.log(m(lat1)) - math.log(m(lat2))) / (
        math.log(t(lat1)) - math.log(t(lat2))
    )
    bigf = m(lat1) / (n * t(lat1) ** n)
    rho0 = a * bigf * t(lat0) ** n

    def fwd(lon, lat):
        phi, lam = math.radians(lat), math.radians(lon)
        rho = a * bigf * t(phi) ** n
        th = n * (lam - lon0)
        return x0 + rho * math.sin(th), y0 + rho0 - rho * math.cos(th)

    return fwd


def _web_mercator(lon, lat):
    # spherical mercator on the WGS84 semi-major axis (EPSG:3857)
    x = _GRS80_A * math.radians(lon)
    y = _GRS80_A * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
    return x, y


def _transverse_mercator(lon0_deg, k0=0.9996, x0=500000.0, y0=0.0):
    """Ellipsoidal transverse Mercator forward on GRS80/WGS84 (Snyder
    eq. 8-9..8-17, 3-1..3-21) — the projection under every UTM zone.
    Series accuracy is sub-millimetre within the ±3° zone width."""
    a, f = _GRS80_A, _GRS80_F
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    lon0 = math.radians(lon0_deg)
    # meridional arc coefficients (Snyder 3-21)
    m1 = 1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256
    m2 = 3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024
    m3 = 15 * e2**2 / 256 + 45 * e2**3 / 1024
    m4 = 35 * e2**3 / 3072

    def arc(phi):
        return a * (
            m1 * phi - m2 * math.sin(2 * phi) + m3 * math.sin(4 * phi)
            - m4 * math.sin(6 * phi)
        )

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
            arc(phi)
            + nu * tp * (
                big_a**2 / 2
                + (5 - t + 9 * c + 4 * c * c) * big_a**4 / 24
                + (61 - 58 * t + t * t + 600 * c - 330 * ep2)
                * big_a**6 / 720
            )
        )
        return x0 + x, y0 + y

    return fwd


# ----------------------------------------------- EPSG parameter table
# Round-11 dispatcher (VERDICT r10 item 6): national grids expressed as
# published EPSG parameters over two generalized kernels — a Krüger
# n-series transverse Mercator (Karney 2011; nanometre-class inside a
# national extent, unlike the ±3°-envelope Snyder series the UTM path
# uses) and the Snyder LCC-2SP above — plus a 7-parameter position-
# vector Helmert (EPSG method 9606) for datums that are NOT
# WGS84-coincident. All constants are from the public EPSG registry.

_ELLIPSOIDS = {
    # name: (semi-major a, flattening f)
    "GRS80": (_GRS80_A, _GRS80_F),
    "airy1830": (6377563.396, 1 / 299.3249646),
    "bessel1841": (6377397.155, 1 / 299.1528128),
}

# WGS84 → target datum, position-vector convention (EPSG 9606):
# (tx m, ty m, tz m, rx arcsec, ry arcsec, rz arcsec, scale ppm)
_HELMERT_PARAMS = {
    # OSGB36: the OS-published single Helmert (nationwide accuracy
    # ~2 m vs the OSTN15 grid PROJ would apply; the kernels themselves
    # agree sub-mm — the residual is the datum model, stated in the
    # project_wkt docstring)
    "OSGB36": (-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421,
               20.4894),
    # DHDN (Potsdam): the BKG-published nationwide single Helmert
    # (position vector). Same accuracy class as the OSGB entry: ~1-2 m
    # vs the NTv2 grid PROJ applies; the GK kernel itself is sub-mm.
    "DHDN": (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7),
    # CH1903+ : swisstopo's published geocentric translation is
    # CH1903+→WGS84 (+674.374, +15.056, +405.346), pure 3-parameter —
    # stored here negated as the WGS84→datum direction this table uses.
    "CH1903plus": (-674.374, -15.056, -405.346, 0.0, 0.0, 0.0, 0.0),
    # Amersfoort: the EPSG-published position-vector set is
    # Amersfoort→WGS84 (565.417, 50.3319, 465.552, -0.398957",
    # 0.343988", -1.87740", 4.0772 ppm); the small-parameter inverse
    # (negate everything) is exact to << 1 mm at these magnitudes.
    # Residual vs the RDNAPTRANS grid PROJ applies: ~0.5-1 m.
    "Amersfoort": (-565.417, -50.3319, -465.552, 0.398957, -0.343988,
                   1.87740, -4.0772),
}


def _kruger_tm(ell: str, lat0_deg, lon0_deg, k0, x0, y0):
    """Generalized transverse Mercator via the 6th-order Krüger
    n-series (Karney 2011, the basis of PROJ's tmerc) on a named
    ellipsoid with a non-zero latitude of natural origin — the kernel
    behind the EPSG dispatcher's TM entries (OSGB 27700 spans ±5.5° of
    its central meridian, outside the Snyder series' sub-mm envelope)."""
    a, f = _ELLIPSOIDS[ell]
    n = f / (2 - f)
    big_a = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
    alpha = [
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440
        + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168
        + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ]
    e = math.sqrt(f * (2 - f))

    def xi_eta(lon, lat):
        phi = math.radians(lat)
        lam = math.radians(lon - lon0_deg)
        t = math.sinh(
            math.atanh(math.sin(phi)) - e * math.atanh(e * math.sin(phi))
        )
        xip = math.atan2(t, math.cos(lam))
        etap = math.asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
        xi = xip + sum(
            c * math.sin(2 * (j + 1) * xip) * math.cosh(2 * (j + 1) * etap)
            for j, c in enumerate(alpha)
        )
        eta = etap + sum(
            c * math.cos(2 * (j + 1) * xip) * math.sinh(2 * (j + 1) * etap)
            for j, c in enumerate(alpha)
        )
        return xi, eta

    # meridional arc to the natural origin (ξ at λ = λ0)
    xi0, _ = xi_eta(lon0_deg, lat0_deg)

    def fwd(lon, lat):
        xi, eta = xi_eta(lon, lat)
        return (
            x0 + k0 * big_a * eta,
            y0 + k0 * big_a * (xi - xi0),
        )

    return fwd


def _helmert_then(ell: str, datum: str, proj_fwd):
    """Compose a WGS84→datum position-vector Helmert (through
    geocentric XYZ at h=0, geodetic recovery by fixed-point iteration —
    converges to << 1 nm in ≤ 6 rounds) with a projection forward
    defined on the target datum's geodetic coordinates."""
    a, f = _ELLIPSOIDS[ell]
    e2 = f * (2 - f)
    aw, fw = _GRS80_A, 1 / 298.257223563  # WGS84 source ellipsoid
    e2w = fw * (2 - fw)
    tx, ty, tz, rxs, rys, rzs, ppm = _HELMERT_PARAMS[datum]
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rxs, rys, rzs))
    s = 1.0 + ppm * 1e-6

    def fwd(lon, lat):
        phi, lam = math.radians(lat), math.radians(lon)
        sp, cp = math.sin(phi), math.cos(phi)
        nu = aw / math.sqrt(1 - e2w * sp * sp)
        x = nu * cp * math.cos(lam)
        y = nu * cp * math.sin(lam)
        z = nu * (1 - e2w) * sp
        xt = tx + s * (x - rz * y + ry * z)
        yt = ty + s * (rz * x + y - rx * z)
        zt = tz + s * (-ry * x + rx * y + z)
        p = math.hypot(xt, yt)
        lam2 = math.atan2(yt, xt)
        phi2 = math.atan2(zt, p * (1 - e2))
        for _ in range(8):
            nu2 = a / math.sqrt(1 - e2 * math.sin(phi2) ** 2)
            phi2 = math.atan2(zt + e2 * nu2 * math.sin(phi2), p)
        return proj_fwd(math.degrees(lam2), math.degrees(phi2))

    return fwd


def _lambert_cc_zone(z: int):
    """RGF93 / CC42..CC50 conic-conformal zone (EPSG 3942..3950):
    lat0 = 42+i, standard parallels lat0 ∓ 0.75, lon0 = 3°E,
    FE 1 700 000, FN = i·1 000 000 + 1 200 000 (published pattern)."""
    lat0 = 42 + z
    return _lcc_2sp(
        lat0 - 0.75, lat0 + 0.75, lat0, 3.0,
        1700000.0, z * 1000000.0 + 1200000.0,
    )


def _laea(lat0_deg, lon0_deg, x0, y0):
    """Ellipsoidal Lambert azimuthal equal-area forward on GRS80
    (Snyder eq. 3-12, 24-2..24-19): authalic-latitude mapping q/qp,
    then the oblique azimuthal equal-area on the authalic sphere —
    the projection under EPSG:3035 (ETRS89-extended / LAEA Europe),
    the EU INSPIRE statistical-grid CRS."""
    a, f = _ELLIPSOIDS["GRS80"]
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def q(phi):
        sp = math.sin(phi)
        return (1 - e2) * (
            sp / (1 - e2 * sp * sp)
            - (1 / (2 * e)) * math.log((1 - e * sp) / (1 + e * sp))
        )

    qp = q(math.pi / 2)
    rq = a * math.sqrt(qp / 2)
    phi0 = math.radians(lat0_deg)
    beta0 = math.asin(q(phi0) / qp)
    m0 = math.cos(phi0) / math.sqrt(1 - e2 * math.sin(phi0) ** 2)
    d = a * m0 / (rq * math.cos(beta0))
    lon0 = math.radians(lon0_deg)

    def fwd(lon, lat):
        phi, lam = math.radians(lat), math.radians(lon)
        beta = math.asin(q(phi) / qp)
        dl = lam - lon0
        b = rq * math.sqrt(
            2 / (
                1 + math.sin(beta0) * math.sin(beta)
                + math.cos(beta0) * math.cos(beta) * math.cos(dl)
            )
        )
        x = b * d * math.cos(beta) * math.sin(dl)
        y = (b / d) * (
            math.cos(beta0) * math.sin(beta)
            - math.sin(beta0) * math.cos(beta) * math.cos(dl)
        )
        return x0 + x, y0 + y

    return fwd


def _oblique_stereographic(ell: str, lat0_deg, lon0_deg, k0, x0, y0):
    """EPSG method 9809 (Oblique and Equatorial Stereographic) — the
    double projection through the conformal sphere used by RD New
    (EPSG:28992). Formulas are the published EPSG Guidance Note 7-2
    sequence: conformal-sphere constants R = sqrt(rho0*nu0) and n, the
    chi/Lambda conformal mapping, then the spherical oblique
    stereographic about (chi0, Lambda0)."""
    a, f = _ELLIPSOIDS[ell]
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi0 = math.radians(lat0_deg)
    lam0 = math.radians(lon0_deg)
    sp0 = math.sin(phi0)
    rho0 = a * (1 - e2) / (1 - e2 * sp0 * sp0) ** 1.5
    nu0 = a / math.sqrt(1 - e2 * sp0 * sp0)
    r = math.sqrt(rho0 * nu0)
    n = math.sqrt(1 + e2 * math.cos(phi0) ** 4 / (1 - e2))
    s1 = (1 + sp0) / (1 - sp0)
    s2 = (1 - e * sp0) / (1 + e * sp0)
    w1 = (s1 * s2**e) ** n
    sin_chi00 = (w1 - 1) / (w1 + 1)
    c = (n + sp0) * (1 - sin_chi00) / ((n - sp0) * (1 + sin_chi00))
    w2 = c * w1
    chi0 = math.asin((w2 - 1) / (w2 + 1))
    lam_origin = lam0

    def fwd(lon, lat):
        phi, lam = math.radians(lat), math.radians(lon)
        sp = math.sin(phi)
        sa = (1 + sp) / (1 - sp)
        sb = (1 - e * sp) / (1 + e * sp)
        w = c * (sa * sb**e) ** n
        chi = math.asin((w - 1) / (w + 1))
        dl = n * (lam - lam_origin)
        b = 1 + math.sin(chi) * math.sin(chi0) + math.cos(chi) * math.cos(
            chi0
        ) * math.cos(dl)
        return (
            x0 + 2 * r * k0 * math.cos(chi) * math.sin(dl) / b,
            y0 + 2 * r * k0 * (
                math.sin(chi) * math.cos(chi0)
                - math.cos(chi) * math.sin(chi0) * math.cos(dl)
            ) / b,
        )

    return fwd


def _swiss_oblique_mercator(x0=2600000.0, y0=1200000.0):
    """CH1903/CH1903+ Swiss conformal cylindrical projection
    (Rosenmund; EPSG method 9815 as PROJ's somerc): Bessel 1841 →
    Gauss conformal sphere at the Bern origin → pseudo-equator
    rotation → Mercator. Formulas are swisstopo's published sequence
    ("Formulas and constants for ... the Swiss projection"). LV95
    carries FE/FN 2 600 000 / 1 200 000; LV03 the same grid minus
    2 000 000 / 1 000 000."""
    a, f = _ELLIPSOIDS["bessel1841"]
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi0 = math.radians(46 + 57 / 60 + 8.66 / 3600)
    lam0 = math.radians(7 + 26 / 60 + 22.50 / 3600)
    sp0 = math.sin(phi0)
    rr = a * math.sqrt(1 - e2) / (1 - e2 * sp0 * sp0)
    alpha = math.sqrt(1 + e2 / (1 - e2) * math.cos(phi0) ** 4)
    b0 = math.asin(sp0 / alpha)
    k = (
        math.log(math.tan(math.pi / 4 + b0 / 2))
        - alpha * math.log(math.tan(math.pi / 4 + phi0 / 2))
        + alpha * e / 2 * math.log((1 + e * sp0) / (1 - e * sp0))
    )

    def fwd(lon, lat):
        phi, lam = math.radians(lat), math.radians(lon)
        sp = math.sin(phi)
        s = (
            alpha * math.log(math.tan(math.pi / 4 + phi / 2))
            - alpha * e / 2 * math.log((1 + e * sp) / (1 - e * sp))
            + k
        )
        b = 2 * (math.atan(math.exp(s)) - math.pi / 4)
        l = alpha * (lam - lam0)
        # rotation onto the pseudo-equator through the projection of
        # the Bern origin
        lbar = math.atan2(
            math.sin(l), math.sin(b0) * math.tan(b) + math.cos(b0) * math.cos(l)
        )
        bbar = math.asin(
            math.cos(b0) * math.sin(b)
            - math.sin(b0) * math.cos(b) * math.cos(l)
        )
        return (
            x0 + rr * lbar,
            y0 + rr / 2 * math.log((1 + math.sin(bbar)) / (1 - math.sin(bbar))),
        )

    return fwd


def _dhdn_gk_zone(z: int):
    """DHDN / 3-degree Gauss-Krüger zone z (EPSG 31466..31469 for
    z 2..5): Bessel 1841 TM at lon0 = 3z°, k0 = 1, FE = z*1e6+500000,
    behind the BKG nationwide Helmert from WGS84."""
    return _helmert_then(
        "bessel1841",
        "DHDN",
        _kruger_tm("bessel1841", 0.0, 3.0 * z, 1.0,
                   z * 1000000.0 + 500000.0, 0.0),
    )


# EPSG:3812 — ETRS89 / Belgian Lambert 2008 (published EPSG parameters)
_PROJECTIONS = {
    (4326, 3857): _web_mercator,
    (4326, 3812): _lcc_2sp(
        49 + 50 / 60, 51 + 10 / 60, 50.797815,
        4 + 21 / 60 + 33.177 / 3600, 649328.0, 665262.0,
    ),
    # EPSG:27700 — OSGB36 / British National Grid: Airy 1830 TM with
    # the OS Helmert from WGS84 (datum-model residual ~2 m vs OSTN15,
    # kernel agreement sub-mm — tests/test_epsg_dispatch.py)
    (4326, 27700): _helmert_then(
        "airy1830",
        "OSGB36",
        _kruger_tm("airy1830", 49.0, -2.0, 0.9996012717,
                   400000.0, -100000.0),
    ),
    # EPSG:2154 — RGF93 / Lambert-93 (GRS80, datum ≡ WGS84 at this
    # engine's precision, like the other ETRS89-family entries)
    (4326, 2154): _lcc_2sp(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0),
    # EPSG:3942..3950 — RGF93 / CC42..CC50 zones
    **{
        (4326, 3942 + z): _lambert_cc_zone(z) for z in range(9)
    },
    # EPSG:3035 — ETRS89-extended / LAEA Europe (INSPIRE grids)
    (4326, 3035): _laea(52.0, 10.0, 4321000.0, 3210000.0),
    # EPSG:3006 — SWEREF99 TM (GRS80, datum ≡ WGS84 here)
    (4326, 3006): _kruger_tm("GRS80", 0.0, 15.0, 0.9996, 500000.0, 0.0),
    # EPSG:2180 — ETRS89 / Poland CS92 (±5° span → Krüger kernel)
    (4326, 2180): _kruger_tm("GRS80", 0.0, 19.0, 0.9993,
                             500000.0, -5300000.0),
    # EPSG:2193 — NZGD2000 / NZTM2000 (NZGD2000 ≡ WGS84 at this
    # engine's precision, like the other plate-fixed modern datums)
    (4326, 2193): _kruger_tm("GRS80", 0.0, 173.0, 0.9996,
                             1600000.0, 10000000.0),
    # EPSG:31466..31469 — DHDN / Gauss-Krüger zones 2..5
    **{
        (4326, 31464 + z): _dhdn_gk_zone(z) for z in range(2, 6)
    },
    # EPSG:28992 — Amersfoort / RD New (oblique stereographic 9809)
    (4326, 28992): _helmert_then(
        "bessel1841",
        "Amersfoort",
        _oblique_stereographic(
            "bessel1841",
            52 + 9 / 60 + 22.178 / 3600,
            5 + 23 / 60 + 15.500 / 3600,
            0.9999079, 155000.0, 463000.0,
        ),
    ),
    # EPSG:2056 — CH1903+ / LV95; EPSG:21781 — CH1903 / LV03 (same
    # Rosenmund grid, 2 000 000 / 1 000 000 smaller false origin; the
    # CH1903 vs CH1903+ datum difference is centimetres, below the
    # single-Helmert accuracy class documented for this table)
    (4326, 2056): _helmert_then(
        "bessel1841", "CH1903plus", _swiss_oblique_mercator()
    ),
    (4326, 21781): _helmert_then(
        "bessel1841", "CH1903plus",
        _swiss_oblique_mercator(600000.0, 200000.0),
    ),
}

# geographic CRSs whose datum is treated as coincident with WGS84 at
# this engine's precision (ETRS89/NAD83 differ by <1 m plate drift —
# the same zero-shift PROJ applies without datum grids)
_GEOGRAPHIC_SRIDS = {4326, 4258, 4269}


# UTM code ranges per EPSG band. Only the listed sub-ranges are UTM:
# the rest of the 269xx band is NAD83 State Plane (different FE/k0/
# central meridians — projecting those as UTM would be thousands of
# km off), and 258xx outside 25828-25838 is unassigned. Raise-rather-
# than-approximate, so the ranges are exact.
_UTM_BANDS = {
    326: (1, 60, 0.0),           # WGS 84 / UTM N
    327: (1, 60, 10000000.0),    # WGS 84 / UTM S
    258: (28, 38, 0.0),          # ETRS89 / UTM 28N-38N
    269: (1, 23, 0.0),           # NAD83 / UTM 1N-23N (269xx beyond
                                 # 26923 is State Plane, NOT UTM)
}


def _utm_fwd(src_srid: int, dst_srid: int):
    """Dynamic lookup for UTM targets — central meridian zone*6-183,
    k0=0.9996, FE 500 km, FN 10 000 km south. Returns None unless the
    pair is a supported geographic→UTM transform with the code inside
    its band's genuine UTM sub-range (_UTM_BANDS)."""
    if src_srid not in _GEOGRAPHIC_SRIDS:
        return None
    band = dst_srid // 100
    zone = dst_srid % 100
    rng = _UTM_BANDS.get(band)
    if rng is None or not rng[0] <= zone <= rng[1]:
        return None
    return _transverse_mercator(zone * 6 - 183, y0=rng[2])


def project_wkt(s: str, src_srid: int, dst_srid: int) -> str:
    """Reproject every coordinate of a POINT/LINESTRING/POLYGON WKT.

    Supported CRS pairs (closed-form, no PROJ): geographic
    (4326/4258/4269) → web mercator 3857, Belgian Lambert 3812,
    British National Grid 27700 (Airy TM behind the OS single Helmert
    — datum-model residual ~2 m vs the OSTN15 grid PROJ applies; the
    projection kernels agree sub-mm), RGF93 Lambert-93 2154 and the
    nine CC zones 3942-3950, LAEA Europe 3035, SWEREF99 TM 3006,
    Poland CS92 2180, NZTM2000 2193, DHDN Gauss-Krüger zones
    31466-31469 (BKG single Helmert, ~1-2 m datum residual vs NTv2
    like the OSGB entry), RD New 28992 (oblique stereographic 9809 on
    Bessel behind the inverted EPSG Amersfoort Helmert, ~0.5-1 m vs
    RDNAPTRANS), Swiss LV95 2056 / LV03 21781 (Rosenmund oblique
    Mercator behind the swisstopo 3-parameter shift), and any UTM zone
    (326zz/327zz/258zz/269zz). The reference accepts any EPSG pair by
    delegating to
    duckdb-spatial/PROJ (src/geo/geoset.cpp:95-115); this engine
    implements the published projection formulas for the families the
    workload uses and raises for anything else rather than
    approximating."""
    # geographic sources are datum-coincident at this precision
    # (_GEOGRAPHIC_SRIDS), so 4258/4269 use the 4326 closed forms
    lookup_src = 4326 if src_srid in _GEOGRAPHIC_SRIDS else src_srid
    fwd = _PROJECTIONS.get((lookup_src, dst_srid)) or _utm_fwd(
        src_srid, dst_srid
    )
    if fwd is None:
        raise ValueError(f"unsupported transform {src_srid}->{dst_srid}")
    typ, coords = parse_wkt(s)
    if typ == "POLYGON":
        new = [[fwd(x, y) for x, y in ring] for ring in coords]
    else:
        new = [fwd(x, y) for x, y in coords]
    return render_wkt(typ, new, style="meos")


def wkb_hex(s: str) -> str:
    """Little-endian WKB hex (uppercase) for POINT/LINESTRING/POLYGON."""
    typ, coords = parse_wkt(s)
    out = b"\x01"
    if typ == "POINT":
        out += struct.pack("<I", 1)
        out += struct.pack("<dd", *coords[0])
    elif typ == "LINESTRING":
        out += struct.pack("<I", 2) + struct.pack("<I", len(coords))
        for x, y in coords:
            out += struct.pack("<dd", x, y)
    else:
        out += struct.pack("<I", 3) + struct.pack("<I", len(coords))
        for ring in coords:
            out += struct.pack("<I", len(ring))
            for x, y in ring:
                out += struct.pack("<dd", x, y)
    return out.hex().upper()

"""Geodetic (ellipsoidal) area of a lon/lat STBOX on WGS84.

Reference surface: ``area(GEODSTBOX …)`` — the reference delegates to
MEOS ``stbox_area(box, spheroid=true)`` (src/geo/stbox_functions.cpp:444-474),
which builds the 4-corner polygon of the box and evaluates its ellipsoidal
area with geodesic edges (PostGIS geography area, i.e. GeographicLib's
polygon area on WGS84 — Karney 2013, "Algorithms for geodesics").

This implementation is NOT a port of GeographicLib's series expansions.
It evaluates the same quantity exactly via Green's theorem:

    Area = ∮ F(φ) dλ  along the boundary, where
    F(φ) = ∫_0^φ a²(1−e²) cosφ' / (1−e² sin²φ')² dφ'
         = (a²(1−e²)/2) [ sinφ/(1−e²sin²φ) + atanh(e sinφ)/e ]

For a box [λ1,λ2]×[φ1,φ2] the two meridian edges have dλ = 0 and drop
out, leaving the two equal-latitude geodesic edges:

    Area = ∫_north F(φ(λ)) dλ  −  ∫_south F(φ(λ)) dλ   (both eastward).

Each edge is the geodesic joining two points at the same geographic
latitude φ0, which is symmetric about its vertex.  On the auxiliary
sphere (Clairaut: cosβ sinα = sinα0, exact on a spheroid in reduced
latitude β) the edge is parameterized by the spherical arc σ with the
exact closed-form relations

    sinβ = cosα0 sinσ,   tanφ = tanβ/(1−f),
    dλ/dσ = (b/a) sinα0 √(1+k²sin²σ) / (1−cos²α0 sin²σ),  k² = e'²cos²α0,

so both the longitude span and the area integral are smooth 1-D
integrals evaluated with fixed-order Gauss–Legendre quadrature to
machine precision; the single shooting unknown α0 is solved by
bisection.  Verified against the reference golden
(test/sql/stbox.test:83-86): round(area, 1) == 110593375170.3 m².

Scale note: this is driver/UDF-side scalar math (a few thousand flops
per box); the Column form in functions/box.py wraps it in an
Arrow-batched pandas UDF.
"""

import math

import numpy as np

# WGS84 (the reference's geography datum; GEODSTBOX text I/O pins SRID 4326)
A = 6378137.0
FLAT = 1 / 298.257223563
E2 = FLAT * (2 - FLAT)
EP2 = E2 / (1.0 - E2)
B = A * (1 - FLAT)

_NODES, _WTS = np.polynomial.legendre.leggauss(64)


def _gl(fn, lo: float, hi: float) -> float:
    mid, half = (lo + hi) / 2.0, (hi - lo) / 2.0
    x = mid + half * _NODES
    return half * float(np.sum(_WTS * fn(x)))


def _area_per_lon(phi):
    """F(φ): ellipsoid area between the equator and latitude φ, per
    radian of longitude (authalic integral, exact closed form)."""
    s = np.sin(phi)
    q = s / (1 - E2 * s * s) + np.arctanh(math.sqrt(E2) * s) / math.sqrt(E2)
    return 0.5 * A * A * (1 - E2) * q


def _lam_span(c0: float, beta0: float) -> float:
    """Longitude span of the symmetric geodesic with cos α0 = c0 whose
    endpoints sit at reduced latitude β0 (> 0)."""
    s0 = math.sqrt(1 - c0 * c0)
    k2 = EP2 * c0 * c0
    sig1 = math.asin(min(1.0, math.sin(beta0) / c0))

    def integrand(sig):
        ss = np.sin(sig)
        return (B / A) * s0 * np.sqrt(1 + k2 * ss * ss) / (1 - (c0 * ss) ** 2)

    return _gl(integrand, sig1, math.pi - sig1)


def _edge_integral(phi0: float, dlam: float) -> float:
    """∫ F(φ(λ)) dλ (eastward) along the geodesic joining two points at
    geographic latitude phi0 (radians) separated by dlam (radians).

    Split as F(φ0)·Δλ (closed form) + the poleward-bulge correction
    ∫ (F(φ(λ)) − F(φ0)) dλ.  The box area differences two edge
    integrals whose base terms nearly cancel; carrying the base term
    analytically keeps the quadrature error on the SMALL bulge term, so
    tiny boxes don't lose precision to cancellation amplification."""
    if dlam == 0.0 or phi0 == 0.0:
        return 0.0
    sgn = 1.0 if phi0 > 0 else -1.0
    phi0 = abs(phi0)
    if phi0 >= math.pi / 2 - 1e-12:
        # polar edge: both endpoints are the pole, the edge is a point —
        # the boundary integral reduces to the exact cap-slice term
        return sgn * float(_area_per_lon(math.pi / 2)) * dlam
    base = float(_area_per_lon(phi0)) * dlam
    beta0 = math.atan((1 - FLAT) * math.tan(phi0))
    # Shooting unknown c0 = cos α0 ∈ (sin β0, 1): λ-span runs
    # monotonically from 0 (vertex at the endpoints) to ~π (near-polar
    # geodesic), so bisection converges unconditionally.
    lo, hi = math.sin(beta0), 1.0 - 1e-16
    for _ in range(100):
        mid = (lo + hi) / 2.0
        if _lam_span(mid, beta0) < dlam:
            lo = mid
        else:
            hi = mid
    c0 = (lo + hi) / 2.0
    s0 = math.sqrt(1 - c0 * c0)
    k2 = EP2 * c0 * c0
    sig1 = math.asin(min(1.0, math.sin(beta0) / c0))
    f_base = float(_area_per_lon(phi0))

    def integrand(sig):
        ss = np.sin(sig)
        sinbeta = c0 * ss
        phi = np.arctan2(sinbeta, (1 - FLAT) * np.sqrt(1 - sinbeta**2))
        dlam_dsig = (B / A) * s0 * np.sqrt(1 + k2 * ss * ss) / (1 - sinbeta**2)
        return (_area_per_lon(phi) - f_base) * dlam_dsig

    bulge = _gl(integrand, sig1, math.pi - sig1)
    return sgn * (base + bulge)


def geodetic_box_area(
    xmin: float, ymin: float, xmax: float, ymax: float
) -> float:
    """Ellipsoidal area (m²) of the GEODSTBOX with lon ∈ [xmin, xmax],
    lat ∈ [ymin, ymax] — the geodesic-edge polygon of its 4 corners,
    matching the reference's area(GEODSTBOX).  A single geodesic edge
    is well-defined for longitude spans < 180°; spans > 90° are split
    into ≤90° sub-edges with intermediate vertices at the base latitude
    (the segmentized-polygon convention; also keeps the shooting solve
    and quadrature in their well-conditioned range — near-180° edges
    pass arbitrarily close to the pole)."""
    dlam_deg = xmax - xmin
    if dlam_deg < 0 or ymin > ymax:
        raise ValueError("malformed geodetic box")
    pieces = max(1, math.ceil(dlam_deg / 90.0 - 1e-12))
    dlam = math.radians(dlam_deg / pieces)
    north = _edge_integral(math.radians(ymax), dlam)
    south = _edge_integral(math.radians(ymin), dlam)
    return pieces * (north - south)


def geodetic_area_udf():
    """Arrow-batched pandas UDF form of geodetic_box_area (defined here
    rather than functions/box.py because `from __future__ import
    annotations` there would stringify the hints pandas_udf needs)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _geod_area(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                None
                if pd.isna(a)
                else geodetic_box_area(a, b_, c, d)
                for a, b_, c, d in zip(xmin, ymin, xmax, ymax)
            ],
            dtype="float64",
        )

    return _geod_area

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
    dλ/dσ = (b/a) sinα0 √(1+k²sin²σ) / (1−cos²α0 sin²σ),  k² = e'²cos²α0.

Numerical conditioning: dλ/dσ has a Lorentzian peak of width sinα0 at
σ = π/2 (a near-polar geodesic spends almost no σ near the pole but
sweeps most of its longitude there), so plain quadrature dies as
α0 → 0.  Both integrals are therefore split analytically:

  λ-span  = (b/a)√(1+k²)·(π − 2·atan(s0·tanσ1))   [the peak, closed form]
          + ∫ bounded remainder (amplitude ≤ s0·k², smooth)
  area    = F(φ0)·Δλ                                [base, closed form —
            differencing two edges cancels these analytically, so tiny
            boxes keep full precision]
          + (F(φ_vertex) − F(φ0))·Δλ               [peak, closed form]
          + ∫ (F(φ(σ)) − F(φ_vertex))·dλ/dσ dσ    [vanishes quadratically
            at the peak → bounded, GL-safe at every α0]

so a SINGLE vertex-to-vertex geodesic edge is evaluated accurately for
any longitude span < 180° — matching the reference's corner polygon
exactly (verified against the golden in test/sql/stbox.test:83-86:
round(area, 1) == 110593375170.3 m²).  Spans ≥ 180° have no
well-defined single geodesic edge (the reference's own corner polygon
is ambiguous there); they are evaluated with the edge segmentized into
<180° pieces whose intermediate vertices sit at the base latitude, and
documented as such.

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


def _lam_span(c0: float, sig1: float) -> float:
    """Longitude span of the symmetric geodesic with cos α0 = c0 between
    auxiliary arcs σ1 and π−σ1.  Peak term closed-form, remainder GL."""
    s0 = math.sqrt((1 - c0) * (1 + c0))
    k2 = EP2 * c0 * c0
    sqk = math.sqrt(1 + k2)
    closed = (B / A) * sqk * (math.pi - 2 * math.atan(s0 * math.tan(sig1)))

    def rem(sig):
        ss, cs = np.sin(sig), np.cos(sig)
        denom = cs * cs + (s0 * ss) ** 2
        return (
            -(B / A) * s0 * k2 * cs * cs
            / (denom * (np.sqrt(1 + k2 * ss * ss) + sqk))
        )

    return closed + 2.0 * _gl(rem, sig1, math.pi / 2)


def _edge_integral(phi0: float, dlam: float) -> float:
    """∫ F(φ(λ)) dλ (eastward) along the single geodesic joining two
    points at geographic latitude phi0 (radians) separated by dlam
    (radians, < π)."""
    if dlam == 0.0 or phi0 == 0.0:
        return 0.0
    sgn = 1.0 if phi0 > 0 else -1.0
    phi0 = abs(phi0)
    if phi0 >= math.pi / 2 - 1e-12:
        # polar edge: both endpoints are the pole, the edge is a point —
        # the boundary integral reduces to the exact cap-slice term
        return sgn * float(_area_per_lon(math.pi / 2)) * dlam
    f_base = float(_area_per_lon(phi0))
    beta0 = math.atan((1 - FLAT) * math.tan(phi0))
    sb0 = math.sin(beta0)
    # Shooting unknown c0 = cos α0 ∈ (sin β0, 1): λ-span runs
    # monotonically from 0 (vertex at the endpoints) to π (near-polar
    # geodesic), so bisection converges unconditionally.
    lo, hi = sb0, 1.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if mid <= lo or mid >= hi:
            break  # interval at 1 ulp — converged
        if _lam_span(mid, math.asin(min(1.0, sb0 / mid))) < dlam:
            lo = mid
        else:
            hi = mid
    c0 = (lo + hi) / 2.0
    s0 = math.sqrt(max(0.0, (1 - c0) * (1 + c0)))
    k2 = EP2 * c0 * c0
    sig1 = math.asin(min(1.0, sb0 / c0))
    # vertex latitude (σ = π/2): sin β_v = c0
    phi_v = math.atan2(c0, (1 - FLAT) * s0) if s0 > 0 else math.pi / 2
    f_vert = float(_area_per_lon(phi_v))

    def rem(sig):
        ss = np.sin(sig)
        sinbeta = c0 * ss
        phi = np.arctan2(sinbeta, (1 - FLAT) * np.sqrt(1 - sinbeta**2))
        dlam_dsig = (
            (B / A) * s0 * np.sqrt(1 + k2 * ss * ss) / (1 - sinbeta**2)
        )
        return (_area_per_lon(phi) - f_vert) * dlam_dsig

    # base + peak closed-form (the ∫dλ over the edge is dlam by the
    # shooting solve; residual ~1e-16·F is below the quadrature floor)
    bulge = (f_vert - f_base) * dlam + 2.0 * _gl(rem, sig1, math.pi / 2)
    return sgn * (f_base * dlam + bulge)


def geodetic_box_area(
    xmin: float, ymin: float, xmax: float, ymax: float
) -> float:
    """Ellipsoidal area (m²) of the GEODSTBOX with lon ∈ [xmin, xmax],
    lat ∈ [ymin, ymax] — the geodesic-edge polygon of its 4 corners,
    matching the reference's area(GEODSTBOX) for any longitude span
    < 180° (single vertex-to-vertex geodesic edges).  Spans ≥ 180°,
    where no single geodesic edge is well-defined, use <180° sub-edges
    with intermediate vertices at the base latitude (the
    segmentized-polygon convention — documented deviation)."""
    dlam_deg = xmax - xmin
    if dlam_deg < 0 or ymin > ymax:
        raise ValueError("malformed geodetic box")
    pieces = 1 if dlam_deg < 180.0 else math.ceil(dlam_deg / 179.0)
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

    def one(a, b_, c, d):
        # NULL-propagate on ANY missing coordinate and null out malformed
        # boxes (xmax < xmin / ymin > ymax) instead of raising — a single
        # bad row must not fail the whole Spark job (the reference's
        # Stbox_area masks error rows invalid rather than erroring).
        if pd.isna(a) or pd.isna(b_) or pd.isna(c) or pd.isna(d):
            return None
        try:
            return geodetic_box_area(a, b_, c, d)
        except ValueError:
            return None

    @pandas_udf("double")
    def _geod_area(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [one(a, b_, c, d) for a, b_, c, d in zip(xmin, ymin, xmax, ymax)],
            dtype="float64",
        )

    return _geod_area

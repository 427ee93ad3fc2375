"""Pairwise trajectory operators: eDwithin / aDisjoint / tDwithin /
pairwise distance over TWO temporal points.

Reference: src/geo/tgeompoint.cpp:279-311 (aDisjoint :279-287, eDwithin
:289-297, tDwithin :303-311; impls tgeompoint_functions.cpp:610-741).
MEOS synchronizes the two temporals and solves the quadratic
‖p1(t) − p2(t)‖² ≤ d² per overlapping segment pair.

This is genuine geometry math over two nested arrays — the designated
pandas-UDF slow path (SURVEY.md §7 phase 4). The UDF is Arrow-batched
and numpy-vectorized per row pair; the surrounding join/filter stays
relational, and callers should pre-filter pairs with the cheap
expression-level stbox_overlaps/expand_space predicate so the UDF only
sees plausible pairs (the same bbox pre-filter the reference's R-tree
would provide).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _rows(col):
    """A struct column arrives in a pandas UDF as a pd.DataFrame (one
    column per field); normalize to an iterable of per-row dicts."""
    if isinstance(col, pd.DataFrame):
        return col.to_dict("records")
    return list(col)


def _has_seqs(tv) -> bool:
    try:
        seqs = tv["seqs"] if not hasattr(tv, "seqs") else tv.seqs
    except (KeyError, TypeError):
        return False
    return seqs is not None and len(seqs) > 0


def _extract(tv) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Temporal struct (as nested dict/Row) → (t_us, x, y) arrays over all
    instants (sequence bounds ignored: closed-bound trajectories)."""
    seqs = tv["seqs"] if isinstance(tv, dict) else tv.seqs
    ts, xs, ys = [], [], []
    for s in seqs:
        insts = s["instants"] if isinstance(s, dict) else s.instants
        for i in insts:
            ii = i if isinstance(i, dict) else i.asDict()
            v = ii["v"] if isinstance(ii["v"], dict) else ii["v"].asDict()
            ts.append(ii["t"].timestamp())
            xs.append(v["x"])
            ys.append(v["y"])
    return np.asarray(ts), np.asarray(xs), np.asarray(ys)


def _sync_segments(a, b):
    """Synchronize two linear trajectories on the union of their
    timestamps within the overlapping window; returns per-shared-segment
    endpoint positions (x1a, y1a, x2a, y2a, x1b, ...)."""
    ta, xa, ya = a
    tb, xb, yb = b
    lo = max(ta[0], tb[0])
    hi = min(ta[-1], tb[-1])
    if lo > hi:
        return None
    ts = np.union1d(ta, tb)
    ts = ts[(ts >= lo) & (ts <= hi)]
    if ts.size == 0:
        return None
    pax = np.interp(ts, ta, xa)
    pay = np.interp(ts, ta, ya)
    pbx = np.interp(ts, tb, xb)
    pby = np.interp(ts, tb, yb)
    return ts, pax, pay, pbx, pby


def _min_dist_sq_profile(sync):
    """Minimum of ‖pa(t)−pb(t)‖² over the synced window (exact: per
    segment the relative motion is linear, so the squared distance is a
    quadratic in t — evaluate its vertex when interior)."""
    ts, pax, pay, pbx, pby = sync
    dx = pax - pbx
    dy = pay - pby
    d2_at_knots = dx * dx + dy * dy
    best = float(d2_at_knots.min())
    if ts.size >= 2:
        # per segment: d(t) = (dx0 + vx·u, dy0 + vy·u), u ∈ [0,1]
        dx0, dy0 = dx[:-1], dy[:-1]
        vx = dx[1:] - dx[:-1]
        vy = dy[1:] - dy[:-1]
        denom = vx * vx + vy * vy
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.where(denom > 0, -(dx0 * vx + dy0 * vy) / denom, 0.0)
        u = np.clip(u, 0.0, 1.0)
        ix = dx0 + vx * u
        iy = dy0 + vy * u
        best = min(best, float((ix * ix + iy * iy).min()))
    return best


def register_pair_udfs(spark):
    """Register the pairwise UDFs for DataFrame use. Returns dict of
    callables usable as column functions."""

    @F.pandas_udf(T.DoubleType())
    def min_pair_distance(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
        out = []
        for av, bv in zip(_rows(a), _rows(b)):
            if av is None or bv is None or not _has_seqs(av) or not _has_seqs(bv):
                out.append(None)
                continue
            sync = _sync_segments(_extract(av), _extract(bv))
            out.append(np.sqrt(_min_dist_sq_profile(sync)) if sync else None)
        return pd.Series(out, dtype="float64")

    @F.pandas_udf(T.BooleanType())
    def e_dwithin(a: pd.DataFrame, b: pd.DataFrame, d: pd.Series) -> pd.Series:
        out = []
        for av, bv, dv in zip(_rows(a), _rows(b), list(d)):
            if av is None or bv is None or not _has_seqs(av) or not _has_seqs(bv):
                out.append(None)
                continue
            sync = _sync_segments(_extract(av), _extract(bv))
            out.append(
                bool(_min_dist_sq_profile(sync) <= dv * dv) if sync else False
            )
        return pd.Series(out, dtype="object")

    @F.pandas_udf(T.BooleanType())
    def a_disjoint(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
        # "always disjoint": min distance over the shared window > 0;
        # temporals that never overlap in time are trivially disjoint
        out = []
        for av, bv in zip(_rows(a), _rows(b)):
            if av is None or bv is None or not _has_seqs(av) or not _has_seqs(bv):
                out.append(None)
                continue
            sync = _sync_segments(_extract(av), _extract(bv))
            out.append(True if sync is None else bool(_min_dist_sq_profile(sync) > 0))
        return pd.Series(out, dtype="object")

    return {
        "min_pair_distance": min_pair_distance,
        "e_dwithin": e_dwithin,
        "a_disjoint": a_disjoint,
    }


def _dwithin_intervals(sync, dist: float):
    """Exact time intervals (as [lo, hi] second pairs) where
    ‖pa(t)−pb(t)‖ ≤ dist: per synced segment the squared distance is a
    quadratic in u ∈ [0,1]; intersect its ≤ d² root interval with the
    segment and merge adjacent results (MEOS tdwithin_tgeo_tgeo
    semantics, reference impl tgeompoint_functions.cpp:693-741)."""
    ts, pax, pay, pbx, pby = sync
    d2 = dist * dist
    out: list[list[float]] = []

    def push(lo: float, hi: float):
        if out and lo <= out[-1][1]:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])

    dx = pax - pbx
    dy = pay - pby
    if ts.size == 1:
        if dx[0] * dx[0] + dy[0] * dy[0] <= d2:
            push(ts[0], ts[0])
        return out
    for i in range(ts.size - 1):
        t0, t1 = ts[i], ts[i + 1]
        dx0, dy0 = dx[i], dy[i]
        vx, vy = dx[i + 1] - dx[i], dy[i + 1] - dy[i]
        a = vx * vx + vy * vy
        b = 2 * (dx0 * vx + dy0 * vy)
        c = dx0 * dx0 + dy0 * dy0 - d2
        if a == 0.0:
            if c <= 0:
                push(t0, t1)
            continue
        disc = b * b - 4 * a * c
        if disc < 0:
            continue
        sq = np.sqrt(disc)
        u1 = max((-b - sq) / (2 * a), 0.0)
        u2 = min((-b + sq) / (2 * a), 1.0)
        if u1 <= u2:
            push(t0 + (t1 - t0) * u1, t0 + (t1 - t0) * u2)
    return out


_SPAN_ARR_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("lower", T.TimestampType()),
            T.StructField("upper", T.TimestampType()),
            T.StructField("lower_inc", T.BooleanType()),
            T.StructField("upper_inc", T.BooleanType()),
        ]
    )
)


def register_tdwithin_udf(spark):
    """tDwithin(a, b, d) rendered as the tstzspanset where the two
    moving points are within distance d (i.e. whenTrue(tDwithin) —
    the form every recorded BerlinMOD query consumes)."""
    import datetime

    def _to_dt(s: float):
        return datetime.datetime.fromtimestamp(s, tz=datetime.timezone.utc).replace(
            tzinfo=None
        )

    @F.pandas_udf(_SPAN_ARR_TYPE)
    def dwithin_periods(a: pd.DataFrame, b: pd.DataFrame, d: pd.Series) -> pd.Series:
        out = []
        for av, bv, dv in zip(_rows(a), _rows(b), list(d)):
            if av is None or bv is None or not _has_seqs(av) or not _has_seqs(bv):
                out.append(None)
                continue
            sync = _sync_segments(_extract(av), _extract(bv))
            if sync is None:
                out.append([])
                continue
            spans = _dwithin_intervals(sync, float(dv))
            out.append(
                [
                    {
                        "lower": _to_dt(lo),
                        "upper": _to_dt(hi),
                        "lower_inc": True,
                        # closed upper bound: at the root of the quadratic
                        # the distance equals d, which satisfies <= d
                        "upper_inc": True,
                    }
                    for lo, hi in spans
                ]
            )
        return pd.Series(out, dtype="object")

    return dwithin_periods


def _min_polyline_dist(a, b) -> float:
    """Min distance between two STATIC polylines (trajectory geometries,
    time ignored) — ST_Distance(trajectory(t1), trajectory(t2)) semantics
    (BerlinMOD q5). Vectorized segment-pair point-to-segment distance."""
    _, xa, ya = a
    _, xb, yb = b
    pa = np.column_stack([xa, ya])
    pb = np.column_stack([xb, yb])

    def seg_pt_min(p0, p1, q):
        """min over segments (p0→p1) × points q of point-segment dist²."""
        d = p1 - p0  # (m, 2)
        dd = (d * d).sum(1)  # (m,)
        diff = q[:, None, :] - p0[None, :, :]  # (n, m, 2)
        tt = (diff * d[None, :, :]).sum(2)  # (n, m)
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.where(dd[None, :] > 0, tt / dd[None, :], 0.0)
        u = np.clip(u, 0.0, 1.0)
        proj = p0[None, :, :] + u[:, :, None] * d[None, :, :]
        delta = q[:, None, :] - proj
        return float((delta * delta).sum(2).min())

    best = np.inf
    if len(pa) > 1:
        best = min(best, seg_pt_min(pa[:-1], pa[1:], pb))
    if len(pb) > 1:
        best = min(best, seg_pt_min(pb[:-1], pb[1:], pa))
    if len(pa) == 1 and len(pb) == 1:
        d = pa[0] - pb[0]
        best = float((d * d).sum())
    # NOTE: segment-segment crossing (distance 0) is caught because a
    # crossing implies an endpoint of one polyline on each side of the
    # other — endpoint-to-segment distance still bounds it above; for
    # exact crossing detection add an intersection test:
    if len(pa) > 1 and len(pb) > 1 and best > 0:
        if _any_cross(pa, pb):
            return 0.0
    return float(np.sqrt(best))


def _any_cross(pa: np.ndarray, pb: np.ndarray) -> bool:
    """True iff any segment of pa properly crosses any segment of pb."""
    p0, p1 = pa[:-1], pa[1:]
    q0, q1 = pb[:-1], pb[1:]

    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    P0 = p0[:, None, :]
    P1 = p1[:, None, :]
    Q0 = q0[None, :, :]
    Q1 = q1[None, :, :]
    d1 = cross(P0, P1, Q0)
    d2 = cross(P0, P1, Q1)
    d3 = cross(Q0, Q1, P0)
    d4 = cross(Q0, Q1, P1)
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


def register_traj_distance_udf(spark):
    """Static trajectory-pair distance UDF (BerlinMOD q5)."""

    @F.pandas_udf(T.DoubleType())
    def min_traj_distance(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
        out = []
        for av, bv in zip(_rows(a), _rows(b)):
            if av is None or bv is None or not _has_seqs(av) or not _has_seqs(bv):
                out.append(None)
                continue
            out.append(_min_polyline_dist(_extract(av), _extract(bv)))
        return pd.Series(out, dtype="float64")

    return min_traj_distance


# ---------------------------------------------------------------- flat fast path
# Arrow converts ARRAY<DOUBLE> columns to numpy arrays ~100× faster than
# nested temporal structs (which arrive as Python object trees). The
# flat-path UDFs take (ts, xs, ys) arrays per side — produced once per
# trajectory by `flat_cols` — and skip _extract entirely. Same math.

def flat_cols(trip):
    """(t_secs, xs, ys) ARRAY<DOUBLE> columns from a temporal point."""
    from ..functions import temporal as TT

    inst = TT.instants(trip)
    return (
        F.transform(inst, lambda i: F.unix_micros(i["t"]) / F.lit(1_000_000.0)),
        F.transform(inst, lambda i: i["v"]["x"]),
        F.transform(inst, lambda i: i["v"]["y"]),
    )


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float64)


def register_flat_pair_udfs(spark):
    @F.pandas_udf(T.DoubleType())
    def min_pair_distance_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, t2, x2, y2 in zip(ta, xa, ya, tb, xb, yb):
            sync = _sync_segments((_np(t1), _np(x1), _np(y1)), (_np(t2), _np(x2), _np(y2)))
            out.append(float(np.sqrt(_min_dist_sq_profile(sync))) if sync else None)
        return pd.Series(out, dtype="float64")

    @F.pandas_udf(T.BooleanType())
    def e_dwithin_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series, d: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, t2, x2, y2, dv in zip(ta, xa, ya, tb, xb, yb, d):
            sync = _sync_segments((_np(t1), _np(x1), _np(y1)), (_np(t2), _np(x2), _np(y2)))
            out.append(bool(_min_dist_sq_profile(sync) <= dv * dv) if sync else False)
        return pd.Series(out, dtype="object")

    @F.pandas_udf(T.BooleanType())
    def a_disjoint_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, t2, x2, y2 in zip(ta, xa, ya, tb, xb, yb):
            sync = _sync_segments((_np(t1), _np(x1), _np(y1)), (_np(t2), _np(x2), _np(y2)))
            out.append(True if sync is None else bool(_min_dist_sq_profile(sync) > 0))
        return pd.Series(out, dtype="object")

    @F.pandas_udf(T.DoubleType())
    def min_traj_distance_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, t2, x2, y2 in zip(ta, xa, ya, tb, xb, yb):
            out.append(
                _min_polyline_dist(
                    (_np(t1), _np(x1), _np(y1)), (_np(t2), _np(x2), _np(y2))
                )
            )
        return pd.Series(out, dtype="float64")

    return {
        "min_pair_distance": min_pair_distance_flat,
        "e_dwithin": e_dwithin_flat,
        "a_disjoint": a_disjoint_flat,
        "min_traj_distance": min_traj_distance_flat,
    }

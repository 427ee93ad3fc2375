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


def _extract(tv) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Temporal struct (as nested dict/Row) → (t_secs, x, y, seq_lens)
    arrays over all instants. seq_lens records per-sequence instant
    counts so synchronization can mask the inter-sequence gaps where the
    temporal is undefined (MEOS synchronizes only over defined
    sequences — interpolating across a gap-split trip's >2h holes would
    fabricate straight-line positions)."""
    seqs = tv["seqs"] if isinstance(tv, dict) else tv.seqs
    ts, xs, ys, lens = [], [], [], []
    for s in seqs:
        insts = s["instants"] if isinstance(s, dict) else s.instants
        lens.append(len(insts))
        for i in insts:
            ii = i if isinstance(i, dict) else i.asDict()
            v = ii["v"] if isinstance(ii["v"], dict) else ii["v"].asDict()
            ts.append(ii["t"].timestamp())
            xs.append(v["x"])
            ys.append(v["y"])
    return (
        np.asarray(ts),
        np.asarray(xs),
        np.asarray(ys),
        np.asarray(lens, dtype=np.int64),
    )


def _gap_bounds(side) -> tuple[np.ndarray, np.ndarray]:
    """(lo_arr, hi_arr) second windows where the temporal is undefined,
    derived from per-sequence lengths; empty when single-sequence.
    Sorted and pairwise disjoint (sequences are ordered and
    non-overlapping, so their inter-sequence gaps are too)."""
    ts = side[0]
    lens = side[3] if len(side) > 3 and side[3] is not None else None
    if lens is None or len(lens) <= 1:
        z = np.empty(0)
        return z, z
    offs = np.cumsum(lens)[:-1]
    lo, hi = ts[offs - 1], ts[offs]
    keep = hi > lo
    return lo[keep], hi[keep]


def _inside_any(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Boolean mask: vals strictly inside any [lo_i, hi_i) gap window.
    `lo` sorted + disjoint ⇒ one searchsorted instead of a per-gap
    Python loop (the loop dominated the pairwise kernels on gap-split
    trips: ~40 sequences → ~80 masked vector ops per sync call)."""
    if lo.size == 0 or vals.size == 0:
        return np.zeros(vals.size, dtype=bool)
    idx = np.searchsorted(lo, vals, side="right") - 1
    ok = idx >= 0
    out = np.zeros(vals.size, dtype=bool)
    iv = vals[ok]
    ii = idx[ok]
    out[ok] = (iv > lo[ii]) & (iv < hi[ii])
    return out


def _sync_segments(a, b):
    """Synchronize two linear trajectories on the union of their
    timestamps within the overlapping window. Returns (ts, pax, pay,
    pbx, pby, valid_knot, valid_seg) — validity masks are False where
    either side is undefined (inside an inter-sequence gap), so gap
    intervals contribute neither knot distances nor segment quadratics.
    Gap boundaries are knots of their own side, so every union segment
    lies entirely in or out of each gap; a midpoint test classifies it.
    Returns None when the windows don't overlap or no co-defined instant
    exists."""
    ta, xa, ya = a[0], a[1], a[2]
    tb, xb, yb = b[0], b[1], b[2]
    lo = max(ta[0], tb[0])
    hi = min(ta[-1], tb[-1])
    if lo > hi:
        return None
    ts = np.union1d(ta, tb)
    ts = ts[(ts >= lo) & (ts <= hi)]
    if ts.size == 0:
        return None
    ga_lo, ga_hi = _gap_bounds(a)
    gb_lo, gb_hi = _gap_bounds(b)
    valid_knot = ~(_inside_any(ts, ga_lo, ga_hi) | _inside_any(ts, gb_lo, gb_hi))
    if ts.size >= 2:
        mid = (ts[:-1] + ts[1:]) * 0.5
        valid_seg = ~(
            _inside_any(mid, ga_lo, ga_hi) | _inside_any(mid, gb_lo, gb_hi)
        )
    else:
        valid_seg = np.empty(0, dtype=bool)
    if not valid_knot.any():
        return None
    pax = np.interp(ts, ta, xa)
    pay = np.interp(ts, ta, ya)
    pbx = np.interp(ts, tb, xb)
    pby = np.interp(ts, tb, yb)
    return ts, pax, pay, pbx, pby, valid_knot, valid_seg


def _min_dist_sq_profile(sync):
    """Minimum of ‖pa(t)−pb(t)‖² over the synced window (exact: per
    segment the relative motion is linear, so the squared distance is a
    quadratic in t — evaluate its vertex when interior). Knots/segments
    masked invalid (either side undefined) are excluded."""
    ts, pax, pay, pbx, pby, vk, vs = sync
    dx = pax - pbx
    dy = pay - pby
    d2_at_knots = dx * dx + dy * dy
    best = float(d2_at_knots[vk].min())
    if ts.size >= 2 and vs.any():
        # per segment: d(t) = (dx0 + vx·u, dy0 + vy·u), u ∈ [0,1]
        dx0, dy0 = dx[:-1][vs], dy[:-1][vs]
        vx = dx[1:][vs] - dx0
        vy = dy[1:][vs] - dy0
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
    semantics, reference impl tgeompoint_functions.cpp:693-741).
    Segments inside an inter-sequence gap (valid_seg False) are skipped;
    merging never bridges a gap because the gap segment between two
    within-d spans is absent from the output."""
    ts, pax, pay, pbx, pby, vk, vs = sync
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
        if vk[0] and dx[0] * dx[0] + dy[0] * dy[0] <= d2:
            push(ts[0], ts[0])
        return out
    for i in range(ts.size - 1):
        if not vs[i]:
            # isolated co-defined knot bordered by gaps on both sides
            if vk[i] and (i == 0 or not vs[i - 1]) and dx[i] ** 2 + dy[i] ** 2 <= d2:
                push(ts[i], ts[i])
            continue
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
    # last knot isolated (final segment invalid): evaluate it alone
    if ts.size >= 2 and not vs[-1] and vk[-1] and dx[-1] ** 2 + dy[-1] ** 2 <= d2:
        push(ts[-1], ts[-1])
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


def _seg_mask(side, n: int) -> np.ndarray | None:
    """Boolean mask over the n-1 consecutive-point segments of a
    flattened trajectory: False for the fictitious segments that would
    connect the end of one sequence to the start of the next (a seqset's
    trajectory is a MULTILINESTRING — those edges don't exist)."""
    lens = side[3] if len(side) > 3 and side[3] is not None else None
    if lens is None or len(lens) <= 1:
        return None
    mask = np.ones(n - 1, dtype=bool)
    mask[np.cumsum(lens)[:-1] - 1] = False
    return mask


def _min_polyline_dist(a, b) -> float:
    """Min distance between two STATIC polylines (trajectory geometries,
    time ignored) — ST_Distance(trajectory(t1), trajectory(t2)) semantics
    (BerlinMOD q5). Vectorized segment-pair point-to-segment distance.
    Multi-sequence trips are treated as MULTILINESTRINGs: segments never
    span an inter-sequence gap."""
    xa, ya = a[1], a[2]
    xb, yb = b[1], b[2]
    pa = np.column_stack([xa, ya])
    pb = np.column_stack([xb, yb])
    ma = _seg_mask(a, len(pa))
    mb = _seg_mask(b, len(pb))

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

    def segs(p, m):
        p0, p1 = p[:-1], p[1:]
        if m is not None:
            p0, p1 = p0[m], p1[m]
        return p0, p1

    best = np.inf
    if len(pa) > 1:
        a0, a1 = segs(pa, ma)
        if len(a0):
            best = min(best, seg_pt_min(a0, a1, pb))
    if len(pb) > 1:
        b0, b1 = segs(pb, mb)
        if len(b0):
            best = min(best, seg_pt_min(b0, b1, pa))
    if np.isinf(best):
        # point-vs-point (or all segments masked): nearest point pair
        d2 = ((pa[:, None, :] - pb[None, :, :]) ** 2).sum(2)
        best = float(d2.min())
    # NOTE: segment-segment crossing (distance 0) is caught because a
    # crossing implies an endpoint of one polyline on each side of the
    # other — endpoint-to-segment distance still bounds it above; for
    # exact crossing detection add an intersection test:
    if len(pa) > 1 and len(pb) > 1 and best > 0:
        if _any_cross(pa, pb, ma, mb):
            return 0.0
    return float(np.sqrt(best))


def _any_cross(pa: np.ndarray, pb: np.ndarray, ma=None, mb=None) -> bool:
    """True iff any real segment of pa properly crosses any of pb
    (gap-spanning segments excluded via the masks)."""
    p0, p1 = pa[:-1], pa[1:]
    q0, q1 = pb[:-1], pb[1:]
    if ma is not None:
        p0, p1 = p0[ma], p1[ma]
    if mb is not None:
        q0, q1 = q0[mb], q1[mb]
    if not len(p0) or not len(q0):
        return False

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
    """(t_secs, xs, ys, seq_lens) ARRAY columns from a temporal point.
    seq_lens (ARRAY<INT>, one instant count per sequence) carries the
    sequence structure the flat arrays lose, so the numpy kernels can
    mask inter-sequence gaps instead of interpolating across them."""
    from ..functions import temporal as TT

    inst = TT.instants(trip)
    return (
        F.transform(inst, lambda i: F.unix_micros(i["t"]) / F.lit(1_000_000.0)),
        F.transform(inst, lambda i: i["v"]["x"]),
        F.transform(inst, lambda i: i["v"]["y"]),
        F.transform(trip["seqs"], lambda s: F.size(s["instants"])),
    )


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float64)


def _npl(v) -> np.ndarray | None:
    return None if v is None else np.asarray(v, dtype=np.int64)


def register_flat_pair_udfs(spark):
    """Flat-path pairwise UDFs. Each takes (t, x, y, seq_lens) per side —
    produce the columns with `flat_cols`; seq_lens masks inter-sequence
    gaps (see _sync_segments / _seg_mask)."""

    @F.pandas_udf(T.DoubleType())
    def min_pair_distance_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series, la: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series, lb: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, l1, t2, x2, y2, l2 in zip(ta, xa, ya, la, tb, xb, yb, lb):
            sync = _sync_segments(
                (_np(t1), _np(x1), _np(y1), _npl(l1)),
                (_np(t2), _np(x2), _np(y2), _npl(l2)),
            )
            out.append(float(np.sqrt(_min_dist_sq_profile(sync))) if sync else None)
        return pd.Series(out, dtype="float64")

    @F.pandas_udf(T.BooleanType())
    def e_dwithin_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series, la: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series, lb: pd.Series,
        d: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, l1, t2, x2, y2, l2, dv in zip(
            ta, xa, ya, la, tb, xb, yb, lb, d
        ):
            sync = _sync_segments(
                (_np(t1), _np(x1), _np(y1), _npl(l1)),
                (_np(t2), _np(x2), _np(y2), _npl(l2)),
            )
            out.append(bool(_min_dist_sq_profile(sync) <= dv * dv) if sync else False)
        return pd.Series(out, dtype="object")

    @F.pandas_udf(T.BooleanType())
    def a_disjoint_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series, la: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series, lb: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, l1, t2, x2, y2, l2 in zip(ta, xa, ya, la, tb, xb, yb, lb):
            sync = _sync_segments(
                (_np(t1), _np(x1), _np(y1), _npl(l1)),
                (_np(t2), _np(x2), _np(y2), _npl(l2)),
            )
            out.append(True if sync is None else bool(_min_dist_sq_profile(sync) > 0))
        return pd.Series(out, dtype="object")

    @F.pandas_udf(T.DoubleType())
    def min_traj_distance_flat(
        ta: pd.Series, xa: pd.Series, ya: pd.Series, la: pd.Series,
        tb: pd.Series, xb: pd.Series, yb: pd.Series, lb: pd.Series,
    ) -> pd.Series:
        out = []
        for t1, x1, y1, l1, t2, x2, y2, l2 in zip(ta, xa, ya, la, tb, xb, yb, lb):
            out.append(
                _min_polyline_dist(
                    (_np(t1), _np(x1), _np(y1), _npl(l1)),
                    (_np(t2), _np(x2), _np(y2), _npl(l2)),
                )
            )
        return pd.Series(out, dtype="float64")

    return {
        "min_pair_distance": min_pair_distance_flat,
        "e_dwithin": e_dwithin_flat,
        "a_disjoint": a_disjoint_flat,
        "min_traj_distance": min_traj_distance_flat,
    }


def register_tdwithin_tbool_udf(spark=None):
    """tDwithin(a, b, d) → temporal boolean (the reference's actual
    return type — src/geo/tgeompoint.cpp:303-311, MEOS tdwithin_tgeo_tgeo)
    for DISCRETE/instant synchronization: a discrete TBOOL holding
    ‖pa−pb‖ ≤ d at every co-defined synchronized instant. Continuous
    (step-sequence) results are served by register_tdwithin_udf's
    whenTrue spanset form, which every recorded reference query consumes."""
    import datetime

    def _to_dt(s: float):
        return datetime.datetime.fromtimestamp(s, tz=datetime.timezone.utc).replace(
            tzinfo=None
        )

    from pyspark.sql.types import (
        ArrayType, BooleanType, ByteType, StructField, StructType,
        TimestampType,
    )

    tbool_type = StructType([
        StructField("subtype", ByteType()),
        StructField("interp", ByteType()),
        StructField("seqs", ArrayType(StructType([
            StructField("lower_inc", BooleanType()),
            StructField("upper_inc", BooleanType()),
            StructField("instants", ArrayType(StructType([
                StructField("t", TimestampType()),
                StructField("v", BooleanType()),
            ]))),
        ]))),
    ])

    @F.pandas_udf(tbool_type)
    def tdwithin_tbool(
        a: pd.DataFrame, b: pd.DataFrame, d: pd.Series
    ) -> pd.DataFrame:
        out = []
        for av, bv, dv in zip(_rows(a), _rows(b), list(d)):
            if av is None or bv is None or not _has_seqs(av) or not _has_seqs(bv):
                out.append(None)
                continue
            sync = _sync_segments(_extract(av), _extract(bv))
            if sync is None:
                out.append(None)
                continue
            ts, pax, pay, pbx, pby, vk, _ = sync
            d2 = float(dv) * float(dv)
            insts = [
                {"t": _to_dt(t), "v": bool((ax - bx) ** 2 + (ay - by) ** 2 <= d2)}
                for t, ax, ay, bx, by, ok in zip(ts, pax, pay, pbx, pby, vk)
                if ok
            ]
            if not insts:
                out.append(None)
                continue
            subtype = 1 if len(insts) == 1 else 2
            out.append({
                "subtype": subtype,
                "interp": 1,
                "seqs": [{"lower_inc": True, "upper_inc": True, "instants": insts}],
            })
        # StructType pandas UDFs must return a DataFrame (one column per
        # struct field); a None row maps to all-null fields
        return pd.DataFrame(
            [
                r if r is not None
                else {"subtype": None, "interp": None, "seqs": None}
                for r in out
            ],
            columns=["subtype", "interp", "seqs"],
        )

    return tdwithin_tbool


def register_probe_edwithin_udf(probes: list, d: float, ordered: bool = False):
    """Broadcast-closure pairwise eDwithin for a SMALL probe fleet —
    the pairwise analog of a broadcast hash join. `probes` is a
    driver-side list of dicts {vid, t, x, y, lens} (bounded: the caller
    only collects when the probe side is tiny, e.g. 10 licences).

    Returns a pandas UDF (t, x, y, lens, self_vid) → ARRAY<LONG> of
    probe vids whose synchronized distance to the row's trajectory ever
    drops to ≤ d (self excluded). One Arrow pass over the large side —
    each row's arrays cross the boundary ONCE instead of once per
    candidate pair (the join formulation shipped |probes|× the data:
    ~500 MB vs ~50 MB at sf0.1 for the bm_q10 shape). Probe bboxes
    prefilter inside the kernel; the exact kernel is the same
    _sync_segments + _min_dist_sq_profile as every other pairwise op.

    `ordered=True` is the SELF-pair form (probes == the scanned fleet):
    only probes with vid < the row's vid are tested, so each unordered
    pair is evaluated exactly once — half the kernel calls and the
    vid1 < vid2 dedup for free."""
    pre = []
    for p in probes:
        t_ = _np(p["t"]); x_ = _np(p["x"]); y_ = _np(p["y"])
        pre.append(
            (
                int(p["vid"]), (t_, x_, y_, _npl(p["lens"])),
                float(x_.min()) - d, float(x_.max()) + d,
                float(y_.min()) - d, float(y_.max()) + d,
            )
        )
    d2 = float(d) * float(d)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def probe_hits(
        t: pd.Series, x: pd.Series, y: pd.Series, l: pd.Series,
        vid: pd.Series,
    ) -> pd.Series:
        out = []
        for tv, xv, yv, lv, v2 in zip(t, x, y, l, vid):
            side_b = (_np(tv), _np(xv), _np(yv), _npl(lv))
            bx0, bx1 = float(side_b[1].min()), float(side_b[1].max())
            by0, by1 = float(side_b[2].min()), float(side_b[2].max())
            hits = []
            for pvid, side_a, px0, px1, py0, py1 in pre:
                if (pvid >= int(v2)) if ordered else (pvid == int(v2)):
                    continue
                if bx0 > px1 or bx1 < px0 or by0 > py1 or by1 < py0:
                    continue
                sync = _sync_segments(side_a, side_b)
                if sync is not None and _min_dist_sq_profile(sync) <= d2:
                    hits.append(pvid)
            out.append(hits)
        return pd.Series(out, dtype="object")

    return probe_hits

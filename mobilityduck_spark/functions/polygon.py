"""Arbitrary simple-polygon regions — the duckdb-spatial subset the
BerlinMOD benchmark actually exercises (reference loads real polygons via
ST_MakePolygon(ST_MakeLine(array_agg(...))) —
benchmark/BerlinMOD/sql/load/04_regions.sql:17-30 — and every region
query tests ST_Contains(polygon, point) / ST_Intersects(linestring,
polygon) — sql/queries/query_13.sql:14-18, query_14.sql:14-17).

Representation: a polygon ring is ARRAY<STRUCT<x: double, y: double>>,
open form (the closing vertex is implicit). Rings here are small probe
dims (~10 vertices), broadcast to every executor; all predicates are
pure JVM higher-order-function expressions — no Python in the hot path,
O(n_line_vertices × n_ring_edges) per row.

Numeric contract: every formula below is written so the identical ANSI
SQL expression (sources/berlinmod.py REGIONS_POLY_SQL + the bm_q13_poly
/ bm_q14_poly oracles) evaluates the same IEEE doubles in the same
order — point-in-polygon and crossing verdicts agree bit-for-bit with
DuckDB on shared inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def make_polygon(vertices) -> Column:
    """ST_MakePolygon(ST_MakeLine(...)) — build a ring from an ordered
    vertex array, dropping an explicit closing vertex when present
    (duckdb-spatial requires lines to close; our open-ring form keeps
    each vertex once)."""
    vs = _c(vertices)
    n = F.size(vs)
    first, last = vs[0], F.try_element_at(vs, F.lit(-1))
    closed = (first["x"] == last["x"]) & (first["y"] == last["y"]) & (n > 1)
    return F.when(closed, F.slice(vs, 1, n - 1)).otherwise(vs)


def ring_wkt(ring) -> Column:
    """POLYGON((x y, ...)) text of a ring (closing vertex re-added)."""
    r = _c(ring)

    def fmt(v):
        num = lambda c: F.when(  # noqa: E731
            c == F.floor(c), c.cast("long").cast("string")
        ).otherwise(c.cast("string"))
        return F.concat(num(v["x"]), F.lit(" "), num(v["y"]))

    return F.concat(
        F.lit("POLYGON(("),
        F.array_join(F.transform(r, fmt), ", "),
        F.lit(", "),
        fmt(r[0]),
        F.lit("))"),
    )


def st_geometry_type(wkt) -> Column:
    """ST_GeometryType(GEOMETRY) — the leading WKT tag (duckdb-spatial
    returns 'POINT' / 'LINESTRING' / 'POLYGON' / ...)."""
    return F.upper(F.regexp_extract(_c(wkt), r"^\s*([A-Za-z]+)", 1))


def ring_bbox(ring):
    """(xmin, ymin, xmax, ymax) Columns of a ring — the broadcastable
    prefilter every polygon predicate should be gated by."""
    r = _c(ring)
    xs = F.transform(r, lambda v: v["x"])
    ys = F.transform(r, lambda v: v["y"])
    return (
        F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys)
    )


def ring_edges(ring) -> Column:
    """Edge structs (a, b) for each ring side including the closing
    edge last→first. MATERIALIZE THIS AS A COLUMN on the (broadcast)
    polygon dim when testing many points/lines against the same ring —
    interpreted HOFs re-evaluate the whole lambda body per element, so
    an inline edge construction would rebuild the array once per tested
    vertex."""
    r = _c(ring)
    n = F.size(r)
    nxt = F.concat(F.slice(r, 2, n - 1), F.slice(r, 1, 1))
    return F.zip_with(
        r, nxt, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
    )


def point_in_edges(px, py, edges) -> Column:
    """Ray-cast point-in-polygon over a prebuilt edge array (even-odd
    rule, half-open crossing test — the standard PNPOLY form;
    ANSI-equivalent:
    SUM(CASE WHEN (ay > py) <> (by > py)
             AND px < (bx-ax)*(py-ay)/(by-ay)+ax THEN 1 END) % 2 = 1).
    The divide is guarded by the y-straddle condition (by != ay there),
    so the expression is ANSI-mode safe."""
    px, py = _c(px), _c(py)

    def crosses(e: Column) -> Column:
        a, b = e["a"], e["b"]
        return F.when(
            (a["y"] > py) != (b["y"] > py),
            px
            < (b["x"] - a["x"]) * (py - a["y"]) / (b["y"] - a["y"]) + a["x"],
        ).otherwise(F.lit(False))

    n_cross = F.size(F.filter(_c(edges), crosses))
    return n_cross % 2 == 1


def point_in_ring(px, py, ring) -> Column:
    """point_in_edges over an inline-built edge array (convenience for
    one-off tests; hot paths should prebuild edges via ring_edges)."""
    return point_in_edges(px, py, ring_edges(ring))


def _proper_cross(px, py, qx, qy, ax, ay, bx, by) -> Column:
    """Segment pq properly crosses segment ab: the endpoints of each
    segment lie strictly on opposite sides of the other's line
    (orientation cross-products with strict signs; collinear touches —
    measure-zero on continuous data — report false, matching the SQL
    oracle formulation exactly)."""
    d1 = (qx - px) * (ay - py) - (qy - py) * (ax - px)
    d2 = (qx - px) * (by - py) - (qy - py) * (bx - px)
    d3 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    d4 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    return (
        ((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))
    ) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )


def line_intersects_edges(line, edges) -> Column:
    """ST_Intersects(LINESTRING, POLYGON) for a vertex array line and a
    prebuilt ring edge array: true iff any line vertex is inside the
    ring, or any line segment properly crosses any ring edge. (A
    segment entering a simple polygon must either start/end inside or
    cross the boundary, so this is exact up to measure-zero boundary
    touches.) Handles single-vertex 'lines' (degenerate point) via the
    vertex arm."""
    ln = _c(line)
    edges = _c(edges)
    vertex_in = F.exists(
        ln, lambda v: point_in_edges(v["x"], v["y"], edges)
    )
    n = F.size(ln)
    segs = F.zip_with(
        F.slice(ln, 1, n - 1),
        F.slice(ln, 2, n - 1),
        lambda p, q: F.struct(p.alias("p"), q.alias("q")),
    )
    seg_cross = F.exists(
        segs,
        lambda s: F.exists(
            edges,
            lambda e: _proper_cross(
                s["p"]["x"], s["p"]["y"], s["q"]["x"], s["q"]["y"],
                e["a"]["x"], e["a"]["y"], e["b"]["x"], e["b"]["y"],
            ),
        ),
    )
    return vertex_in | seg_cross


def line_intersects_ring(line, ring) -> Column:
    return line_intersects_edges(line, ring_edges(ring))


def tpoint_intersects_edges(t, edges) -> Column:
    """ST_Intersects(trajectory(tpoint), POLYGON) without materializing
    the WKT: per sequence, the instants' positions form the linestring
    (sequences are disjoint trajectories — no phantom inter-sequence
    segments)."""
    tc = _c(t)
    return F.exists(
        tc["seqs"],
        lambda s: line_intersects_edges(
            F.transform(s["instants"], lambda i: i["v"]), edges
        ),
    )


def tpoint_intersects_ring(t, ring) -> Column:
    return tpoint_intersects_edges(t, ring_edges(ring))


def line_edges(pts) -> Column:
    """Edge structs (a, b) for an OPEN linestring vertex array (no
    closing edge — contrast ring_edges)."""
    p = _c(pts)
    n = F.size(p)
    return F.zip_with(
        F.slice(p, 1, n - 1), F.slice(p, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def point_on_edges(px, py, edges) -> Column:
    """Point lies ON one of the edges: collinear (exact cross-product
    zero) and inside the edge's bbox."""
    px, py = _c(px), _c(py)

    def on(e: Column) -> Column:
        a, b = e["a"], e["b"]
        ex, ey = b["x"] - a["x"], b["y"] - a["y"]
        cr = (px - a["x"]) * ey - (py - a["y"]) * ex
        return (
            (cr == 0)
            & (px >= F.least(a["x"], b["x"]))
            & (px <= F.greatest(a["x"], b["x"]))
            & (py >= F.least(a["y"], b["y"]))
            & (py <= F.greatest(a["y"], b["y"]))
        )

    return F.exists(_c(edges), on)


def segment_inside_intervals(px, py, qx, qy, edges) -> Column:
    """ARRAY<STRUCT<lo, hi>> of motion-parameter intervals s ∈ [0, 1]
    during which the segment p→q lies INSIDE the simple polygon whose
    prebuilt edge array is `edges` (even-odd interior; boundary per the
    PNPOLY half-open rule of point_in_edges).

    Method: every strict proper crossing of a polygon edge contributes
    its segment parameter s = d3/(d3−d4) (strictly in (0,1) by the
    strict sign tests); {0, 1} ∪ crossings sorted partitions [0, 1];
    each sub-interval's state is decided by a ray-cast on its midpoint —
    robust against double-toggles (vertex passes) because the state is
    computed independently per sub-interval, never by toggling.
    Collinear boundary travel and vertex/tangent touches (measure-zero
    on continuous data) follow the midpoint verdict — the same
    convention as _proper_cross, and the identical IEEE formula order is
    transliterated in the at_polygon_duration oracle.

    Reference: atGeometry over polygon interiors (MEOS tgeo_at_geom,
    /root/reference/src/geo/tgeompoint.cpp:265-273)."""
    px, py, qx, qy = _c(px), _c(py), _c(qx), _c(qy)
    eg = _c(edges)

    def s_of(e: Column) -> Column:
        a, b = e["a"], e["b"]
        d1 = (qx - px) * (a["y"] - py) - (qy - py) * (a["x"] - px)
        d2 = (qx - px) * (b["y"] - py) - (qy - py) * (b["x"] - px)
        d3 = (b["x"] - a["x"]) * (py - a["y"]) - (b["y"] - a["y"]) * (px - a["x"])
        d4 = (b["x"] - a["x"]) * (qy - a["y"]) - (b["y"] - a["y"]) * (qx - a["x"])
        proper = (
            ((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))
        ) & (
            ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
        )
        return F.when(proper, d3 / (d3 - d4))

    crossings = F.filter(F.transform(eg, s_of), lambda s: s.isNotNull())
    bounds = F.array_sort(
        F.concat(F.array(F.lit(0.0), F.lit(1.0)), crossings)
    )

    def iv(s0: Column, s1: Column) -> Column:
        m = (s0 + s1) / F.lit(2.0)
        inside = point_in_edges(px + (qx - px) * m, py + (qy - py) * m, eg)
        return F.when(
            (s1 > s0) & inside, F.struct(s0.alias("lo"), s1.alias("hi"))
        )

    pairs = F.zip_with(bounds, F.slice(bounds, 2, F.size(bounds) - 1), iv)
    return F.filter(pairs, lambda x: x.isNotNull())


def in_polygon_spanset(t, edges) -> Column:
    """atGeometry(TGEOMPOINT, POLYGON) restricted to its time dimension:
    the tstzspanset during which the moving point is INSIDE the simple
    polygon (prebuilt `edges` array) — the polygon-interior counterpart
    of on_line_spanset. Linear sequences get exact entry/exit crossing
    times via segment_inside_intervals (µs FLOOR quantization);
    discrete/single-instant sequences contribute instantaneous spans
    when the position ray-casts inside. Per-segment spans are
    normalized+merged by spanset().

    Reference: MEOS tgeo_at_geom (src/geo/tgeompoint.cpp:265-273)."""
    from ..types import INTERP_DISCRETE
    from . import span as S

    tc, eg = _c(t), _c(edges)

    def closed(lo_us, hi_us):
        return S.span(
            F.timestamp_micros(lo_us), F.timestamp_micros(hi_us),
            F.lit(True), F.lit(True),
        )

    def seg_pair_spans(p: Column, q: Column) -> Column:
        t0u = F.unix_micros(p["t"])
        dtu = (F.unix_micros(q["t"]) - t0u).cast("double")
        ivs = segment_inside_intervals(
            p["v"]["x"], p["v"]["y"], q["v"]["x"], q["v"]["y"], eg
        )
        return F.transform(
            ivs,
            lambda s: closed(
                F.floor(t0u.cast("double") + s["lo"] * dtu).cast("long"),
                F.floor(t0u.cast("double") + s["hi"] * dtu).cast("long"),
            ),
        )

    def inst_spans(seq: Column) -> Column:
        return F.transform(
            seq["instants"],
            lambda i: F.when(
                point_in_edges(i["v"]["x"], i["v"]["y"], eg),
                closed(F.unix_micros(i["t"]), F.unix_micros(i["t"])),
            ),
        )

    disc = tc["interp"] == F.lit(INTERP_DISCRETE)

    def seq_spans(seq: Column) -> Column:
        inst = seq["instants"]
        n = F.size(inst)
        pairs = F.flatten(
            F.zip_with(
                F.slice(inst, 1, n - 1), F.slice(inst, 2, n - 1),
                seg_pair_spans,
            )
        )
        return F.when(disc | (n == 1), inst_spans(seq)).otherwise(pairs)

    return S.spanset(F.flatten(F.transform(tc["seqs"], seq_spans)))


def on_line_spanset(t, edges) -> Column:
    """atGeometry(TGEOMPOINT, LINESTRING) restricted to its time
    dimension: the tstzspanset during which the moving point lies ON
    the linestring — the engine-side counterpart of the goldens-path
    atGeometry restriction (MEOS tgeo_at_geom,
    src/geo/tgeompoint.cpp:265-273 registers atGeometry).

    Per linear motion segment p→q over [t0, t1] and per line edge a→b:
    if the motion is collinear with the edge (both endpoint
    cross-products exactly zero), the covered parameter interval is the
    projection overlap clamped to [0, 1]; otherwise a proper crossing
    contributes the instantaneous parameter s = a0/(a0−a1) when both s
    and the edge parameter u lie in [0, 1]. Crossing times floor to µs
    — the identical IEEE double formula is transliterated in the
    at_line_duration oracle. Single-instant sequences and discrete
    temporals contribute instantaneous spans via point_on_edges. The
    per-segment spans are normalized+merged by spanset()."""
    from ..types import INTERP_DISCRETE
    from . import span as S

    tc, eg = _c(t), _c(edges)

    def closed(lo_us, hi_us):
        return S.span(
            F.timestamp_micros(lo_us), F.timestamp_micros(hi_us),
            F.lit(True), F.lit(True),
        )

    def seg_edge_span(p: Column, q: Column, e: Column) -> Column:
        t0u = F.unix_micros(p["t"])
        t1u = F.unix_micros(q["t"])
        dtu = (t1u - t0u).cast("double")
        px, py = p["v"]["x"], p["v"]["y"]
        qx, qy = q["v"]["x"], q["v"]["y"]
        a, b = e["a"], e["b"]
        ex, ey = b["x"] - a["x"], b["y"] - a["y"]
        dx, dy = qx - px, qy - py
        cross = dx * ey - dy * ex
        a0 = (px - a["x"]) * ey - (py - a["y"]) * ex
        a1 = (qx - a["x"]) * ey - (qy - a["y"]) * ex
        use_x = F.abs(ex) >= F.abs(ey)

        def proj(vx: Column, vy: Column) -> Column:
            return F.when(
                use_x,
                F.when(ex != 0, (vx - a["x"]) / ex).otherwise(F.lit(0.0)),
            ).otherwise(
                F.when(ey != 0, (vy - a["y"]) / ey).otherwise(F.lit(0.0))
            )

        u0, u1 = proj(px, py), proj(qx, qy)
        du = u1 - u0
        slo_raw = F.when(du != 0, (F.lit(0.0) - u0) / du)
        shi_raw = F.when(du != 0, (F.lit(1.0) - u0) / du)
        slo = F.greatest(F.least(slo_raw, shi_raw), F.lit(0.0))
        shi = F.least(F.greatest(slo_raw, shi_raw), F.lit(1.0))
        col_iv = F.when(
            du == 0,
            F.when(
                (u0 >= 0) & (u0 <= 1),
                F.struct(F.lit(0.0).alias("lo"), F.lit(1.0).alias("hi")),
            ),
        ).otherwise(
            F.when(
                slo <= shi,
                F.struct(slo.alias("lo"), shi.alias("hi")),
            )
        )
        s = F.when(cross != 0, a0 / (a0 - a1))
        sx, sy = px + dx * s, py + dy * s
        u = F.when(
            use_x, F.when(ex != 0, (sx - a["x"]) / ex).otherwise(F.lit(0.0))
        ).otherwise(
            F.when(ey != 0, (sy - a["y"]) / ey).otherwise(F.lit(0.0))
        )
        cross_iv = F.when(
            (s >= 0) & (s <= 1) & (u >= 0) & (u <= 1),
            F.struct(s.alias("lo"), s.alias("hi")),
        )
        iv = (
            F.when((cross == 0) & (a0 == 0) & (a1 == 0), col_iv)
            .when(cross != 0, cross_iv)
        )
        lo_us = F.floor(t0u.cast("double") + iv["lo"] * dtu).cast("long")
        hi_us = F.floor(t0u.cast("double") + iv["hi"] * dtu).cast("long")
        return F.when(iv.isNotNull(), closed(lo_us, hi_us))

    def inst_spans(seq: Column) -> Column:
        return F.transform(
            seq["instants"],
            lambda i: F.when(
                point_on_edges(i["v"]["x"], i["v"]["y"], eg),
                closed(F.unix_micros(i["t"]), F.unix_micros(i["t"])),
            ),
        )

    disc = tc["interp"] == F.lit(INTERP_DISCRETE)

    def seq_spans(seq: Column) -> Column:
        inst = seq["instants"]
        n = F.size(inst)
        pairs = F.flatten(
            F.zip_with(
                F.slice(inst, 1, n - 1), F.slice(inst, 2, n - 1),
                lambda p, q: F.transform(eg, lambda e: seg_edge_span(p, q, e)),
            )
        )
        return F.when(disc | (n == 1), inst_spans(seq)).otherwise(pairs)

    return S.spanset(F.flatten(F.transform(tc["seqs"], seq_spans)))

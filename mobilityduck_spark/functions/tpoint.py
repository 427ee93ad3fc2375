"""TGEOMPOINT — temporal points (trajectories).

Reference: src/geo/tgeompoint.cpp (+ tgeompoint_functions.cpp): point
instants, sequence assembly, trajectory/length, valueAtTimestamp (linear
interpolation along segments), stbox, spatial predicates.

Base value is STRUCT<x: DOUBLE, y: DOUBLE> (types.POINT_TYPE) — not WKB —
so all hot-path math (segment length, interpolation, bbox) stays in JVM
expressions. WKT/WKB rendering is the boundary for interop.

Pairwise trajectory ops (eDwithin/tDwithin/aDisjoint over two temporals)
live in operators/tpoint_pairs.py (Arrow-vectorized pandas UDF — genuine
geometry math, the designated slow path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .span import _c
from . import temporal as TT


def point(x, y) -> Column:
    return F.struct(_c(x).cast("double").alias("x"), _c(y).cast("double").alias("y"))


def tpoint_inst(x, y, t) -> Column:
    """TGEOMPOINT(point, ts) — src/geo/tgeompoint.cpp:93-101."""
    return TT.tinstant(point(x, y), t)


def tpoint_seq(instants, interp="linear", lower_inc=True, upper_inc=True) -> Column:
    """tgeompointSeq(list) — src/geo/tgeompoint.cpp:103-111. `instants`
    is ARRAY<STRUCT<t, v: STRUCT<x, y>>> (e.g. collect_list of
    struct(ts, struct(x, y)))."""
    return TT.tsequence(instants, interp=interp, lower_inc=lower_inc, upper_inc=upper_inc)


def _seg_len(p, q) -> Column:
    dx = q["v"]["x"] - p["v"]["x"]
    dy = q["v"]["y"] - p["v"]["y"]
    return F.sqrt(dx * dx + dy * dy)


def length(t) -> Column:
    """length(TGEOMPOINT) — Σ segment euclidean lengths
    (src/geo/tgeompoint.cpp:234-242, MEOS tpoint_length). Discrete/instant
    temporals have zero length."""
    tc = _c(t)
    per_seq = F.transform(
        tc["seqs"],
        lambda s: F.aggregate(
            F.zip_with(
                F.slice(s["instants"], 1, F.size(s["instants"]) - 1),
                F.slice(s["instants"], 2, F.size(s["instants"]) - 1),
                _seg_len,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    total = F.aggregate(per_seq, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(
        (tc["interp"] == 1) | (tc["subtype"] == 1), F.lit(0.0)
    ).otherwise(total)


def _fmt_coord(v: Column) -> Column:
    # render like WKT: integral values without trailing .0
    return F.when(
        v == F.floor(v), v.cast("long").cast("string")
    ).otherwise(v.cast("string"))


def _pt_txt(p) -> Column:
    return F.concat(_fmt_coord(p["x"]), F.lit(" "), _fmt_coord(p["y"]))


def trajectory_wkt(t) -> Column:
    """trajectory(TGEOMPOINT) — src/geo/tgeompoint.cpp:244-253 (MEOS
    tpoint_trajectory): POINT for a single position, LINESTRING for one
    sequence, MULTILINESTRING for a sequence set."""
    tc = _c(t)
    inst = TT.instants(tc)
    n_seq = F.size(tc["seqs"])

    def seq_line(s: Column) -> Column:
        return F.concat(
            F.lit("("),
            F.array_join(F.transform(s["instants"], lambda i: _pt_txt(i["v"])), ", "),
            F.lit(")"),
        )

    single_pt = F.concat(F.lit("POINT("), _pt_txt(inst[0]["v"]), F.lit(")"))
    one_line = F.concat(F.lit("LINESTRING"), seq_line(tc["seqs"][0]))
    multi = F.concat(
        F.lit("MULTILINESTRING("),
        F.array_join(F.transform(tc["seqs"], seq_line), ", "),
        F.lit(")"),
    )
    return (
        F.when(F.size(inst) == 1, single_pt)
        .when(n_seq == 1, one_line)
        .otherwise(multi)
    )


def value_at_timestamp(t, ts) -> Column:
    """valueAtTimestamp(TGEOMPOINT, ts) → point struct, linear
    interpolation along the enclosing segment
    (src/geo/tgeompoint.cpp:220-228, impl tgeompoint_functions.cpp:407-458).
    NULL when t is not defined at ts."""
    tc, ts = _c(t), _c(ts)
    disc = tc["interp"] == 1

    def covers(s: Column) -> Column:
        first_t = s["instants"][0]["t"]
        last_t = F.try_element_at(s["instants"], F.lit(-1))["t"]
        lo_ok = F.when(s["lower_inc"] | disc, ts >= first_t).otherwise(ts > first_t)
        hi_ok = F.when(s["upper_inc"] | disc, ts <= last_t).otherwise(ts < last_t)
        return lo_ok & hi_ok

    seq = F.try_element_at(F.filter(tc["seqs"], covers), F.lit(1))
    inst = seq["instants"]
    before = F.try_element_at(F.filter(inst, lambda i: i["t"] <= ts), F.lit(-1))
    after = F.try_element_at(F.filter(inst, lambda i: i["t"] >= ts), F.lit(1))
    frac = (F.unix_micros(ts) - F.unix_micros(before["t"])) / (
        F.unix_micros(after["t"]) - F.unix_micros(before["t"])
    )
    interp_pt = F.when(before["t"] == after["t"], before["v"]).otherwise(
        point(
            before["v"]["x"] + (after["v"]["x"] - before["v"]["x"]) * frac,
            before["v"]["y"] + (after["v"]["y"] - before["v"]["y"]) * frac,
        )
    )
    linearish = tc["interp"] == 3
    exact = F.try_element_at(
        F.filter(TT.instants(tc), lambda i: i["t"] == ts), F.lit(1)
    )["v"]
    return F.when(seq.isNull(), F.lit(None)).otherwise(
        F.when(disc, exact).otherwise(
            F.when(linearish, interp_pt).otherwise(before["v"])
        )
    )


def at_values_point(t, x, y) -> Column:
    """atValues(TGEOMPOINT, point) — restrict to times AT a given point
    (src/geo/tgeompoint.cpp:190-198): instants whose position equals
    (x, y) exactly (step/discrete sampling semantics)."""
    tc = _c(t)
    kept = F.filter(
        TT.instants(tc),
        lambda i: (i["v"]["x"] == _c(x)) & (i["v"]["y"] == _c(y)),
    )
    n = F.size(kept)
    return F.when(
        n > 0,
        TT._temporal_struct(
            F.when(n == 1, F.lit(1)).otherwise(F.lit(2)),
            F.lit(1),
            F.array(TT._seq_struct(F.lit(True), F.lit(True), kept)),
        ),
    )


def at_box_sampled(t, box) -> Column:
    """Restrict a trajectory to the instants inside an STBOX (sampling
    semantics: keeps observed positions, splits sequences between
    non-adjacent survivors; exact MEOS atGeometry interpolates segment/
    boundary crossings — see operators.tpoint_pairs for the exact path).

    Reference: atGeometry, src/geo/tgeompoint.cpp:265-273.
    """
    tc, b = _c(t), _c(box)

    def inside(i: Column) -> Column:
        sp_ok = F.when(
            b["hasx"],
            (i["v"]["x"] >= b["xmin"]) & (i["v"]["x"] <= b["xmax"])
            & (i["v"]["y"] >= b["ymin"]) & (i["v"]["y"] <= b["ymax"]),
        ).otherwise(F.lit(True))
        t_ok = F.when(
            b["hast"], (i["t"] >= b["tmin"]) & (i["t"] <= b["tmax"])
        ).otherwise(F.lit(True))
        return sp_ok & t_ok

    kept = F.filter(TT.instants(tc), inside)
    n = F.size(kept)
    return F.when(
        n > 0,
        TT._temporal_struct(
            F.when(n == 1, F.lit(1)).otherwise(F.lit(2)),
            F.lit(1),  # restriction by sampling → discrete
            F.array(TT._seq_struct(F.lit(True), F.lit(True), kept)),
        ),
    )


def speed(t) -> Column:
    """Average speed (length / duration); 0 for degenerate temporals."""
    tc = _c(t)
    dur = TT.duration_secs(tc)
    return F.when(dur > 0, length(tc) / dur).otherwise(F.lit(0.0))


# ------------------------------------------------------------ projections
def web_mercator(lon, lat) -> Column:
    """ST_Transform('EPSG:4326' → 'EPSG:3857') — the only projection the
    reference workload uses (BerlinMOD 07_trips.sql via duckdb-spatial).
    Closed-form spherical web-mercator forward; no PROJ needed."""
    import math

    R = 6378137.0
    x = _c(lon) * F.lit(math.pi * R / 180.0)
    y = F.log(F.tan((F.lit(90.0) + _c(lat)) * F.lit(math.pi / 360.0))) * F.lit(R)
    return F.struct(x.alias("x"), y.alias("y"))

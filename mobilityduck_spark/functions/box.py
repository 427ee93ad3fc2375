"""TBOX (value × time) and STBOX (space × time) bounding boxes.

Reference: src/temporal/tbox.cpp (17 constructor overloads :127-295,
accessors :331-425, shift/scale/expand :431-545) and src/geo/stbox.cpp
(constructors :53-141, area :153-161, expandSpace :163-171, `&&`/`@>`
predicates :173-192).

Encoding (types.py): transparent structs; every predicate expands to
plain interval comparisons on struct fields, so Catalyst can use them in
range-join conditions instead of forcing a cartesian product — the exact
optimization the reference's opaque-BLOB `&&` blocks (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .span import _c
from . import temporal as TT


# ------------------------------------------------------------ TBOX
def tbox(
    xmin=None,
    xmax=None,
    tmin=None,
    tmax=None,
    xmin_inc=True,
    xmax_inc=True,
    tmin_inc=True,
    tmax_inc=True,
) -> Column:
    """One dispatcher covering the reference's 17 tbox overloads
    (src/temporal/tbox.cpp:127-295): pass value and/or time bounds."""
    null_d = F.lit(None).cast("double")
    null_t = F.lit(None).cast("timestamp")
    null_b = F.lit(None).cast("boolean")
    has_x = xmin is not None
    has_t = tmin is not None
    return F.struct(
        (_c(xmin).cast("double") if has_x else null_d).alias("xmin"),
        (_c(xmax if xmax is not None else xmin).cast("double") if has_x else null_d).alias("xmax"),
        (_c(xmin_inc) if has_x else null_b).alias("xmin_inc"),
        (_c(xmax_inc) if has_x else null_b).alias("xmax_inc"),
        (_c(tmin) if has_t else null_t).alias("tmin"),
        (_c(tmax if tmax is not None else tmin) if has_t else null_t).alias("tmax"),
        (_c(tmin_inc) if has_t else null_b).alias("tmin_inc"),
        (_c(tmax_inc) if has_t else null_b).alias("tmax_inc"),
    )


def tbox_from_span(value_span=None, time_span=None) -> Column:
    """tbox(numspan, tstzspan) overloads."""
    vs = _c(value_span) if value_span is not None else None
    ts = _c(time_span) if time_span is not None else None
    return tbox(
        xmin=vs["lower"] if vs is not None else None,
        xmax=vs["upper"] if vs is not None else None,
        tmin=ts["lower"] if ts is not None else None,
        tmax=ts["upper"] if ts is not None else None,
        xmin_inc=vs["lower_inc"] if vs is not None else True,
        xmax_inc=vs["upper_inc"] if vs is not None else True,
        tmin_inc=ts["lower_inc"] if ts is not None else True,
        tmax_inc=ts["upper_inc"] if ts is not None else True,
    )


def tbox_of_temporal(t) -> Column:
    """tnumber → TBOX cast: value hull × time hull."""
    tc = _c(t)
    tspan = TT.time_span(tc)
    return tbox(
        xmin=TT.min_value(tc),
        xmax=TT.max_value(tc),
        tmin=tspan["lower"],
        tmax=tspan["upper"],
        tmin_inc=tspan["lower_inc"],
        tmax_inc=tspan["upper_inc"],
    )


def has_x(b) -> Column:
    return _c(b)["xmin"].isNotNull()


def has_t(b) -> Column:
    return _c(b)["tmin"].isNotNull()


def tbox_shift_value(b, delta) -> Column:
    b = _c(b)
    return b.withField("xmin", b["xmin"] + _c(delta)).withField(
        "xmax", b["xmax"] + _c(delta)
    )


def tbox_shift_time(b, delta) -> Column:
    b = _c(b)
    return b.withField("tmin", b["tmin"] + _c(delta)).withField(
        "tmax", b["tmax"] + _c(delta)
    )


def tbox_expand_value(b, d) -> Column:
    """expandValue(TBOX, d) — tbox.cpp:431-545."""
    b = _c(b)
    return b.withField("xmin", b["xmin"] - _c(d)).withField("xmax", b["xmax"] + _c(d))


def tbox_expand_time(b, d) -> Column:
    b = _c(b)
    return b.withField("tmin", b["tmin"] - _c(d)).withField("tmax", b["tmax"] + _c(d))


def _dim_overlaps(alo, ahi, alo_i, ahi_i, blo, bhi, blo_i, bhi_i) -> Column:
    left = F.when(alo < bhi, F.lit(True)).otherwise((alo == bhi) & alo_i & bhi_i)
    right = F.when(blo < ahi, F.lit(True)).otherwise((blo == ahi) & blo_i & ahi_i)
    return left & right


def _dim_contains(alo, ahi, alo_i, ahi_i, blo, bhi, blo_i, bhi_i) -> Column:
    lo_ok = F.when(alo < blo, F.lit(True)).otherwise((alo == blo) & (alo_i | ~blo_i))
    hi_ok = F.when(ahi > bhi, F.lit(True)).otherwise((ahi == bhi) & (ahi_i | ~bhi_i))
    return lo_ok & hi_ok


def tbox_overlaps(a, b) -> Column:
    """TBOX && TBOX: overlap on every dimension both boxes have."""
    a, b = _c(a), _c(b)
    x_ok = F.when(
        has_x(a) & has_x(b),
        _dim_overlaps(
            a["xmin"], a["xmax"], a["xmin_inc"], a["xmax_inc"],
            b["xmin"], b["xmax"], b["xmin_inc"], b["xmax_inc"],
        ),
    ).otherwise(F.lit(True))
    t_ok = F.when(
        has_t(a) & has_t(b),
        _dim_overlaps(
            a["tmin"], a["tmax"], a["tmin_inc"], a["tmax_inc"],
            b["tmin"], b["tmax"], b["tmin_inc"], b["tmax_inc"],
        ),
    ).otherwise(F.lit(True))
    return x_ok & t_ok


def tbox_contains(a, b) -> Column:
    """TBOX @> TBOX."""
    a, b = _c(a), _c(b)
    x_ok = F.when(
        has_x(a) & has_x(b),
        _dim_contains(
            a["xmin"], a["xmax"], a["xmin_inc"], a["xmax_inc"],
            b["xmin"], b["xmax"], b["xmin_inc"], b["xmax_inc"],
        ),
    ).otherwise(F.lit(True))
    t_ok = F.when(
        has_t(a) & has_t(b),
        _dim_contains(
            a["tmin"], a["tmax"], a["tmin_inc"], a["tmax_inc"],
            b["tmin"], b["tmax"], b["tmin_inc"], b["tmax_inc"],
        ),
    ).otherwise(F.lit(True))
    return x_ok & t_ok


# ------------------------------------------------------------ STBOX
def stbox(
    xmin=None, ymin=None, xmax=None, ymax=None, tmin=None, tmax=None, srid=0
) -> Column:
    """STBOX constructor (src/geo/stbox.cpp:53-141)."""
    null_d = F.lit(None).cast("double")
    null_t = F.lit(None).cast("timestamp")
    hx = xmin is not None
    ht = tmin is not None
    return F.struct(
        (_c(xmin).cast("double") if hx else null_d).alias("xmin"),
        (_c(ymin).cast("double") if hx else null_d).alias("ymin"),
        (_c(xmax if xmax is not None else xmin).cast("double") if hx else null_d).alias("xmax"),
        (_c(ymax if ymax is not None else ymin).cast("double") if hx else null_d).alias("ymax"),
        (_c(tmin) if ht else null_t).alias("tmin"),
        (_c(tmax if tmax is not None else tmin) if ht else null_t).alias("tmax"),
        F.lit(srid).cast("int").alias("srid"),
        F.lit(hx).alias("hasx"),
        F.lit(ht).alias("hast"),
    )


def stbox_of_tpoint(t) -> Column:
    """stbox(TGEOMPOINT) — src/geo/tgeompoint.cpp:113-121: spatiotemporal
    bounding box of a temporal point."""
    inst = TT.instants(_c(t))
    xs = F.transform(inst, lambda i: i["v"]["x"])
    ys = F.transform(inst, lambda i: i["v"]["y"])
    ts_ = F.transform(inst, lambda i: i["t"])
    return stbox(
        xmin=F.array_min(xs),
        ymin=F.array_min(ys),
        xmax=F.array_max(xs),
        ymax=F.array_max(ys),
        tmin=F.array_min(ts_),
        tmax=F.array_max(ts_),
    )


def stbox_of_point(x, y, t=None) -> Column:
    """stbox(wkb[, ts]) analog for point structs."""
    return stbox(xmin=_c(x), ymin=_c(y), xmax=_c(x), ymax=_c(y), tmin=t, tmax=t)


def expand_space(b, d) -> Column:
    """expandSpace(STBOX, d) — src/geo/stbox.cpp:163-171."""
    b = _c(b)
    return (
        b.withField("xmin", b["xmin"] - _c(d))
        .withField("ymin", b["ymin"] - _c(d))
        .withField("xmax", b["xmax"] + _c(d))
        .withField("ymax", b["ymax"] + _c(d))
    )


def area(b) -> Column:
    """area(STBOX) — src/geo/stbox.cpp:153-161 (planar)."""
    b = _c(b)
    return (b["xmax"] - b["xmin"]) * (b["ymax"] - b["ymin"])


def geodetic_area(b) -> Column:
    """area(GEODSTBOX) — src/geo/stbox_functions.cpp:444-474 with
    spheroid=true: WGS84 ellipsoidal area of the box's geodesic-edge
    corner polygon.  Arrow-batched pandas UDF over the exact
    Green's-theorem evaluation in geodesy.py (per-row scalar math; no
    shuffle implications)."""
    from .. import geodesy

    b = _c(b)
    udf = geodesy.geodetic_area_udf()
    return udf(b["xmin"], b["ymin"], b["xmax"], b["ymax"])


def stbox_overlaps(a, b) -> Column:
    """STBOX && STBOX — src/geo/stbox.cpp:173-181. Closed bounds (MEOS
    STBox has no inc flags). Expands to 6 range comparisons: usable as a
    Catalyst range-join predicate."""
    a, b = _c(a), _c(b)
    x_ok = F.when(
        a["hasx"] & b["hasx"],
        (a["xmin"] <= b["xmax"]) & (b["xmin"] <= a["xmax"])
        & (a["ymin"] <= b["ymax"]) & (b["ymin"] <= a["ymax"]),
    ).otherwise(F.lit(True))
    t_ok = F.when(
        a["hast"] & b["hast"],
        (a["tmin"] <= b["tmax"]) & (b["tmin"] <= a["tmax"]),
    ).otherwise(F.lit(True))
    return x_ok & t_ok


def stbox_contains(a, b) -> Column:
    """STBOX @> STBOX — src/geo/stbox.cpp:183-192."""
    a, b = _c(a), _c(b)
    x_ok = F.when(
        a["hasx"] & b["hasx"],
        (a["xmin"] <= b["xmin"]) & (a["xmax"] >= b["xmax"])
        & (a["ymin"] <= b["ymin"]) & (a["ymax"] >= b["ymax"]),
    ).otherwise(F.lit(True))
    t_ok = F.when(
        a["hast"] & b["hast"],
        (a["tmin"] <= b["tmin"]) & (a["tmax"] >= b["tmax"]),
    ).otherwise(F.lit(True))
    return x_ok & t_ok


def _wkt_num(v: Column) -> Column:
    return F.when(v == F.floor(v), v.cast("long").cast("string")).otherwise(
        v.cast("string")
    )


def stbox_to_wkt(b) -> Column:
    """geometry(STBOX) → polygon WKT (src/geo/stbox.cpp:143-151 returns
    WKB; we render WKT — binary variant in tpoint.wkt/wkb helpers)."""
    b = _c(b)
    return F.concat(
        F.lit("POLYGON(("),
        _wkt_num(b["xmin"]), F.lit(" "), _wkt_num(b["ymin"]), F.lit(", "),
        _wkt_num(b["xmax"]), F.lit(" "), _wkt_num(b["ymin"]), F.lit(", "),
        _wkt_num(b["xmax"]), F.lit(" "), _wkt_num(b["ymax"]), F.lit(", "),
        _wkt_num(b["xmin"]), F.lit(" "), _wkt_num(b["ymax"]), F.lit(", "),
        _wkt_num(b["xmin"]), F.lit(" "), _wkt_num(b["ymin"]),
        F.lit("))"),
    )


def tbox_scale_time(b, duration) -> Column:
    """scaleTime(TBOX, interval): keep tmin, set tmax = tmin + duration —
    tbox.cpp:431-545 (tbox_shift_scale_time). A value-only box (hast
    false) has no time dimension to scale: MEOS errors, we return the
    box unchanged rather than silently fabricating a tmax."""
    b = _c(b)
    return F.when(
        b["tmin"].isNotNull(), b.withField("tmax", b["tmin"] + _c(duration))
    ).otherwise(b)


def tbox_shift_scale_time(b, shift, duration) -> Column:
    """shiftScaleTime(TBOX, shift, duration) — tbox.cpp:431-545."""
    return tbox_scale_time(tbox_shift_time(b, shift), duration)

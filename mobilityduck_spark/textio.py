"""Text in/out for MobilityDB-style literals.

The reference registers VARCHAR↔type casts for every type
(src/temporal/temporal.cpp:58-74, src/temporal/span.cpp:83-126, ...);
its golden tests pin exact text rendering (timezone-normalized to +00,
booleans as t/f — test/sql/tint.test:13-16, tbool.test:10-13).

Here: plain-Python parse/format working on dicts shaped like our struct
encoding (types.py). Used by the pytest golden suite
(parse → createDataFrame → engine fn → collect → format → compare) and
by `sources/` loaders. Not a row-path dependency of any query operator.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from typing import Any

from .types import (
    INTERP_DISCRETE,
    INTERP_LINEAR,
    INTERP_NONE,
    INTERP_STEP,
    SUBTYPE_INSTANT,
    SUBTYPE_SEQUENCE,
    SUBTYPE_SEQUENCESET,
)

# ---------------------------------------------------------------- values
_TS_RE = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})"
    r"(?:[ T](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?)?"
    r"\s*(?:(Z)|([+-])(\d{2})(?::?(\d{2}))?)?$"
)


def parse_ts(s: str) -> datetime:
    """Parse `2025-01-01 10:00:00+05` → aware datetime normalized to UTC."""
    m = _TS_RE.match(s.strip())
    if not m:
        raise ValueError(f"bad timestamp literal: {s!r}")
    y, mo, d = int(m[1]), int(m[2]), int(m[3])
    hh = int(m[4] or 0)
    mi = int(m[5] or 0)
    ss = int(m[6] or 0)
    us = int((m[7] or "0").ljust(6, "0")[:6])
    dt = datetime(y, mo, d, hh, mi, ss, us, tzinfo=timezone.utc)
    if m[9]:  # explicit offset
        sign = -1 if m[9] == "-" else 1
        off = timedelta(hours=int(m[10]), minutes=int(m[11] or 0)) * sign
        dt -= off
    return dt


def format_ts(dt: datetime) -> str:
    """Render UTC: `2025-01-01 05:00:00+00` (fractional secs only if set)."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc)
    base = dt.strftime("%Y-%m-%d %H:%M:%S")
    if dt.microsecond:
        base += f".{dt.microsecond:06d}".rstrip("0")
    return base + "+00"


def parse_base(s: str, base: str) -> Any:
    s = s.strip()
    if base == "int":
        return int(s)
    if base == "float":
        return float(s)
    if base == "bool":
        if s.lower() in ("t", "true"):
            return True
        if s.lower() in ("f", "false"):
            return False
        raise ValueError(f"bad bool literal: {s!r}")
    if base == "text":
        return s[1:-1] if len(s) >= 2 and s[0] == '"' and s[-1] == '"' else s
    if base in ("timestamp", "tstz"):
        return parse_ts(s)
    if base == "date":
        return parse_ts(s).date()
    if base == "point":
        m = re.match(r"(?i)\s*point\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)\s*\)", s)
        if not m:
            raise ValueError(f"bad point literal: {s!r}")
        return {"x": float(m[1]), "y": float(m[2])}
    if base == "geom":
        from .wkt import normalize_wkt

        return normalize_wkt(s)
    raise ValueError(f"unknown base type: {base}")


def format_base(v: Any, base: str) -> str:
    if v is None:
        return "NULL"
    if base == "bool":
        return "t" if v else "f"
    if base == "float":
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # MEOS prints the shortest round-trip form capped at
        # OUT_DEFAULT_DECIMAL_DIGITS=15 digits after the decimal point
        # (liblwgeom lwprint_double; goldens: radians(45) ->
        # 0.785398163397448 but degrees(0.5) -> 28.64788975654116)
        s = repr(v)
        if "e" in s or "E" in s:
            return s
        frac = s.split(".", 1)[1] if "." in s else ""
        if len(frac) > 15:
            return f"{v:.15f}".rstrip("0").rstrip(".")
        return s
    if base in ("timestamp", "tstz"):
        return format_ts(v)
    if base == "date":
        return v.isoformat()
    if base == "text":
        return f'"{v}"'
    if base == "point":
        x, y = (v["x"], v["y"]) if isinstance(v, dict) else (v.x, v.y)
        return f"POINT({_num(x)} {_num(y)})"
    if base == "geom":
        return str(v)  # already-normalized WKT
    return str(v)


def _num(x: float) -> str:
    return str(int(x)) if x == int(x) else repr(x)


# ---------------------------------------------------------------- temporal
def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at depth 0 w.r.t. () [] {} and double quotes."""
    out, depth, cur, in_q = [], 0, [], False
    for ch in s:
        if ch == '"':
            in_q = not in_q
        if not in_q:
            if ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            elif ch == sep and depth == 0:
                out.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def _parse_instant(s: str, base: str) -> dict:
    v, t = s.rsplit("@", 1)
    return {"t": parse_ts(t), "v": parse_base(v, base)}


def _parse_seq(s: str, base: str) -> dict:
    s = s.strip()
    lower_inc = s[0] == "["
    upper_inc = s[-1] == "]"
    inst = [_parse_instant(x, base) for x in _split_top(s[1:-1])]
    if len(inst) == 1:
        lower_inc = upper_inc = True
    return {"lower_inc": lower_inc, "upper_inc": upper_inc, "instants": inst}


def parse_temporal(s: str, base: str) -> dict:
    """Parse any temporal literal → dict matching types.temporal_type.

    Accepts an optional `Interp=Step;` prefix (MEOS syntax).
    """
    s = s.strip()
    interp_default = INTERP_LINEAR if base in ("float", "point") else INTERP_STEP
    m = re.match(r"(?i)^interp\s*=\s*(\w+)\s*;\s*", s)
    forced = None
    if m:
        forced = {"discrete": INTERP_DISCRETE, "step": INTERP_STEP,
                  "linear": INTERP_LINEAR, "none": INTERP_NONE}[m[1].lower()]
        s = s[m.end():]
    if s.startswith("{"):
        body = s[1:-1].strip()
        if body.startswith("[") or body.startswith("("):
            seqs = [_parse_seq(x, base) for x in _split_top(s[1:-1])]
            return {
                "subtype": SUBTYPE_SEQUENCESET,
                "interp": forced if forced is not None else interp_default,
                "seqs": seqs,
            }
        inst = [_parse_instant(x, base) for x in _split_top(body)]
        return {
            "subtype": SUBTYPE_SEQUENCE,
            "interp": INTERP_DISCRETE,
            "seqs": [{"lower_inc": True, "upper_inc": True, "instants": inst}],
        }
    if s.startswith("[") or s.startswith("("):
        return {
            "subtype": SUBTYPE_SEQUENCE,
            "interp": forced if forced is not None else interp_default,
            "seqs": [_parse_seq(s, base)],
        }
    return {
        "subtype": SUBTYPE_INSTANT,
        "interp": INTERP_NONE,
        "seqs": [
            {"lower_inc": True, "upper_inc": True, "instants": [_parse_instant(s, base)]}
        ],
    }


def _as_dict(x) -> dict:
    return x if isinstance(x, dict) else x.asDict()


def format_temporal(t, base: str) -> str:
    """Render a temporal (dict or Row) in MobilityDB text form."""
    if t is None:
        return "NULL"
    t = _as_dict(t)
    seqs = [_as_dict(s) for s in t["seqs"]]

    def fmt_inst(i) -> str:
        i = _as_dict(i)
        return f"{format_base(i['v'], base)}@{format_ts(i['t'])}"

    def fmt_seq(s) -> str:
        lo = "[" if s["lower_inc"] else "("
        hi = "]" if s["upper_inc"] else ")"
        return lo + ", ".join(fmt_inst(i) for i in s["instants"]) + hi

    interp_default = INTERP_LINEAR if base in ("float", "point") else INTERP_STEP
    prefix = ""
    if t["interp"] == INTERP_STEP and interp_default == INTERP_LINEAR and \
            t["subtype"] != SUBTYPE_INSTANT:
        prefix = "Interp=Step;"
    if t["subtype"] == SUBTYPE_INSTANT:
        return fmt_inst(seqs[0]["instants"][0])
    if t["interp"] == INTERP_DISCRETE:
        return prefix + "{" + ", ".join(
            fmt_inst(i) for s in seqs for i in s["instants"]
        ) + "}"
    if t["subtype"] == SUBTYPE_SEQUENCE:
        return prefix + fmt_seq(seqs[0])
    return prefix + "{" + ", ".join(fmt_seq(s) for s in seqs) + "}"


# ---------------------------------------------------------------- span / set
def parse_span(s: str, base: str) -> dict:
    s = s.strip()
    lower_inc = s[0] == "["
    upper_inc = s[-1] == "]"
    lo, hi = _split_top(s[1:-1])
    out = {
        "lower": parse_base(lo, base),
        "upper": parse_base(hi, base),
        "lower_inc": lower_inc,
        "upper_inc": upper_inc,
    }
    if base == "int":  # canonicalize to [lo, hi+1)
        if not out["lower_inc"]:
            out["lower"] += 1
            out["lower_inc"] = True
        if out["upper_inc"]:
            out["upper"] += 1
            out["upper_inc"] = False
    if base == "date":  # canonicalize to [lo, hi+1day)
        from datetime import timedelta as _td

        if not out["lower_inc"]:
            out["lower"] += _td(days=1)
            out["lower_inc"] = True
        if out["upper_inc"]:
            out["upper"] += _td(days=1)
            out["upper_inc"] = False
    return out


def format_span(s, base: str) -> str:
    if s is None:
        return "NULL"
    s = _as_dict(s)
    lo = "[" if s["lower_inc"] else "("
    hi = "]" if s["upper_inc"] else ")"
    return f"{lo}{format_base(s['lower'], base)}, {format_base(s['upper'], base)}{hi}"


def parse_spanset(s: str, base: str) -> list[dict]:
    s = s.strip()
    assert s[0] == "{" and s[-1] == "}", f"bad spanset literal: {s!r}"
    return [parse_span(x, base) for x in _split_top(s[1:-1])]


def format_spanset(ss, base: str) -> str:
    if ss is None:
        return "NULL"
    return "{" + ", ".join(format_span(s, base) for s in ss) + "}"


def parse_set(s: str, base: str) -> list:
    s = s.strip()
    if not (s.startswith("{") and s.endswith("}")):
        # base → set cast accepts a bare value literal
        return [parse_base(s, base)]
    return sorted({_hashable(parse_base(x, base)) for x in _split_top(s[1:-1])})


def _hashable(v):
    return v


def format_set(vals, base: str) -> str:
    if vals is None:
        return "NULL"
    if base in ("timestamp", "tstz"):
        # reference renders timestamp set members quoted
        # (test/sql/set.test: {"2001-01-01 08:00:00+00", ...})
        return "{" + ", ".join(f'"{format_ts(v)}"' for v in vals) + "}"
    return "{" + ", ".join(format_base(v, base) for v in vals) + "}"


def parse_tbox(s: str) -> dict:
    """Parse TBOX/TBOXINT/TBOXFLOAT X/T/XT literal → dict + base kind."""
    m = re.match(r"(?i)^\s*(TBOXINT|TBOXFLOAT|TBOX)\s+(XT|X|T)\s*\((.*)\)\s*$", s.strip(), re.S)
    if not m:
        raise ValueError(f"bad tbox literal: {s!r}")
    kindword, dims, body = m.group(1).upper(), m.group(2).upper(), m.group(3)
    base = "int" if kindword == "TBOXINT" else "float"
    out = {"xmin": None, "xmax": None, "xmin_inc": None, "xmax_inc": None,
           "tmin": None, "tmax": None, "tmin_inc": None, "tmax_inc": None}

    def span_part(txt, is_time):
        sp = parse_span(txt.strip(), "timestamp" if is_time else ("int" if base == "int" else "float"))
        return sp

    if dims == "XT":
        # the separating comma between the value span and the period is
        # optional in MEOS: TBOXINT XT([1,2][2000-01-01,...]) parses too
        parts = _split_top(body)
        if len(parts) == 1:
            mm = re.match(r"(?s)^\s*(.*?[\])])\s*([\[(].*)$", body)
            if not mm:
                raise ValueError(f"bad tbox XT body: {body!r}")
            parts = [mm.group(1), mm.group(2)]
        x_txt, t_txt = parts
        xs = span_part(x_txt, False)
        ts_ = span_part(t_txt, True)
        out.update(xmin=float(xs["lower"]), xmax=float(xs["upper"]),
                   xmin_inc=xs["lower_inc"], xmax_inc=xs["upper_inc"],
                   tmin=ts_["lower"], tmax=ts_["upper"],
                   tmin_inc=ts_["lower_inc"], tmax_inc=ts_["upper_inc"])
    elif dims == "X":
        xs = span_part(body, False)
        out.update(xmin=float(xs["lower"]), xmax=float(xs["upper"]),
                   xmin_inc=xs["lower_inc"], xmax_inc=xs["upper_inc"])
    else:
        ts_ = span_part(body, True)
        out.update(tmin=ts_["lower"], tmax=ts_["upper"],
                   tmin_inc=ts_["lower_inc"], tmax_inc=ts_["upper_inc"])
    return out, base


# ------------------------------------------------------------ STBOX / geoset
# Text forms for STBOX (X/Z/XT/ZT/T, GEODSTBOX, SRID prefix) and
# geometry sets. Reference: src/geo/stbox.cpp:30-141 (stbox_in/stbox_out),
# src/geo/tgeometry.cpp set I/O.

def _wkt_n(x):
    from .wkt import _n
    return _n(x)


def _wkt_normalize(s, style="meos"):
    from .wkt import normalize_wkt
    return normalize_wkt(s, style=style)


def parse_stbox(s: str) -> dict:
    m = re.match(
        r"(?is)^\s*(?:SRID\s*=\s*(\d+)\s*;)?\s*(GEODSTBOX|STBOX)\s+(ZT|XT|Z|X|T)\s*\((.*)\)\s*$",
        s.strip(),
    )
    if not m:
        raise ValueError(f"bad stbox literal: {s!r}")
    srid = int(m.group(1)) if m.group(1) else None
    geod = m.group(2).upper() == "GEODSTBOX"
    dims = m.group(3).upper()
    body = m.group(4)
    d = {
        "geodetic": geod, "srid": srid,
        "xmin": None, "ymin": None, "zmin": None,
        "xmax": None, "ymax": None, "zmax": None,
        "tmin": None, "tmax": None, "tmin_inc": True, "tmax_inc": True,
    }

    def corners(txt):
        pts = re.findall(r"\(([^()]*)\)", txt)
        lo = [float(x) for x in pts[0].split(",")]
        hi = [float(x) for x in pts[1].split(",")]
        return lo, hi

    if dims in ("X", "Z"):
        lo, hi = corners(body)
    elif dims in ("XT", "ZT"):
        sp_txt, t_txt = body.rsplit(",[", 1) if ",[" in body else body.rsplit(",(", 1)
        brack = body[len(sp_txt) + 1]
        lo, hi = corners(sp_txt)
        t_span = parse_span(brack + t_txt, "timestamp")
        d.update(tmin=t_span["lower"], tmax=t_span["upper"],
                 tmin_inc=t_span["lower_inc"], tmax_inc=t_span["upper_inc"])
    else:  # T
        t_span = parse_span(body.strip(), "timestamp")
        d.update(tmin=t_span["lower"], tmax=t_span["upper"],
                 tmin_inc=t_span["lower_inc"], tmax_inc=t_span["upper_inc"])
        lo = hi = None
    if lo is not None:
        d.update(xmin=lo[0], ymin=lo[1], xmax=hi[0], ymax=hi[1])
        if len(lo) > 2:
            d.update(zmin=lo[2], zmax=hi[2])
    if d["srid"] is None:
        d["srid"] = 4326 if (geod and lo is not None) else 0
    return d



def format_stbox(d: dict) -> str:
    name = "GEODSTBOX" if d["geodetic"] else "STBOX"
    nn = _wkt_n
    has_x = d["xmin"] is not None
    has_z = d["zmin"] is not None
    has_t = d["tmin"] is not None
    if has_x:
        dims = ("Z" if has_z else "X") + ("T" if has_t else "")
    else:
        dims = "T"
    parts = []
    if has_x:
        lo = [d["xmin"], d["ymin"]] + ([d["zmin"]] if has_z else [])
        hi = [d["xmax"], d["ymax"]] + ([d["zmax"]] if has_z else [])
        sp = f"(({','.join(nn(v) for v in lo)}),({','.join(nn(v) for v in hi)}))"
        parts.append(sp)
    if has_t:
        lo_b = "[" if d["tmin_inc"] else "("
        hi_b = "]" if d["tmax_inc"] else ")"
        parts.append(
            f"{lo_b}{format_ts(d['tmin'])}, {format_ts(d['tmax'])}{hi_b}"
        )
    if has_x and has_t:
        body = f"{dims}({parts[0]},{parts[1]})"
    elif has_x:
        body = f"{dims}{parts[0]}"  # X/Z-only: no extra wrapping parens
    else:
        body = f"T({parts[0]})"
    prefix = f"SRID={d['srid']};" if d["srid"] not in (0, None) else ""
    return f"{prefix}{name} {body}"



def parse_geoset(s: str, default_srid: int) -> dict:
    m = re.match(r"(?is)^\s*(?:SRID\s*=\s*(\d+)\s*;)?\s*\{(.*)\}\s*$", s.strip())
    if not m:
        raise ValueError(f"bad geoset literal: {s!r}")
    srid = int(m.group(1)) if m.group(1) else default_srid
    vals = []
    for item in _split_top(m.group(2)):
        item = item.strip()
        if item.startswith('"') and item.endswith('"'):
            item = item[1:-1]
        vals.append(_wkt_normalize(item))
    return {"srid": srid, "vals": vals}



# ----------------------------------------------------------- STBOX WKB
# asBinary(STBOX) / stboxFromBinary — field order follows MEOS
# stbox_to_wkb_buf (meos type_out.c; reference registers the pair at
# src/geo/stbox.cpp:62-103): endian byte, flags byte (X|Z|T|GEODETIC|
# SRID), optional int32 SRID, the period as (int64 µs lower, int64 µs
# upper, bounds byte), then xmin,xmax,ymin,ymax[,zmin,zmax] doubles.
_WKB_X, _WKB_Z, _WKB_T = 0x01, 0x02, 0x04
_WKB_GEOD, _WKB_SRID = 0x08, 0x10


def _ts_us(ts: datetime) -> int:
    return int(ts.timestamp() * 1_000_000) if ts.tzinfo else int(
        ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000
    )


def stbox_as_binary(d: dict) -> bytes:
    import struct

    has_x = d.get("xmin") is not None
    has_z = d.get("zmin") is not None
    has_t = d.get("tmin") is not None
    flags = (
        (_WKB_X if has_x else 0)
        | (_WKB_Z if has_z else 0)
        | (_WKB_T if has_t else 0)
        | (_WKB_GEOD if d.get("geodetic") else 0)
        | (_WKB_SRID if d.get("srid") else 0)
    )
    out = struct.pack("<BB", 1, flags)  # 1 = little-endian (NDR)
    if d.get("srid"):
        out += struct.pack("<i", d["srid"])
    if has_t:
        bounds = (1 if d.get("tmin_inc", True) else 0) | (
            2 if d.get("tmax_inc", True) else 0
        )
        out += struct.pack(
            "<qqB", _ts_us(d["tmin"]), _ts_us(d["tmax"]), bounds
        )
    if has_x:
        out += struct.pack("<dddd", d["xmin"], d["xmax"], d["ymin"], d["ymax"])
        if has_z:
            out += struct.pack("<dd", d["zmin"], d["zmax"])
    return out


def stbox_from_binary(b: bytes) -> dict:
    import struct

    endian, flags = struct.unpack_from("<BB", b, 0)
    if endian != 1:
        raise ValueError("big-endian STBOX WKB unsupported")
    off = 2
    d = {
        "geodetic": bool(flags & _WKB_GEOD), "srid": None,
        "xmin": None, "ymin": None, "zmin": None,
        "xmax": None, "ymax": None, "zmax": None,
        "tmin": None, "tmax": None, "tmin_inc": True, "tmax_inc": True,
    }
    if flags & _WKB_SRID:
        (d["srid"],) = struct.unpack_from("<i", b, off)
        off += 4
    if flags & _WKB_T:
        lo, hi, bounds = struct.unpack_from("<qqB", b, off)
        off += 17
        d["tmin"] = datetime.fromtimestamp(lo / 1_000_000, tz=timezone.utc)
        d["tmax"] = datetime.fromtimestamp(hi / 1_000_000, tz=timezone.utc)
        d["tmin_inc"] = bool(bounds & 1)
        d["tmax_inc"] = bool(bounds & 2)
    if flags & _WKB_X:
        d["xmin"], d["xmax"], d["ymin"], d["ymax"] = struct.unpack_from(
            "<dddd", b, off
        )
        off += 32
        if flags & _WKB_Z:
            d["zmin"], d["zmax"] = struct.unpack_from("<dd", b, off)
            off += 16
    return d

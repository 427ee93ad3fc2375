"""Minimal WKT/WKB utilities (pure Python, no geometry libs).

Supports POINT / LINESTRING / POLYGON — the geometry subset the
reference's test corpus and workload use (SURVEY.md §2.9). Two render
styles: MEOS-style (`LINESTRING(0 0,0 1)`) and duckdb-spatial-style
(`LINESTRING (0 0, 0 1)`).
"""

from __future__ import annotations

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


def _n(x: float) -> str:
    return str(int(x)) if x == int(x) else repr(x)


def render_wkt(typ: str, coords, style: str = "meos") -> str:
    """style 'meos': LINESTRING(0 0,0 1); 'duckdb': LINESTRING (0 0, 0 1)."""
    sp = " " if style == "duckdb" else ""
    join = ", " if style == "duckdb" else ","

    def pts(cs):
        return join.join(f"{_n(x)} {_n(y)}" for x, y in cs)

    if typ == "POINT":
        return f"POINT{sp}({pts(coords)})"
    if typ == "LINESTRING":
        return f"LINESTRING{sp}({pts(coords)})"
    inner = join.join(f"({pts(r)})" for r in coords)
    return f"POLYGON{sp}({inner})"


def normalize_wkt(s: str, style: str = "meos") -> str:
    typ, coords = parse_wkt(s)
    return render_wkt(typ, coords, style)


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

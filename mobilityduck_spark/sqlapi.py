"""SQL entry point: temporal/spatial functions callable from spark.sql.

The reference's primary interface is SQL with extension types
(SURVEY §3.1: `SELECT l.Licence, SUM(length(atTime(t.Trip, p.Period)))
FROM Trips t, Licences1 l, Periods1 p WHERE ... t.Trip && p.Period`,
benchmark/BerlinMOD/sql/queries/query_8.sql). This module gives Spark
users the same surface via **SQL UDFs** (CREATE TEMPORARY FUNCTION …
RETURN <expression>, Spark 4): each function body is a SQL expression
over the transparent struct encodings (types.py), so calls INLINE into
the Catalyst plan — full codegen, predicate pushdown, no UDF boundary.
This is the Spark-idiomatic analog of the reference's C++ scalar
function registrations (src/temporal/temporal.cpp:58-443): where DuckDB
dispatches to MEOS per row, these functions dissolve into the same
expression trees the DataFrame API builds.

`register_sql_functions(spark)` registers the family once per session;
names follow the reference SQL surface (timeSpan, startTimestamp,
length, expandSpace, …). SQL has no overloading for temporary
functions, so non-tgeompoint variants carry a type suffix (_tfloat).

Verified: tests/test_sqlapi.py runs the BerlinMOD q8 shape in pure
spark.sql and checks row-identity against the DataFrame formulation.

Supported-CRS boundary (transform / ST_Transform analog): the
reference delegates reprojection to duckdb-spatial/PROJ and accepts
any EPSG pair (src/geo/geoset.cpp:95-115). This engine ships
closed-form forward projections — no native PROJ dependency — for
geographic sources 4326/4258/4269 to: EPSG:3857 (web mercator),
EPSG:3812 (Belgian Lambert 2008), and every UTM zone
(326zz/327zz/258zz/269zz, transverse-Mercator series validated to
<1 mm against an independent Krüger-series implementation,
tests/test_utm_transform.py). Round 11 added an EPSG parameter-table
dispatcher (wkt.py) over generalized Krüger-TM / LCC-2SP kernels plus
a 7-parameter position-vector Helmert: EPSG:27700 (OSGB36 British
National Grid — projection validated <1 mm against the OS worked
example and an independent Snyder series; the single OS Helmert
carries the documented ~2 m datum-model residual vs PROJ's OSTN15
grid), EPSG:2154 (RGF93 / Lambert-93), EPSG:3942-3950 (RGF93 CC
zones), EPSG:3035 (ETRS89-extended LAEA Europe, the INSPIRE
statistical-grid CRS, via an ellipsoidal authalic-latitude LAEA
kernel), EPSG:3006 (SWEREF99 TM), EPSG:2180 (Poland CS92),
EPSG:2193 (NZTM2000), EPSG:31466-31469 (DHDN Gauss-Krüger zones
2-5 on Bessel 1841 behind the BKG nationwide Helmert, ~1-2 m datum
residual vs PROJ's NTv2 grid), EPSG:28992 (Amersfoort / RD New via
the EPSG 9809 oblique stereographic — kernel reproduces the EPSG
Guidance Note 7-2 worked example to <1 mm; inverted Amersfoort
Helmert, ~0.5-1 m vs RDNAPTRANS), and EPSG:2056/21781 (Swiss LV95 /
LV03 via the Rosenmund oblique Mercator — end-to-end round-trips
swisstopo's published approximate inverse polynomials within their
~1 m accuracy), each pinned by golden-style units in
tests/test_epsg_dispatch.py. Any other pair raises ValueError rather
than silently approximating (wkt.project_wkt).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TSTZSPAN_SQL = (
    "STRUCT<lower:TIMESTAMP, upper:TIMESTAMP, "
    "lower_inc:BOOLEAN, upper_inc:BOOLEAN>"
)
_SEQ = (
    "STRUCT<lower_inc:BOOLEAN, upper_inc:BOOLEAN, "
    "instants:ARRAY<STRUCT<t:TIMESTAMP, v:{v}>>>"
)
TGEOMPOINT_SQL = (
    "STRUCT<subtype:TINYINT, interp:TINYINT, seqs:ARRAY<"
    + _SEQ.format(v="STRUCT<x:DOUBLE, y:DOUBLE>")
    + ">>"
)
TFLOAT_SQL = (
    "STRUCT<subtype:TINYINT, interp:TINYINT, seqs:ARRAY<"
    + _SEQ.format(v="DOUBLE")
    + ">>"
)
STBOX_SQL = (
    "STRUCT<xmin:DOUBLE, ymin:DOUBLE, xmax:DOUBLE, ymax:DOUBLE, "
    "tmin:TIMESTAMP, tmax:TIMESTAMP, srid:INT, hasx:BOOLEAN, hast:BOOLEAN>"
)

# (name, arg signature, return type, body) — bodies are pure SQL
# expressions over the struct encodings; every one inlines into the plan.
_FUNCTIONS: list[tuple[str, str, str, str]] = [
    # ---------------------------------------------------- constructors
    (
        "tstzspan",
        "lo TIMESTAMP, hi TIMESTAMP",
        TSTZSPAN_SQL,
        "named_struct('lower', lo, 'upper', hi, "
        "'lower_inc', true, 'upper_inc', false)",
    ),
    (
        "stbox_xy",
        "x0 DOUBLE, y0 DOUBLE, x1 DOUBLE, y1 DOUBLE",
        STBOX_SQL,
        "named_struct('xmin', x0, 'ymin', y0, 'xmax', x1, 'ymax', y1, "
        "'tmin', CAST(NULL AS TIMESTAMP), 'tmax', CAST(NULL AS TIMESTAMP), "
        "'srid', 0, 'hasx', true, 'hast', false)",
    ),
    # ------------------------------------------------------ predicates
    # && / @> as named functions — the reference registers them the same
    # way (SURVEY §2.7, src/geo/tgeompoint.cpp:313-345)
    (
        "span_overlaps",
        f"a {TSTZSPAN_SQL}, b {TSTZSPAN_SQL}",
        "BOOLEAN",
        "(a.lower < b.upper OR (a.lower = b.upper AND a.lower_inc AND b.upper_inc))"
        " AND "
        "(b.lower < a.upper OR (b.lower = a.upper AND b.lower_inc AND a.upper_inc))",
    ),
    (
        "span_contains_ts",
        f"s {TSTZSPAN_SQL}, ts TIMESTAMP",
        "BOOLEAN",
        "(ts > s.lower OR (ts = s.lower AND s.lower_inc)) AND "
        "(ts < s.upper OR (ts = s.upper AND s.upper_inc))",
    ),
    (
        "stbox_overlaps",
        f"a {STBOX_SQL}, b {STBOX_SQL}",
        "BOOLEAN",
        "(NOT a.hasx OR NOT b.hasx OR "
        " (a.xmin <= b.xmax AND b.xmin <= a.xmax AND"
        "  a.ymin <= b.ymax AND b.ymin <= a.ymax)) AND "
        "(NOT a.hast OR NOT b.hast OR "
        " (a.tmin <= b.tmax AND b.tmin <= a.tmax))",
    ),
    (
        "area",
        f"b {STBOX_SQL}",
        "DOUBLE",
        "CASE WHEN b.hasx THEN (b.xmax - b.xmin) * (b.ymax - b.ymin) END",
    ),
    (
        "expandSpace",
        f"b {STBOX_SQL}, d DOUBLE",
        STBOX_SQL,
        "named_struct('xmin', b.xmin - d, 'ymin', b.ymin - d, "
        "'xmax', b.xmax + d, 'ymax', b.ymax + d, "
        "'tmin', b.tmin, 'tmax', b.tmax, 'srid', b.srid, "
        "'hasx', b.hasx, 'hast', b.hast)",
    ),
    # ---------------------------------------- tgeompoint accessors
    (
        "startTimestamp",
        f"t {TGEOMPOINT_SQL}",
        "TIMESTAMP",
        "t.seqs[0].instants[0].t",
    ),
    (
        "endTimestamp",
        f"t {TGEOMPOINT_SQL}",
        "TIMESTAMP",
        "element_at(element_at(t.seqs, -1).instants, -1).t",
    ),
    (
        "numInstants",
        f"t {TGEOMPOINT_SQL}",
        "INT",
        "aggregate(t.seqs, 0, (acc, s) -> acc + size(s.instants))",
    ),
    (
        "timeSpan",
        f"t {TGEOMPOINT_SQL}",
        TSTZSPAN_SQL,
        "named_struct("
        "'lower', t.seqs[0].instants[0].t, "
        "'upper', element_at(element_at(t.seqs, -1).instants, -1).t, "
        "'lower_inc', t.seqs[0].lower_inc, "
        "'upper_inc', element_at(t.seqs, -1).upper_inc)",
    ),
    (
        "stbox",
        f"t {TGEOMPOINT_SQL}",
        STBOX_SQL,
        "named_struct("
        "'xmin', array_min(flatten(transform(t.seqs, s -> transform(s.instants, i -> i.v.x)))), "
        "'ymin', array_min(flatten(transform(t.seqs, s -> transform(s.instants, i -> i.v.y)))), "
        "'xmax', array_max(flatten(transform(t.seqs, s -> transform(s.instants, i -> i.v.x)))), "
        "'ymax', array_max(flatten(transform(t.seqs, s -> transform(s.instants, i -> i.v.y)))), "
        "'tmin', t.seqs[0].instants[0].t, "
        "'tmax', element_at(element_at(t.seqs, -1).instants, -1).t, "
        "'srid', 0, 'hasx', true, 'hast', true)",
    ),
    # `length` itself is a Spark string builtin and temporary functions
    # cannot shadow builtins — the trajectory length carries the type
    # suffix instead
    (
        "length_tpoint",
        f"t {TGEOMPOINT_SQL}",
        "DOUBLE",
        "aggregate(t.seqs, 0D, (acc, s) -> acc + CASE WHEN size(s.instants) < 2 THEN 0D ELSE "
        "aggregate(zip_with("
        "  slice(s.instants, 1, size(s.instants) - 1), "
        "  slice(s.instants, 2, size(s.instants) - 1), "
        "  (p, q) -> sqrt((q.v.x - p.v.x) * (q.v.x - p.v.x) + "
        "                 (q.v.y - p.v.y) * (q.v.y - p.v.y))), "
        "0D, (a2, x) -> a2 + x) END)",
    ),
    # ---------------------------------------- restriction composite
    # duration(atTime(t, p)) for continuous sequences: the time clip is
    # per-sequence interval intersection, so the duration is additive —
    # the same closed form clip_duration_us uses for the box case
    (
        "atTime_duration_us",
        f"t {TGEOMPOINT_SQL}, p {TSTZSPAN_SQL}",
        "BIGINT",
        "aggregate(t.seqs, 0L, (acc, s) -> acc + greatest(0L, "
        "least(unix_micros(element_at(s.instants, -1).t), unix_micros(p.upper)) - "
        "greatest(unix_micros(s.instants[0].t), unix_micros(p.lower))))",
    ),
    # ---------------------------------------- tfloat accessors
    (
        "minValue_tfloat",
        f"t {TFLOAT_SQL}",
        "DOUBLE",
        "array_min(flatten(transform(t.seqs, s -> transform(s.instants, i -> i.v))))",
    ),
    (
        "maxValue_tfloat",
        f"t {TFLOAT_SQL}",
        "DOUBLE",
        "array_max(flatten(transform(t.seqs, s -> transform(s.instants, i -> i.v))))",
    ),
    (
        "numInstants_tfloat",
        f"t {TFLOAT_SQL}",
        "INT",
        "aggregate(t.seqs, 0, (acc, s) -> acc + size(s.instants))",
    ),
    # ------------------------------------------------------ span accessors
    (
        "duration_us",
        f"s {TSTZSPAN_SQL}",
        "BIGINT",
        "unix_micros(s.upper) - unix_micros(s.lower)",
    ),
    # -------------------------------------- text-pipeline family
    # (operators/text.py expressed as SQL — same bodies, same results)
    (
        "tokens",
        "txt STRING",
        "ARRAY<STRING>",
        r"split(lower(trim(txt)), '\\s+')",
    ),
    (
        "doc_token_count",
        "txt STRING",
        "INT",
        r"size(split(lower(trim(txt)), '\\s+'))",
    ),
    (
        "doc_fingerprint",
        "txt STRING",
        "STRING",
        r"md5(regexp_replace(lower(trim(txt)), '\\s+', ' '))",
    ),
    (
        "alpha_ratio",
        "txt STRING",
        "DOUBLE",
        "CASE WHEN length(txt) > 0 THEN "
        "CAST(length(regexp_replace(txt, '[^A-Za-z ]', '')) AS DOUBLE)"
        " / length(txt) ELSE 0D END",
    ),
    (
        "split_bucket",
        "key BIGINT, salt STRING",
        "DOUBLE",
        "CAST(conv(substring(md5(concat_ws('-', CAST(key AS STRING), salt)),"
        " 1, 8), 16, 10) AS BIGINT) / 4294967296D",
    ),
    (
        "split_assign",
        "key BIGINT, train DOUBLE, val DOUBLE, salt STRING",
        "STRING",
        "CASE WHEN split_bucket(key, salt) < train THEN 'train' "
        "WHEN split_bucket(key, salt) < train + val THEN 'val' "
        "ELSE 'test' END",
    ),
]


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the temporal SQL function family as session-scoped SQL
    UDFs. Idempotent (CREATE OR REPLACE). Returns the function names."""
    names = []
    for name, args, ret, body in _FUNCTIONS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names

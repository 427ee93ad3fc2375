"""Type system: transparent Spark struct encodings for MobilityDB-style types.

Reference (mobilityduck) represents every value as an opaque MEOS-serialized
BLOB (see /root/reference/src/temporal/temporal_functions.cpp:69-76). We
instead encode each type as a plain Spark SQL struct so Catalyst can see
inside (predicate pushdown, column pruning, codegen) — SURVEY.md §1.4.

Encodings
---------
temporal<base>      STRUCT<subtype: TINYINT, interp: TINYINT,
                           seqs: ARRAY<STRUCT<lower_inc: BOOLEAN,
                                              upper_inc: BOOLEAN,
                                              instants: ARRAY<STRUCT<t: TIMESTAMP,
                                                                     v: base>>>>>
  - Instant      = subtype 1, one seq with one instant
  - Sequence     = subtype 2, one seq (Discrete sequences use interp=1)
  - SequenceSet  = subtype 3, n seqs (disjoint, time-ordered)
  Instant struct puts `t` first so lexicographic array_sort orders by time.

span<base>          STRUCT<lower: base, upper: base,
                           lower_inc: BOOLEAN, upper_inc: BOOLEAN>
spanset<base>       ARRAY<span<base>>  (normalized: sorted, disjoint, merged)
set<base>           ARRAY<base>        (sorted, distinct)
tbox                STRUCT<xmin,xmax: DOUBLE, xmin_inc,xmax_inc: BOOLEAN,
                           tmin,tmax: TIMESTAMP, tmin_inc,tmax_inc: BOOLEAN>
stbox               STRUCT<xmin,ymin,xmax,ymax: DOUBLE,
                           tmin,tmax: TIMESTAMP, srid: INT,
                           hasx,hast: BOOLEAN>
geompoint (base of tgeompoint)  STRUCT<x: DOUBLE, y: DOUBLE>
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- subtypes
# tempSubtype values (reference: src/temporal/temporal_functions.cpp:371-396)
SUBTYPE_INSTANT = 1
SUBTYPE_SEQUENCE = 2
SUBTYPE_SEQUENCESET = 3

SUBTYPE_NAMES = {1: "Instant", 2: "Sequence", 3: "SequenceSet"}

# interp values (reference: src/temporal/temporal_functions.cpp:398-422)
INTERP_NONE = 0
INTERP_DISCRETE = 1
INTERP_STEP = 2
INTERP_LINEAR = 3

INTERP_NAMES = {0: "None", 1: "Discrete", 2: "Step", 3: "Linear"}
INTERP_IDS = {v.lower(): k for k, v in INTERP_NAMES.items()}


# ---------------------------------------------------------------- schemas
def instant_type(base: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("t", T.TimestampType(), False),
            T.StructField("v", base, True),
        ]
    )


def sequence_type(base: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("lower_inc", T.BooleanType(), False),
            T.StructField("upper_inc", T.BooleanType(), False),
            T.StructField("instants", T.ArrayType(instant_type(base)), False),
        ]
    )


def temporal_type(base: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("subtype", T.ByteType(), False),
            T.StructField("interp", T.ByteType(), False),
            T.StructField("seqs", T.ArrayType(sequence_type(base)), False),
        ]
    )


def span_type(base: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("lower", base, True),
            T.StructField("upper", base, True),
            T.StructField("lower_inc", T.BooleanType(), False),
            T.StructField("upper_inc", T.BooleanType(), False),
        ]
    )


def spanset_type(base: T.DataType) -> T.ArrayType:
    return T.ArrayType(span_type(base))


def set_type(base: T.DataType) -> T.ArrayType:
    return T.ArrayType(base)


POINT_TYPE = T.StructType(
    [
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
    ]
)

# Concrete temporal types mirroring the reference's TINT/TBOOL/TFLOAT/TTEXT/
# TGEOMPOINT registrations (src/temporal/temporal.cpp:18-37,
# src/geo/tgeompoint.cpp:18-31)
TINT_TYPE = temporal_type(T.LongType())
TBOOL_TYPE = temporal_type(T.BooleanType())
TFLOAT_TYPE = temporal_type(T.DoubleType())
TTEXT_TYPE = temporal_type(T.StringType())
TGEOMPOINT_TYPE = temporal_type(POINT_TYPE)

TSTZSPAN_TYPE = span_type(T.TimestampType())
INTSPAN_TYPE = span_type(T.LongType())
FLOATSPAN_TYPE = span_type(T.DoubleType())

TBOX_TYPE = T.StructType(
    [
        T.StructField("xmin", T.DoubleType(), True),
        T.StructField("xmax", T.DoubleType(), True),
        T.StructField("xmin_inc", T.BooleanType(), True),
        T.StructField("xmax_inc", T.BooleanType(), True),
        T.StructField("tmin", T.TimestampType(), True),
        T.StructField("tmax", T.TimestampType(), True),
        T.StructField("tmin_inc", T.BooleanType(), True),
        T.StructField("tmax_inc", T.BooleanType(), True),
    ]
)

STBOX_TYPE = T.StructType(
    [
        T.StructField("xmin", T.DoubleType(), True),
        T.StructField("ymin", T.DoubleType(), True),
        T.StructField("xmax", T.DoubleType(), True),
        T.StructField("ymax", T.DoubleType(), True),
        T.StructField("tmin", T.TimestampType(), True),
        T.StructField("tmax", T.TimestampType(), True),
        T.StructField("srid", T.IntegerType(), True),
        T.StructField("hasx", T.BooleanType(), True),
        T.StructField("hast", T.BooleanType(), True),
    ]
)

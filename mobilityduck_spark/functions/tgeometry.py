"""TGEOMETRY — temporal values over arbitrary geometries
(src/geo/tgeometry.cpp:1095-1276). The value payload is normalized WKT
text (the engine's geometry carrier for non-point geometries; points
use the struct form in functions/tpoint.py); the temporal structure is
the shared struct of functions/temporal.py, so every generic accessor /
transformation (numInstants, startInstant, setInterp, merge, atTime,
...) applies unchanged.

Promoted out of the goldens translator so the golden-verified surface
is callable package API.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..wkt import normalize_wkt
from . import temporal as TT


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def tgeometry_inst(wkt_text: str, ts) -> Column:
    """TGEOMETRY instant: geometry@timestamp
    (tgeometry.cpp Tgeometry_constructor, instant form). The WKT is
    normalized (MEOS canonical spacing) at plan-build time."""
    return TT.tinstant(F.lit(normalize_wkt(wkt_text)), _c(ts))


def tgeometry_const_seq(wkt_text: str, sp, interp: str = "step") -> Column:
    """TGEOMETRY sequence holding one constant geometry over a span —
    the reference's tgeometry(geo, tstzspan) overload
    (tgeometry.cpp:1149-1170): a two-instant sequence carrying the
    span's bound flags."""
    sp = _c(sp)
    w = F.lit(normalize_wkt(wkt_text))
    inst = F.array(
        F.struct(sp["lower"].alias("t"), w.alias("v")),
        F.struct(sp["upper"].alias("t"), w.alias("v")),
    )
    return TT.tsequence(
        inst,
        interp=interp,
        lower_inc=sp["lower_inc"],
        upper_inc=sp["upper_inc"],
    )


def tgeometry_seq(instants, interp: str = "step",
                  lower_inc=True, upper_inc=True) -> Column:
    """tgeometrySeq(ARRAY of TGEOMETRY instants[, interp[, bounds]]) —
    tgeometry.cpp:1178-1214. `instants` is an array of temporal structs
    (each an Instant); their single (t, v) pairs form the sequence."""
    inst = F.transform(_c(instants), lambda t: t["seqs"][0]["instants"][0])
    li = lower_inc if isinstance(lower_inc, Column) else F.lit(lower_inc)
    ui = upper_inc if isinstance(upper_inc, Column) else F.lit(upper_inc)
    return TT.tsequence(inst, interp=interp, lower_inc=li, upper_inc=ui)


def tgeometry_to_seq(t) -> Column:
    """tgeometrySeq(TGEOMETRY) — retag an instant/sequence temporal as a
    Sequence (tgeometry.cpp Tsequence_from_base)."""
    return TT.to_sequence(_c(t), None)


def tgeometry_inst_of(t) -> Column:
    """tgeometryInst(TGEOMETRY) — the value as an Instant (errors in
    MEOS for multi-instant input; here: the start instant, matching the
    golden corpus usage)."""
    return TT.start_instant(_c(t))


def tgeometry_seqset(seqs_or_temporals) -> Column:
    """tgeometrySeqSet(ARRAY of TGEOMETRY sequences) —
    tgeometry.cpp:1216-1246: assemble a SequenceSet from the inputs'
    sequences (step interpolation, the continuous default for
    geometries)."""
    col = _c(seqs_or_temporals)
    seqs = F.flatten(F.transform(col, lambda t: t["seqs"]))
    return TT.tsequenceset(seqs, interp="step")


def tgeometry_seqset_of(t) -> Column:
    """tgeometrySeqSet(TGEOMETRY) — retag as SequenceSet."""
    tc = _c(t)
    return TT._temporal_struct(F.lit(3), tc["interp"], tc["seqs"])

"""Temporal types (TINT/TBOOL/TFLOAT/TTEXT and generically any base):
constructors, accessors, restrictions, transformations.

Reference: src/temporal/temporal.cpp (registrations) +
src/temporal/temporal_functions.cpp (implementations over MEOS).
Encoding per SURVEY.md §1.4: STRUCT<subtype, interp, seqs: ARRAY<STRUCT<
lower_inc, upper_inc, instants: ARRAY<STRUCT<t, v>>>>>.

Everything is a pure Column expression (higher-order functions over the
nested arrays) — JVM-side, codegen'd, no Python in the row path. Linear
interpolation is closed-form on unix microseconds, so even `atTime` /
`valueAtTimestamp` on Linear interp stay expression-only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..types import (
    INTERP_DISCRETE,
    INTERP_IDS,
    INTERP_LINEAR,
    INTERP_NONE,
    INTERP_STEP,
    SUBTYPE_INSTANT,
    SUBTYPE_SEQUENCE,
    SUBTYPE_SEQUENCESET,
)
from .span import _c, span
from .span import spanset as _spanset_normalize


def _interp_id(interp) -> Column:
    if isinstance(interp, str):
        return F.lit(INTERP_IDS[interp.lower()]).cast("tinyint")
    return _c(interp).cast("tinyint")


def _seq_struct(lower_inc, upper_inc, instants) -> Column:
    return F.struct(
        _c(lower_inc).alias("lower_inc"),
        _c(upper_inc).alias("upper_inc"),
        _c(instants).alias("instants"),
    )


def _temporal_struct(subtype, interp, seqs) -> Column:
    return F.struct(
        _c(subtype).cast("tinyint").alias("subtype"),
        _c(interp).cast("tinyint").alias("interp"),
        _c(seqs).alias("seqs"),
    )


def _instant_struct(t, v) -> Column:
    return F.struct(_c(t).alias("t"), _c(v).alias("v"))


def _dedup_by_t(sorted_instants: Column) -> Column:
    """Keep the last instant per timestamp (constructor contract: MEOS
    tsequence_make rejects duplicate timestamps; we resolve keep-last so
    raw event feeds can be assembled without a pre-dedup shuffle).

    PERF: never index the outer array inside a per-element lambda — the
    interpreter re-evaluates the whole (sort) subtree per element, turning
    assembly O(n² log n). zip_with against the 1-shifted slice keeps each
    subtree evaluated once per row (zip_with null-pads the shorter side,
    so the final element's `nxt` is NULL → kept)."""
    arr = sorted_instants
    shifted = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    flagged = F.zip_with(
        arr,
        shifted,
        lambda x, nxt: F.struct(
            x.alias("i"), (nxt.isNull() | (nxt["t"] != x["t"])).alias("keep")
        ),
    )
    return F.transform(F.filter(flagged, lambda p: p["keep"]), lambda p: p["i"])


# ============================================================ constructors
def tinstant(v, t) -> Column:
    """tint(v, ts) etc. — src/temporal/temporal.cpp:78-86."""
    seq = _seq_struct(F.lit(True), F.lit(True), F.array(_instant_struct(t, v)))
    return _temporal_struct(F.lit(SUBTYPE_INSTANT), F.lit(INTERP_NONE), F.array(seq))


def tsequence(instants, interp="step", lower_inc=True, upper_inc=True) -> Column:
    """tintSeq(list[, interp[, lower_inc[, upper_inc]]]) —
    src/temporal/temporal.cpp:220-258 (MEOS tsequence_make).

    `instants` is ARRAY<STRUCT<t, v>> (e.g. collect_list(struct(ts, val))).
    Sorted by time, deduped keep-last; discrete interp forces closed bounds.
    """
    iid = _interp_id(interp)
    arr = _dedup_by_t(F.array_sort(_c(instants)))
    is_disc = iid == F.lit(INTERP_DISCRETE)
    li = F.when(is_disc, F.lit(True)).otherwise(_c(lower_inc))
    ui = F.when(is_disc, F.lit(True)).otherwise(_c(upper_inc))
    # single-instant sequences are closed-closed by definition
    one = F.size(arr) == 1
    seq = _seq_struct(li | one, ui | one, arr)
    return _temporal_struct(F.lit(SUBTYPE_SEQUENCE), iid, F.array(seq))


def tdiscseq(instants) -> Column:
    """Discrete sequence `{v1@t1, v2@t2}` constructor."""
    return tsequence(instants, interp="discrete")


def assemble_tsequence(
    df,
    raw_col: str,
    out_col: str = "tf",
    interp: str = "step",
    lower_inc=True,
    upper_inc=True,
):
    """DataFrame-level tsequence assembly: same semantics as
    `agg(tsequence(collect_list(...)))` but STAGED across projections.

    PERF: composed as one expression inside an aggregate, the seq struct
    references the array_sort/dedup subtree up to 6× (dedup's zip_with /
    slice / size each re-inline the sort; the `one`-instant bound fix and
    the instants field each re-inline the dedup) — and aggregate result
    expressions get neither codegen CSE (lambdas block codegen) nor
    interpreted-mode reuse, so assembly cost multiplies by ~6. Splitting
    sort → dedup → struct into separate Projects turns every reuse into a
    cheap attribute reference; Catalyst's CollapseProject will NOT merge
    the stages back because the intermediates are non-cheap expressions
    referenced more than once. Measured 2.6→0.9 s on the sf0.1 tfloat
    assembly.

    `df` must contain `raw_col` = ARRAY<STRUCT<t, v>> (one row per
    temporal, e.g. the output of groupBy().agg(collect_list(...)));
    every other column passes through.
    """
    keep = [c for c in df.columns if c != raw_col]
    iid = _interp_id(interp)
    d1 = df.select(*keep, F.array_sort(F.col(raw_col)).alias("_srt"))
    d2 = d1.select(*keep, _dedup_by_t(F.col("_srt")).alias("_ins"))
    arr = F.col("_ins")
    is_disc = iid == F.lit(INTERP_DISCRETE)
    li = F.when(is_disc, F.lit(True)).otherwise(_c(lower_inc))
    ui = F.when(is_disc, F.lit(True)).otherwise(_c(upper_inc))
    one = F.size(arr) == 1
    seq = _seq_struct(li | one, ui | one, arr)
    return d2.select(
        *keep,
        _temporal_struct(F.lit(SUBTYPE_SEQUENCE), iid, F.array(seq)).alias(
            out_col
        ),
    )


def tsequenceset(seqs, interp="step") -> Column:
    """tintSeqSet(list) — src/temporal/temporal.cpp:280-298.

    `seqs` is an array of sequence structs; sorted by start time.
    """
    arr = F.array_sort(
        F.filter(_c(seqs), lambda s: s.isNotNull() & (F.size(s["instants"]) > 0)),
        lambda a, b: F.when(
            a["instants"][0]["t"] < b["instants"][0]["t"], F.lit(-1)
        )
        .when(a["instants"][0]["t"] > b["instants"][0]["t"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return _temporal_struct(F.lit(SUBTYPE_SEQUENCESET), _interp_id(interp), arr)


def from_instants(instants, interp="step", max_gap_secs=None) -> Column:
    """Assemble a temporal from raw (t, v) pairs; when `max_gap_secs` is
    given, split into a SequenceSet at gaps larger than the threshold
    (trajectory assembly semantics of BerlinMOD 07_trips.sql)."""
    if max_gap_secs is None:
        return tsequence(instants, interp=interp)
    arr = _dedup_by_t(F.array_sort(_c(instants)))
    gap = F.lit(int(max_gap_secs) * 1_000_000)
    # typed empty ARRAY<sequence> (slice of length 0 keeps the type)
    empty = F.slice(F.array(_seq_struct(F.lit(True), F.lit(True), arr)), 1, 0)

    # single fold over the instants: append to the open sequence, or open
    # a new one at a gap. Only lambda variables are referenced inside the
    # lambda (see _dedup_by_t PERF note).
    def step(acc: Column, x: Column) -> Column:
        last = F.try_element_at(acc, F.lit(-1))
        last_t = F.try_element_at(last["instants"], F.lit(-1))["t"]
        gap_exceeded = (F.unix_micros(x["t"]) - F.unix_micros(last_t)) > gap
        new_seq = _seq_struct(F.lit(True), F.lit(True), F.array(x))
        appended = _seq_struct(
            last["lower_inc"],
            last["upper_inc"],
            F.concat(last["instants"], F.array(x)),
        )
        return (
            F.when(F.size(acc) == 0, F.array(new_seq))
            .when(gap_exceeded, F.concat(acc, F.array(new_seq)))
            .otherwise(
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(appended))
            )
        )

    seqs = F.aggregate(arr, empty, step)
    subtype = F.when(F.size(seqs) == 1, F.lit(SUBTYPE_SEQUENCE)).otherwise(
        F.lit(SUBTYPE_SEQUENCESET)
    )
    return _temporal_struct(subtype, _interp_id(interp), seqs)


# ============================================================ accessors
def instants(t) -> Column:
    """All instants, time-ordered (flattened across sequences)."""
    return F.flatten(_c(t)["seqs"]["instants"])


def values(t) -> Column:
    return F.transform(instants(t), lambda i: i["v"])


def num_instants(t) -> Column:
    return F.size(instants(t))


def num_sequences(t) -> Column:
    return F.size(_c(t)["seqs"])


def temp_subtype(t) -> Column:
    """tempSubtype — src/temporal/temporal.cpp:88-96; golden
    test/sql/tint.test:44-56."""
    st = _c(t)["subtype"]
    return (
        F.when(st == SUBTYPE_INSTANT, F.lit("Instant"))
        .when(st == SUBTYPE_SEQUENCE, F.lit("Sequence"))
        .when(st == SUBTYPE_SEQUENCESET, F.lit("SequenceSet"))
    )


def interp(t) -> Column:
    """interp — src/temporal/temporal.cpp:98-106; golden tint.test:59-76."""
    i = _c(t)["interp"]
    return (
        F.when(i == INTERP_NONE, F.lit("None"))
        .when(i == INTERP_DISCRETE, F.lit("Discrete"))
        .when(i == INTERP_STEP, F.lit("Step"))
        .when(i == INTERP_LINEAR, F.lit("Linear"))
    )


def get_value(t) -> Column:
    """getValue — instant only (src/temporal/temporal.cpp:108-116)."""
    t = _c(t)
    return F.when(
        t["subtype"] == SUBTYPE_INSTANT, t["seqs"][0]["instants"][0]["v"]
    )


def get_timestamp(t) -> Column:
    t = _c(t)
    return F.when(
        t["subtype"] == SUBTYPE_INSTANT, t["seqs"][0]["instants"][0]["t"]
    )


def start_value(t) -> Column:
    """startValue — src/temporal/temporal.cpp:118-136."""
    return F.try_element_at(instants(t), F.lit(1))["v"]


def end_value(t) -> Column:
    return F.try_element_at(instants(t), F.lit(-1))["v"]


def min_value(t) -> Column:
    return F.array_min(values(t))


def max_value(t) -> Column:
    return F.array_max(values(t))


def min_instant(t) -> Column:
    """minInstant — instant with min value, earliest on ties
    (src/temporal/temporal.cpp:159-177)."""
    inst = instants(t)
    mn = F.array_min(F.transform(inst, lambda i: i["v"]))
    first = F.try_element_at(F.filter(inst, lambda i: i["v"] == mn), F.lit(1))
    return tinstant(first["v"], first["t"])


def max_instant(t) -> Column:
    inst = instants(t)
    mx = F.array_max(F.transform(inst, lambda i: i["v"]))
    first = F.try_element_at(F.filter(inst, lambda i: i["v"] == mx), F.lit(1))
    return tinstant(first["v"], first["t"])


def value_n(t, n) -> Column:
    """valueN(t, n) — value of the n-th instant in temporal order, NULL
    out-of-range (src/temporal/temporal.cpp:180-188; goldens
    tint.test:158-161 and valueN('{4@..,6@..,3@..}', 2) = 6)."""
    return F.try_element_at(values(t), _c(n).cast("int"))


def value_set(t) -> Column:
    """valueSet — distinct values as a set (temporal.cpp:310-350)."""
    return F.array_sort(F.array_distinct(values(t)))


def value_span(t, int_base=False) -> Column:
    """valueSpan — `[min, max]` hull; int bases canonicalize to
    `[min, max+1)` (golden tint.test:306-309)."""
    vals = values(t)
    lo, hi = F.array_min(vals), F.array_max(vals)
    if int_base:
        return span(lo, hi + 1, F.lit(True), F.lit(False))
    return span(lo, hi, F.lit(True), F.lit(True))


def start_timestamp(t) -> Column:
    return F.try_element_at(instants(t), F.lit(1))["t"]


def end_timestamp(t) -> Column:
    return F.try_element_at(instants(t), F.lit(-1))["t"]


def timestamp_n(t, n) -> Column:
    return F.try_element_at(instants(t), _c(n).cast("int"))["t"]


def time_span(t) -> Column:
    """timeSpan — `[start_ts, end_ts]` hull (temporal.cpp:300-308)."""
    tc = _c(t)
    return span(
        start_timestamp(tc),
        end_timestamp(tc),
        F.when(tc["interp"] == INTERP_DISCRETE, F.lit(True)).otherwise(
            tc["seqs"][0]["lower_inc"]
        ),
        F.when(tc["interp"] == INTERP_DISCRETE, F.lit(True)).otherwise(
            F.try_element_at(tc["seqs"], F.lit(-1))["upper_inc"]
        ),
    )


def get_time(t) -> Column:
    """getTime → tstzspanset (temporal.cpp:200-208). Discrete temporals
    yield singleton spans per instant."""
    tc = _c(t)
    disc = tc["interp"] == INTERP_DISCRETE
    spans_cont = F.transform(
        tc["seqs"],
        lambda s: span(
            s["instants"][0]["t"],
            F.try_element_at(s["instants"], F.lit(-1))["t"],
            s["lower_inc"],
            s["upper_inc"],
        ),
    )
    spans_disc = F.transform(
        instants(tc), lambda i: span(i["t"], i["t"], F.lit(True), F.lit(True))
    )
    return _spanset_normalize(F.when(disc, spans_disc).otherwise(spans_cont))


def duration_secs(t, boundspan=False) -> Column:
    """duration(t[, boundspan]) in fractional seconds
    (temporal.cpp:210-218, impl temporal_functions.cpp:746-772).

    boundspan=True → end_ts - start_ts (golden: discrete seq duration
    with boundspan = 2 days, tint.test:223-226); else Σ per-sequence
    extents (0 for instant/discrete)."""
    tc = _c(t)
    if boundspan:
        return (
            F.unix_micros(end_timestamp(tc)) - F.unix_micros(start_timestamp(tc))
        ) / F.lit(1_000_000.0)
    per_seq = F.transform(
        tc["seqs"],
        lambda s: (
            F.unix_micros(F.try_element_at(s["instants"], F.lit(-1))["t"])
            - F.unix_micros(s["instants"][0]["t"])
        )
        / F.lit(1_000_000.0),
    )
    cont = F.aggregate(per_seq, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(
        (tc["interp"] == INTERP_DISCRETE) | (tc["subtype"] == SUBTYPE_INSTANT),
        F.lit(0.0),
    ).otherwise(cont)


def duration_us(t, boundspan=False) -> Column:
    """duration in exact microseconds (BIGINT) — oracle-friendly variant
    of duration_secs."""
    tc = _c(t)
    if boundspan:
        return F.unix_micros(end_timestamp(tc)) - F.unix_micros(start_timestamp(tc))
    per_seq = F.transform(
        tc["seqs"],
        lambda s: F.unix_micros(F.try_element_at(s["instants"], F.lit(-1))["t"])
        - F.unix_micros(s["instants"][0]["t"]),
    )
    cont = F.aggregate(per_seq, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(
        (tc["interp"] == INTERP_DISCRETE) | (tc["subtype"] == SUBTYPE_INSTANT),
        F.lit(0).cast("long"),
    ).otherwise(cont)


def sequences(t) -> Column:
    """sequences(t) → LIST of single-sequence temporals
    (temporal.cpp:352-360)."""
    tc = _c(t)
    return F.transform(
        tc["seqs"],
        lambda s: _temporal_struct(F.lit(SUBTYPE_SEQUENCE), tc["interp"], F.array(s)),
    )


def instant_n(t, n) -> Column:
    """instantN(t, n) — 1-based, NULL out-of-range."""
    i = F.try_element_at(instants(t), _c(n).cast("int"))
    return F.when(i.isNotNull(), tinstant(i["v"], i["t"]))


def start_instant(t) -> Column:
    return instant_n(t, F.lit(1))


def end_instant(t) -> Column:
    return instant_n(t, F.lit(-1))


# ============================================================ transforms
def _map_instants(t, fn) -> Column:
    tc = _c(t)
    return _temporal_struct(
        tc["subtype"],
        tc["interp"],
        F.transform(
            tc["seqs"],
            lambda s: _seq_struct(
                s["lower_inc"], s["upper_inc"], F.transform(s["instants"], fn)
            ),
        ),
    )


def shift_time(t, delta) -> Column:
    """shiftTime(t, interval) — delta may be a Column interval or literal."""
    return _map_instants(t, lambda i: _instant_struct(i["t"] + _c(delta), i["v"]))


def shift_value(t, delta) -> Column:
    """shiftValue — temporal.cpp:392-422 (tnumber_shift_scale_value)."""
    return _map_instants(t, lambda i: _instant_struct(i["t"], i["v"] + _c(delta)))


def scale_value(t, width_new, int_base=False) -> Column:
    """scaleValue — rescale value extent to width_new keeping min.

    int_base=True keeps LONG values (MEOS tint arithmetic stays integral;
    the rescale formula otherwise promotes to DOUBLE)."""
    tc = _c(t)
    lo, hi = min_value(tc), max_value(tc)
    w = hi - lo
    cast_to = "long" if int_base else None

    def scaled(i):
        out = F.when(w == 0, i["v"]).otherwise(
            lo + (i["v"] - lo) * _c(width_new) / w
        )
        return out.cast(cast_to) if cast_to else out

    return _map_instants(tc, lambda i: _instant_struct(i["t"], scaled(i)))


def shift_scale_value(t, shift, width_new, int_base=False) -> Column:
    """shiftScaleValue(t, shift, width) — golden tint.test:371-374
    (degenerate single-value: v+shift)."""
    return shift_value(scale_value(t, width_new, int_base=int_base), shift)


def set_interp(t, interp) -> Column:
    """setInterp — re-tag (src/geo/tgeometry.cpp:1173-1179)."""
    tc = _c(t)
    return _temporal_struct(tc["subtype"], _interp_id(interp), tc["seqs"])


def to_sequence(t, interp=None) -> Column:
    """tintSeq(T) convert — temporal.cpp:260-278: single-sequence view."""
    tc = _c(t)
    iid = tc["interp"] if interp is None else _interp_id(interp)
    return _temporal_struct(F.lit(SUBTYPE_SEQUENCE), iid, tc["seqs"])


def merge(a, b) -> Column:
    """merge(a, b) — temporal_merge (src/geo/tgeometry.cpp:1182-1188):
    concat sequences, re-sort, keep interp of `a`."""
    a, b = _c(a), _c(b)
    return tsequenceset(F.concat(a["seqs"], b["seqs"]), interp=a["interp"])


# ============================================================ value-at / restriction
def _value_at_in_seq(
    seq: Column, ts, interp_col: Column, continuous: bool, point: bool = False
) -> Column:
    """Value of one sequence at timestamp ts (assumes ts within bounds).

    Step/discrete: value of last instant with t <= ts.
    Linear: closed-form interpolation on unix micros.

    `continuous=False` drops the linear branch at plan-build time so
    discrete bases (int/bool/text) keep their exact Spark type — the
    linear formula would otherwise promote the CASE result to DOUBLE.
    `point=True` interpolates STRUCT<x, y> bases component-wise.
    """
    ts = _c(ts)
    inst = seq["instants"]
    before = F.try_element_at(F.filter(inst, lambda i: i["t"] <= ts), F.lit(-1))
    if not continuous:
        return before["v"]
    after = F.try_element_at(F.filter(inst, lambda i: i["t"] >= ts), F.lit(1))
    frac = (F.unix_micros(ts) - F.unix_micros(before["t"])) / (
        F.unix_micros(after["t"]) - F.unix_micros(before["t"])
    )
    if point:
        interp_v = F.struct(
            (before["v"]["x"] + (after["v"]["x"] - before["v"]["x"]) * frac).alias("x"),
            (before["v"]["y"] + (after["v"]["y"] - before["v"]["y"]) * frac).alias("y"),
        )
    else:
        interp_v = before["v"] + (after["v"] - before["v"]) * frac
    linear = F.when(before["t"] == after["t"], before["v"]).otherwise(interp_v)
    return F.when(interp_col == INTERP_LINEAR, linear).otherwise(before["v"])


def value_at_timestamp(t, ts, continuous=True) -> Column:
    """valueAtTimestamp(t, ts) — NULL if t is not defined at ts.

    Reference impl for points: src/geo/tgeompoint_functions.cpp:407-458;
    generic restriction semantics from MEOS temporal_value_at_timestamptz.
    Pass continuous=False for int/bool/text bases to keep the exact type.
    """
    tc, ts = _c(t), _c(ts)
    disc = tc["interp"] == INTERP_DISCRETE

    def covers(s: Column) -> Column:
        first_t = s["instants"][0]["t"]
        last_t = F.try_element_at(s["instants"], F.lit(-1))["t"]
        lo_ok = F.when(s["lower_inc"] | disc, ts >= first_t).otherwise(ts > first_t)
        hi_ok = F.when(s["upper_inc"] | disc, ts <= last_t).otherwise(ts < last_t)
        return lo_ok & hi_ok

    seq = F.try_element_at(F.filter(tc["seqs"], covers), F.lit(1))
    at_exact = F.try_element_at(
        F.filter(F.flatten(tc["seqs"]["instants"]), lambda i: i["t"] == ts), F.lit(1)
    )["v"]
    return F.when(seq.isNull(), F.lit(None)).otherwise(
        F.when(disc, at_exact).otherwise(
            _value_at_in_seq(seq, ts, tc["interp"], continuous)
        )
    )


def at_time(t, s, continuous=True, point=False) -> Column:
    """atTime(T, TSTZSPAN) — clip to a time span, interpolating boundary
    instants (temporal.cpp:372-380, impl temporal_functions.cpp:1069-1118;
    golden tint.test:351-354). NULL when the restriction is empty.
    Pass continuous=False for int/bool/text bases to keep the exact type;
    point=True for TGEOMPOINT (component-wise interpolation)."""
    tc, sp = _c(t), _c(s)
    interp_col = tc["interp"]
    disc = interp_col == INTERP_DISCRETE

    def clip(seq: Column) -> Column:
        inst = seq["instants"]
        first_t = inst[0]["t"]
        last_t = F.try_element_at(inst, F.lit(-1))["t"]
        lo = F.greatest(sp["lower"], first_t)
        hi = F.least(sp["upper"], last_t)
        lo_inc = (
            F.when(sp["lower"] > first_t, sp["lower_inc"])
            .when(sp["lower"] < first_t, seq["lower_inc"])
            .otherwise(sp["lower_inc"] & seq["lower_inc"])
        )
        hi_inc = (
            F.when(sp["upper"] < last_t, sp["upper_inc"])
            .when(sp["upper"] > last_t, seq["upper_inc"])
            .otherwise(sp["upper_inc"] & seq["upper_inc"])
        )
        nonempty = (lo < hi) | ((lo == hi) & lo_inc & hi_inc)
        inner = F.filter(inst, lambda i: (i["t"] > lo) & (i["t"] < hi))
        head = _instant_struct(
            lo, _value_at_in_seq(seq, lo, interp_col, continuous, point)
        )
        tail = _instant_struct(
            hi, _value_at_in_seq(seq, hi, interp_col, continuous, point)
        )
        clipped = F.when(
            lo == hi, F.array(head)
        ).otherwise(F.concat(F.array(head), inner, F.array(tail)))
        return F.when(nonempty, _seq_struct(lo_inc, hi_inc, clipped)).otherwise(
            F.lit(None)
        )

    def clip_disc(seq: Column) -> Column:
        from .span import contains_value

        kept = F.filter(seq["instants"], lambda i: contains_value(sp, i["t"]))
        return F.when(
            F.size(kept) > 0, _seq_struct(F.lit(True), F.lit(True), kept)
        ).otherwise(F.lit(None))

    seqs = F.filter(
        F.transform(tc["seqs"], lambda q: F.when(disc, clip_disc(q)).otherwise(clip(q))),
        lambda q: q.isNotNull(),
    )
    n_seq = F.size(seqs)
    # MEOS preserves the input subtype family: restricting a SequenceSet
    # yields a SequenceSet even when one sequence survives (golden
    # tint.test:351-354 renders braces)
    subtype = (
        F.when(tc["subtype"] == SUBTYPE_INSTANT, F.lit(SUBTYPE_INSTANT))
        .when(tc["subtype"] == SUBTYPE_SEQUENCESET, F.lit(SUBTYPE_SEQUENCESET))
        .otherwise(F.lit(SUBTYPE_SEQUENCE))
    )
    return F.when(n_seq > 0, _temporal_struct(subtype, interp_col, seqs))


def at_time_spanset(t, ss, continuous=True, point=False) -> Column:
    """atTime(T, tstzspanset) — clip to each span, union
    (temporal.cpp:382-390)."""
    tc, ssc = _c(t), _c(ss)
    interp_col = tc["interp"]
    all_seqs = F.flatten(
        F.transform(
            ssc,
            lambda sp: F.coalesce(
                at_time(tc, sp, continuous, point)["seqs"],
                F.filter(tc["seqs"], lambda q: F.lit(False)),
            ),
        )
    )
    sorted_seqs = F.array_sort(
        all_seqs,
        lambda a, b: F.when(
            a["instants"][0]["t"] < b["instants"][0]["t"], F.lit(-1)
        )
        .when(a["instants"][0]["t"] > b["instants"][0]["t"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    n_seq = F.size(sorted_seqs)
    subtype = (
        F.when(tc["subtype"] == SUBTYPE_INSTANT, F.lit(SUBTYPE_INSTANT))
        .when(tc["subtype"] == SUBTYPE_SEQUENCESET, F.lit(SUBTYPE_SEQUENCESET))
        .otherwise(F.lit(SUBTYPE_SEQUENCE))
    )
    return F.when(n_seq > 0, _temporal_struct(subtype, interp_col, sorted_seqs))


def at_values(t, v) -> Column:
    """atValues(T, v) — restrict to times where value == v
    (temporal.cpp:425-433; step/discrete bases only, as in the reference
    which registers it for TBOOL)."""
    tc, v = _c(t), _c(v)
    disc = tc["interp"] == INTERP_DISCRETE

    def runs(seq: Column) -> Column:
        """Split one step sequence into maximal runs where value == v."""
        inst = seq["instants"]
        n = F.size(inst)
        idx = F.sequence(F.lit(0), n - 1)
        is_v = lambda i: F.try_element_at(inst, i + 1)["v"] == v  # noqa: E731
        starts = F.filter(idx, lambda i: is_v(i) & ((i == 0) | ~is_v(i - 1)))
        return F.transform(
            starts,
            lambda s0: (
                # run extends to the next instant with a different value
                # (step semantics: v holds on [t_i, t_j) where j is the
                # first index after the run)
                _run_seq(seq, inst, n, s0, v)
            ),
        )

    def _run_seq(seq, inst, n, s0, v):
        after = F.filter(
            F.sequence(s0, n - 1),
            lambda i: F.try_element_at(inst, i + 1)["v"] != v,
        )
        j = F.coalesce(F.try_element_at(after, F.lit(1)), n)  # exclusive end idx
        run_insts = F.slice(inst, s0 + 1, j - s0)
        last_kept = j == n
        # value holds up to (exclusive) the first differing instant's t;
        # append that boundary instant when the run is interior
        boundary = F.try_element_at(inst, j + 1)
        ext = F.when(
            last_kept, run_insts
        ).otherwise(F.concat(run_insts, F.array(_instant_struct(boundary["t"], v))))
        ui = F.when(last_kept, seq["upper_inc"]).otherwise(F.lit(False))
        li = F.when(s0 == 0, seq["lower_inc"]).otherwise(F.lit(True))
        return _seq_struct(li, ui, ext)

    def disc_filter(seq: Column) -> Column:
        kept = F.filter(seq["instants"], lambda i: i["v"] == v)
        return F.when(
            F.size(kept) > 0, _seq_struct(F.lit(True), F.lit(True), kept)
        ).otherwise(F.lit(None))

    seqs = F.when(
        disc,
        F.filter(F.transform(tc["seqs"], disc_filter), lambda q: q.isNotNull()),
    ).otherwise(F.flatten(F.transform(tc["seqs"], runs)))
    n_seq = F.size(seqs)
    subtype = (
        F.when(tc["subtype"] == SUBTYPE_INSTANT, F.lit(SUBTYPE_INSTANT))
        .when(n_seq == 1, F.lit(SUBTYPE_SEQUENCE))
        .otherwise(F.lit(SUBTYPE_SEQUENCESET))
    )
    return F.when(n_seq > 0, _temporal_struct(subtype, tc["interp"], seqs))


def when_true(t) -> Column:
    """whenTrue(TBOOL) → tstzspanset (temporal.cpp:435-443, MEOS
    tbool_when_true): the set of periods where the value is true."""
    tc = _c(t)
    disc = tc["interp"] == INTERP_DISCRETE

    def seq_spans(seq: Column) -> Column:
        inst = seq["instants"]
        n = F.size(inst)
        idx = F.sequence(F.lit(0), n - 1)
        return F.transform(
            F.filter(idx, lambda i: F.try_element_at(inst, i + 1)["v"]),
            lambda i: F.when(
                i < n - 1,
                span(
                    F.try_element_at(inst, i + 1)["t"],
                    F.try_element_at(inst, i + 2)["t"],
                    F.lit(True),
                    # holds through the next instant iff it is also true
                    F.coalesce(F.try_element_at(inst, i + 2)["v"], F.lit(False)),
                ),
            ).otherwise(
                span(
                    F.try_element_at(inst, i + 1)["t"],
                    F.try_element_at(inst, i + 1)["t"],
                    seq["upper_inc"] | (n == 1),
                    seq["upper_inc"] | (n == 1),
                )
            ),
        )

    disc_spans = F.transform(
        F.filter(instants(tc), lambda i: i["v"]),
        lambda i: span(i["t"], i["t"], F.lit(True), F.lit(True)),
    )
    cont_spans = F.flatten(F.transform(tc["seqs"], seq_spans))
    raw = F.when(disc, disc_spans).otherwise(cont_spans)
    # drop degenerate [t,t) artifacts, then normalize/merge
    return _spanset_normalize(raw)

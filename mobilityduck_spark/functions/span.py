"""Span and spanset algebra as pure Column expressions.

Reference surface: src/temporal/span.cpp (span constructors/accessors,
`@>`/`&&` predicate registrations at :205-209, impl :726-745) and
src/temporal/spanset.cpp (normalization semantics: adjacent/overlapping
spans merge — golden `spanset(ARRAY[intspan '[10,12]','[13,15]']) =
{[10,16)}`, test/sql/spanset.test:20-23).

A span is STRUCT<lower, upper, lower_inc, upper_inc>; a spanset is a
sorted, disjoint, merged ARRAY of spans. All operations are built-in
higher-order functions (JVM-side) — no UDFs, so they participate in
whole-stage codegen and can appear in join conditions Catalyst can plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


# ------------------------------------------------------------ constructors
def span(lower, upper, lower_inc=True, upper_inc=False) -> Column:
    """span(lo, hi) — reference: src/temporal/span.cpp:148-161.

    Default bounds `[lo, hi)` match MEOS span_make defaults for
    constructed spans.
    """
    return F.struct(
        _c(lower).alias("lower"),
        _c(upper).alias("upper"),
        _c(lower_inc).alias("lower_inc"),
        _c(upper_inc).alias("upper_inc"),
    )


def intspan(lower, upper, lower_inc=True, upper_inc=True) -> Column:
    """Integer span, canonicalized to half-open `[lo, hi+1)` form.

    Reference canonicalization: discrete-base spans always normalize so
    lower_inc=true, upper_inc=false (golden `valueSpan → [1, 7)`,
    test/sql/tint.test:306-309).
    """
    lo = _c(lower) + F.when(_c(lower_inc), F.lit(0)).otherwise(F.lit(1))
    hi = _c(upper) + F.when(_c(upper_inc), F.lit(1)).otherwise(F.lit(0))
    return span(lo.cast("long"), hi.cast("long"), F.lit(True), F.lit(False))


def span_of_value(v) -> Column:
    """span(v) — degenerate `[v, v]` span (src/temporal/span.cpp:150)."""
    return span(_c(v), _c(v), F.lit(True), F.lit(True))


# ------------------------------------------------------------ accessors
def lower(s) -> Column:
    return _c(s)["lower"]


def upper(s) -> Column:
    return _c(s)["upper"]


def lower_inc(s) -> Column:
    return _c(s)["lower_inc"]


def upper_inc(s) -> Column:
    return _c(s)["upper_inc"]


def width(s) -> Column:
    """Numeric span width (src/temporal/spanset.cpp:269-277 analog)."""
    return _c(s)["upper"] - _c(s)["lower"]


def duration_secs(s) -> Column:
    """Timestamp span extent in (fractional) seconds."""
    s = _c(s)
    return (F.unix_micros(s["upper"]) - F.unix_micros(s["lower"])) / F.lit(1_000_000.0)


# ------------------------------------------------------------ transforms
def shift(s, delta) -> Column:
    """shift(span, delta) — src/temporal/span.cpp:183-203."""
    s = _c(s)
    return span(s["lower"] + _c(delta), s["upper"] + _c(delta), s["lower_inc"], s["upper_inc"])


def expand(s, delta) -> Column:
    s = _c(s)
    return span(s["lower"] - _c(delta), s["upper"] + _c(delta), s["lower_inc"], s["upper_inc"])


def hull(a, b) -> Column:
    """Smallest span containing both (used by spanset→span cast,
    src/temporal/spanset.cpp:102-176)."""
    a, b = _c(a), _c(b)
    lo_a_first = (a["lower"] < b["lower"]) | (
        (a["lower"] == b["lower"]) & a["lower_inc"]
    )
    hi_a_last = (a["upper"] > b["upper"]) | (
        (a["upper"] == b["upper"]) & a["upper_inc"]
    )
    return span(
        F.least(a["lower"], b["lower"]),
        F.greatest(a["upper"], b["upper"]),
        F.when(lo_a_first, a["lower_inc"]).otherwise(b["lower_inc"]),
        F.when(hi_a_last, a["upper_inc"]).otherwise(b["upper_inc"]),
    )


# ------------------------------------------------------------ predicates
def contains_value(s, v) -> Column:
    """`span @> value` — src/temporal/span.cpp:205-209 (contains_span_value).

    Expands to plain range comparisons, so Catalyst can push it down /
    use it in range-join conditions (SURVEY.md §2.7).
    """
    s, v = _c(s), _c(v)
    above = F.when(s["lower_inc"], v >= s["lower"]).otherwise(v > s["lower"])
    below = F.when(s["upper_inc"], v <= s["upper"]).otherwise(v < s["upper"])
    return above & below


def overlaps(a, b) -> Column:
    """`span && span` — interval overlap, inclusive-bound aware."""
    a, b = _c(a), _c(b)
    left = F.when(
        a["lower"] < b["upper"], F.lit(True)
    ).otherwise((a["lower"] == b["upper"]) & a["lower_inc"] & b["upper_inc"])
    right = F.when(
        b["lower"] < a["upper"], F.lit(True)
    ).otherwise((b["lower"] == a["upper"]) & b["lower_inc"] & a["upper_inc"])
    return left & right


def contains_span(a, b) -> Column:
    """`a @> b` — a contains b."""
    a, b = _c(a), _c(b)
    lo_ok = F.when(a["lower"] < b["lower"], F.lit(True)).otherwise(
        (a["lower"] == b["lower"]) & (a["lower_inc"] | ~b["lower_inc"])
    )
    hi_ok = F.when(a["upper"] > b["upper"], F.lit(True)).otherwise(
        (a["upper"] == b["upper"]) & (a["upper_inc"] | ~b["upper_inc"])
    )
    return lo_ok & hi_ok


def is_empty(s) -> Column:
    s = _c(s)
    return (s["upper"] < s["lower"]) | (
        (s["upper"] == s["lower"]) & ~(s["lower_inc"] & s["upper_inc"])
    )


# ------------------------------------------------------------ spanset
def _span_cmp(left: Column, right: Column) -> Column:
    """Comparator: lower asc, lower_inc desc (inclusive first), upper asc."""
    return (
        F.when(left["lower"] < right["lower"], F.lit(-1))
        .when(left["lower"] > right["lower"], F.lit(1))
        .when(left["lower_inc"] & ~right["lower_inc"], F.lit(-1))
        .when(~left["lower_inc"] & right["lower_inc"], F.lit(1))
        .when(left["upper"] < right["upper"], F.lit(-1))
        .when(left["upper"] > right["upper"], F.lit(1))
        .otherwise(F.lit(0))
    )


def spanset(spans) -> Column:
    """Normalize an array of spans: sort, drop empties/nulls, merge
    overlapping & adjacent (src/temporal/spanset.cpp:198-216; golden
    test/sql/spanset.test:20-23).

    Pure aggregate-fold over the sorted array — stays in codegen.
    """
    arr = F.array_sort(
        F.filter(_c(spans), lambda s: s.isNotNull() & ~is_empty(s)), _span_cmp
    )
    empty = F.filter(arr, lambda s: F.lit(False))

    def merge(acc: Column, s: Column) -> Column:
        last = F.try_element_at(acc, F.lit(-1))
        joins = F.when(
            s["lower"] < last["upper"], F.lit(True)
        ).otherwise(
            (s["lower"] == last["upper"]) & (s["lower_inc"] | last["upper_inc"])
        )
        new_upper = (
            F.when(s["upper"] > last["upper"], s["upper"]).otherwise(last["upper"])
        )
        new_upper_inc = (
            F.when(s["upper"] > last["upper"], s["upper_inc"])
            .when(s["upper"] == last["upper"], s["upper_inc"] | last["upper_inc"])
            .otherwise(last["upper_inc"])
        )
        merged = span(last["lower"], new_upper, last["lower_inc"], new_upper_inc)
        return (
            F.when(F.size(acc) == 0, F.array(s))
            .when(
                joins,
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
            )
            .otherwise(F.concat(acc, F.array(s)))
        )

    return F.aggregate(arr, empty, merge)


def spanset_of(*spans) -> Column:
    return spanset(F.array(*[_c(s) for s in spans]))


def spanset_num_spans(ss) -> Column:
    return F.size(_c(ss))


def spanset_start_span(ss) -> Column:
    return F.try_element_at(_c(ss), F.lit(1))


def spanset_end_span(ss) -> Column:
    return F.try_element_at(_c(ss), F.lit(-1))


def spanset_span_n(ss, n) -> Column:
    """1-based; NULL out of range (src/temporal/spanset.cpp:301-319)."""
    return F.try_element_at(_c(ss), _c(n).cast("int"))


def spanset_lower(ss) -> Column:
    return spanset_start_span(ss)["lower"]


def spanset_upper(ss) -> Column:
    return spanset_end_span(ss)["upper"]


def spanset_width(ss, boundspan=False) -> Column:
    """Σ span widths, or hull width when boundspan (spanset.cpp:269-297)."""
    ss = _c(ss)
    if boundspan:
        return spanset_upper(ss) - spanset_lower(ss)
    return F.aggregate(
        ss, F.lit(0).cast("double"), lambda acc, s: acc + (s["upper"] - s["lower"])
    )


def spanset_duration_secs(ss, boundspan=False) -> Column:
    """Σ span durations in seconds (timestamp spansets)."""
    ss = _c(ss)
    if boundspan:
        return (
            F.unix_micros(spanset_upper(ss)) - F.unix_micros(spanset_lower(ss))
        ) / F.lit(1_000_000.0)
    return F.aggregate(
        ss,
        F.lit(0).cast("double"),
        lambda acc, s: acc
        + (F.unix_micros(s["upper"]) - F.unix_micros(s["lower"])) / F.lit(1_000_000.0),
    )


def spanset_duration_us(ss, boundspan=False) -> Column:
    """Σ span durations in exact microseconds (BIGINT)."""
    ss = _c(ss)
    if boundspan:
        return F.unix_micros(spanset_upper(ss)) - F.unix_micros(spanset_lower(ss))
    return F.aggregate(
        ss,
        F.lit(0).cast("long"),
        lambda acc, s: acc + (F.unix_micros(s["upper"]) - F.unix_micros(s["lower"])),
    )


def spanset_to_span(ss) -> Column:
    """spanset → span hull cast (src/temporal/spanset.cpp:102-176)."""
    ss = _c(ss)
    first, last = spanset_start_span(ss), spanset_end_span(ss)
    return span(first["lower"], last["upper"], first["lower_inc"], last["upper_inc"])


def spanset_contains_value(ss, v) -> Column:
    return F.exists(_c(ss), lambda s: contains_value(s, v))


def spanset_shift(ss, delta) -> Column:
    return F.transform(_c(ss), lambda s: shift(s, delta))


# ------------------------------------------------------------ spanset algebra
def spanset_union(a, b) -> Column:
    """spanset ∪ spanset — concat then normalize (merge)."""
    return spanset(F.concat(_c(a), _c(b)))


def _clip_span(s: Column, q: Column) -> Column:
    """s ∩ q for two spans (NULL when empty)."""
    lo = F.greatest(s["lower"], q["lower"])
    hi = F.least(s["upper"], q["upper"])
    lo_inc = (
        F.when(s["lower"] > q["lower"], s["lower_inc"])
        .when(s["lower"] < q["lower"], q["lower_inc"])
        .otherwise(s["lower_inc"] & q["lower_inc"])
    )
    hi_inc = (
        F.when(s["upper"] < q["upper"], s["upper_inc"])
        .when(s["upper"] > q["upper"], q["upper_inc"])
        .otherwise(s["upper_inc"] & q["upper_inc"])
    )
    ok = (lo < hi) | ((lo == hi) & lo_inc & hi_inc)
    return F.when(ok, span(lo, hi, lo_inc, hi_inc))


def spanset_intersection(a, b) -> Column:
    """spanset ∩ spanset — pairwise span clips, dropped when empty.
    O(|a|·|b|) pairs; both inputs are normalized (small) spansets."""
    ac, bc = _c(a), _c(b)
    pairs = F.flatten(
        F.transform(ac, lambda s: F.transform(bc, lambda q: _clip_span(s, q)))
    )
    return spanset(pairs)


def span_minus(s, q) -> Column:
    """s \\ q for two spans → 0–2 residual spans (array)."""
    s, q = _c(s), _c(q)
    left = F.when(
        (s["lower"] < q["lower"])
        | ((s["lower"] == q["lower"]) & s["lower_inc"] & ~q["lower_inc"]),
        span(s["lower"], q["lower"], s["lower_inc"], ~q["lower_inc"]),
    )
    right = F.when(
        (q["upper"] < s["upper"])
        | ((q["upper"] == s["upper"]) & s["upper_inc"] & ~q["upper_inc"]),
        span(q["upper"], s["upper"], ~q["upper_inc"], s["upper_inc"]),
    )
    no_overlap = ~overlaps(s, q)
    return F.when(no_overlap, F.array(s)).otherwise(
        F.filter(F.array(left, right), lambda x: x.isNotNull())
    )


def spanset_minus(a, b) -> Column:
    """spanset \\ spanset — fold each subtrahend span through every
    minuend span."""
    ac, bc = _c(a), _c(b)
    return F.aggregate(
        bc,
        ac,
        lambda acc, q: F.flatten(F.transform(acc, lambda s: span_minus(s, q))),
        lambda acc: spanset(acc),
    )


# ------------------------------------------------------------ text output
def _num_txt(v: Column) -> Column:
    """Render numerics like the reference (no trailing .0 on integral)."""
    return F.when(
        v.cast("double") == F.floor(v.cast("double")),
        v.cast("long").cast("string"),
    ).otherwise(v.cast("string"))


def span_as_text(s, timestamp=False) -> Column:
    """asText(span) — src/temporal/span.cpp:132-145 (column-level printer;
    value-level parity lives in textio.py)."""
    s = _c(s)
    fmt = (
        (lambda c: F.concat(F.date_format(c, "yyyy-MM-dd HH:mm:ss"), F.lit("+00")))
        if timestamp
        else _num_txt
    )
    return F.concat(
        F.when(s["lower_inc"], F.lit("[")).otherwise(F.lit("(")),
        fmt(s["lower"]),
        F.lit(", "),
        fmt(s["upper"]),
        F.when(s["upper_inc"], F.lit("]")).otherwise(F.lit(")")),
    )


def spanset_as_text(ss, timestamp=False) -> Column:
    return F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(_c(ss), lambda s: span_as_text(s, timestamp)), ", "
        ),
        F.lit("}"),
    )


def set_as_text(vals) -> Column:
    """asText(set) — src/temporal/set.cpp:145-156."""
    return F.concat(
        F.lit("{"), F.array_join(F.transform(_c(vals), _num_txt), ", "), F.lit("}")
    )

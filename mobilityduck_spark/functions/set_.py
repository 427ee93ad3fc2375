"""Ordered-set type (intset/floatset/textset/dateset/tstzset analogs).

Reference: src/temporal/set.cpp — constructor sorts + dedups (:159-167),
accessors (:189-217), transforms (:219-341), SetUnnest table function
(:1542-1653, → F.explode here).

Encoding: a set is a sorted, distinct ARRAY<base>. All pure built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .span import _c, span


# ------------------------------------------------------------ constructors
def set_(values) -> Column:
    """set(LIST) — sort + dedup (src/temporal/set.cpp:159-167)."""
    return F.array_sort(F.array_distinct(F.filter(_c(values), lambda v: v.isNotNull())))


def set_of_value(v) -> Column:
    """set(value) — singleton (base → set cast, src/temporal/set.cpp:86-138)."""
    return F.array(_c(v))


# ------------------------------------------------------------ accessors
def num_values(s) -> Column:
    return F.size(_c(s))


def start_value(s) -> Column:
    return F.try_element_at(_c(s), F.lit(1))


def end_value(s) -> Column:
    return F.try_element_at(_c(s), F.lit(-1))


def value_n(s, n) -> Column:
    """1-based, NULL out of range (src/temporal/set.cpp:209-212)."""
    return F.try_element_at(_c(s), _c(n).cast("int"))


def get_values(s) -> Column:
    return _c(s)


def set_span(s) -> Column:
    """set → span cast: `[min, max]` hull."""
    s = _c(s)
    return span(F.array_min(s), F.array_max(s), F.lit(True), F.lit(True))


def contains(s, v) -> Column:
    return F.array_contains(_c(s), _c(v))


# ------------------------------------------------------------ transforms
def shift(s, delta) -> Column:
    """shift(set, delta) — src/temporal/set.cpp:219-291."""
    return F.transform(_c(s), lambda v: v + _c(delta))


def scale(s, width_new, int_base=False) -> Column:
    """scale(set, width) — rescale extent to width_new keeping min."""
    s = _c(s)
    lo, hi = F.array_min(s), F.array_max(s)
    w = hi - lo
    scaled = F.transform(
        s,
        lambda v: F.when(w == 0, v).otherwise(lo + (v - lo) * _c(width_new) / w),
    )
    if int_base:
        return F.transform(scaled, lambda v: v.cast("long"))
    return scaled


def scale_tstz(s, width_interval) -> Column:
    """scale(tstzset, interval) — rescale the time extent (exact µs)."""
    s = _c(s)
    lo = F.array_min(s)
    w_us = F.unix_micros(F.to_timestamp(F.lit("1970-01-01")) + _c(width_interval))
    span_us = F.unix_micros(F.array_max(s)) - F.unix_micros(lo)
    # double math: (diff_us * w_us) would overflow BIGINT under ANSI
    factor = w_us.cast("double") / span_us.cast("double")
    return F.transform(
        s,
        lambda v: F.when(span_us == 0, v).otherwise(
            F.timestamp_micros(
                (
                    F.unix_micros(lo)
                    + (F.unix_micros(v) - F.unix_micros(lo)).cast("double") * factor
                ).cast("long")
            )
        ),
    )


def floor_set(s) -> Column:
    # NB: F.floor has an optional 2nd param — passing it directly to
    # transform would be treated as an (element, index) lambda
    return F.array_sort(F.array_distinct(F.transform(_c(s), lambda v: F.floor(v))))


def ceil_set(s) -> Column:
    return F.array_sort(F.array_distinct(F.transform(_c(s), lambda v: F.ceil(v))))


def round_set(s, digits=0) -> Column:
    d = digits if isinstance(digits, int) else 0
    return F.array_sort(F.array_distinct(F.transform(_c(s), lambda v: F.round(v, d))))


def lower_set(s) -> Column:
    """lower(textset) — src/temporal/set.cpp:329-341."""
    return F.array_sort(F.array_distinct(F.transform(_c(s), F.lower)))


def upper_set(s) -> Column:
    return F.array_sort(F.array_distinct(F.transform(_c(s), F.upper)))


def initcap_set(s) -> Column:
    return F.array_sort(F.array_distinct(F.transform(_c(s), F.initcap)))


# ------------------------------------------------------------ set ops
def union(a, b) -> Column:
    return F.array_sort(F.array_union(_c(a), _c(b)))


def intersection(a, b) -> Column:
    return F.array_sort(F.array_intersect(_c(a), _c(b)))


def minus(a, b) -> Column:
    return F.array_sort(F.array_except(_c(a), _c(b)))


def unnest(s) -> Column:
    """SetUnnest(set) table function (src/temporal/set.cpp:1542-1653):
    use `df.select(F.explode(unnest(col)))`."""
    return F.explode(_c(s))


def degrees_set(s, normalize=False) -> Column:
    """degrees(floatset[, normalize]) — radians→degrees per element;
    normalize wraps into [0, 360). Reference: src/temporal/set.cpp:293-310."""
    out = F.transform(_c(s), lambda v: F.degrees(v))
    if normalize:
        out = F.transform(out, lambda v: F.pmod(v, F.lit(360.0)))
    return out


def radians_set(s) -> Column:
    """radians(floatset) — degrees→radians per element.
    Reference: src/temporal/set.cpp:312-327."""
    return F.transform(_c(s), lambda v: F.radians(v))


def scale_date(s, width_days) -> Column:
    """scale(dateset, d) — rescale the date extent so the result spans
    d+1 inclusive days (date spans canonicalize to exclusive uppers, so
    a width argument of d covers d+1 calendar days — golden set.test:
    scale({01-01,01-02,01-03}, 4) = {01-01,01-03,01-06}); positions
    interpolate with floor. Reference: set_shift_scale for date base,
    src/temporal/set.cpp."""
    s = _c(s)
    lo, hi = F.array_min(s), F.array_max(s)
    w = F.datediff(hi, lo)
    target = _c(width_days).cast("double") + F.lit(1.0)
    return F.transform(
        s,
        lambda v: F.when(w == 0, v).otherwise(
            F.date_add(
                lo,
                F.floor(F.datediff(v, lo).cast("double") * target / w).cast("int"),
            )
        ),
    )

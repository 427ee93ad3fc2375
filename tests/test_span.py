"""Span/spanset algebra — goldens from /root/reference/test/sql/span.test,
spanset.test (merge/normalize semantics) replayed value-level."""

from pyspark.sql import functions as F

from mobilityduck_spark import textio
from mobilityduck_spark.functions import span as S

from tests.conftest import span_df, spanset_df


def one(df, col):
    return df.select(col.alias("r")).collect()[0]["r"]


def test_intspan_canonicalization(spark):
    # intspan '[10,12]' → [10, 13)  (reference half-open canonical form)
    df = spark.range(1)
    r = one(df, S.intspan(F.lit(10), F.lit(12)))
    assert textio.format_span(r, "int") == "[10, 13)"
    r = one(df, S.intspan(F.lit(10), F.lit(13), upper_inc=False))
    assert textio.format_span(r, "int") == "[10, 13)"


def test_spanset_merges_adjacent_int_spans(spark):
    # golden: spanset(ARRAY[intspan '[10,12]','[13,15]']) = {[10, 16)}
    # (test/sql/spanset.test:20-23)
    df = spark.range(1)
    ss = S.spanset(
        F.array(S.intspan(F.lit(10), F.lit(12)), S.intspan(F.lit(13), F.lit(15)))
    )
    r = one(df, ss)
    assert textio.format_spanset(r, "int") == "{[10, 16)}"


def test_spanset_keeps_disjoint(spark):
    df = spark.range(1)
    ss = S.spanset(
        F.array(S.intspan(F.lit(1), F.lit(3)), S.intspan(F.lit(10), F.lit(12)))
    )
    r = one(df, ss)
    assert textio.format_spanset(r, "int") == "{[1, 4), [10, 13)}"


def test_spanset_merges_overlapping_unsorted(spark):
    df = spark.range(1)
    ss = S.spanset(
        F.array(
            S.span(F.lit(5.0), F.lit(9.0)),
            S.span(F.lit(1.0), F.lit(6.0)),
            S.span(F.lit(20.0), F.lit(30.0)),
        )
    )
    r = one(df, ss)
    assert textio.format_spanset(r, "float") == "{[1, 9), [20, 30)}"


def test_span_predicates(spark):
    df = spark.range(1)
    a = S.span(F.lit(1.0), F.lit(5.0))  # [1,5)
    b = S.span(F.lit(5.0), F.lit(9.0))  # [5,9)
    c = S.span(F.lit(1.0), F.lit(5.0), upper_inc=True)  # [1,5]
    assert one(df, S.overlaps(a, b)) is False  # ) meets [ → no overlap
    assert one(df, S.overlaps(c, b)) is True  # ] meets [ → touch
    assert one(df, S.contains_value(a, F.lit(1.0))) is True
    assert one(df, S.contains_value(a, F.lit(5.0))) is False
    assert one(df, S.contains_value(c, F.lit(5.0))) is True
    assert one(df, S.contains_span(c, a)) is True
    assert one(df, S.contains_span(a, c)) is False


def test_spanset_accessors(spark):
    df = spanset_df(spark, ["{[1, 4), [10, 13)}"], "int")
    ss = F.col("ss")
    assert one(df, S.spanset_num_spans(ss)) == 2
    assert one(df, S.spanset_lower(ss)) == 1
    assert one(df, S.spanset_upper(ss)) == 13
    assert one(df, S.spanset_width(ss)) == 6.0
    assert one(df, S.spanset_width(ss, boundspan=True)) == 12
    assert textio.format_span(one(df, S.spanset_span_n(ss, F.lit(2))), "int") == "[10, 13)"
    assert one(df, S.spanset_span_n(ss, F.lit(3))) is None
    assert textio.format_span(one(df, S.spanset_to_span(ss)), "int") == "[1, 13)"


def test_tstz_span_contains(spark):
    df = span_df(spark, ["[2024-01-01, 2024-01-02)"], "timestamp")
    s = F.col("s")
    assert one(df, S.contains_value(s, F.to_timestamp(F.lit("2024-01-01 12:00:00")))) is True
    assert one(df, S.contains_value(s, F.to_timestamp(F.lit("2024-01-02 00:00:00")))) is False
    assert one(df, S.duration_secs(s)) == 86400.0


def test_stbox_wkb_roundtrip():
    """asBinary(STBOX)/stboxFromBinary (reference src/geo/stbox.cpp:62-103):
    every dimension combination survives the WKB round-trip exactly."""
    cases = [
        "STBOX X((1,2),(3,4))",
        "STBOX Z((1,2,3),(4,5,6))",
        "STBOX T([2000-01-01,2000-01-02])",
        "STBOX T((2000-01-01,2000-01-02))",
        "STBOX XT(((1,2),(3,4)),[2000-01-01,2000-01-02))",
        "STBOX ZT(((1.5,2.5,3.5),(4,5,6)),(2000-01-01,2000-01-02])",
        "GEODSTBOX ZT(((1,2,3),(4,5,6)),[2000-01-01,2000-01-02])",
        "SRID=5676;STBOX X((1,2),(3,4))",
    ]
    for c in cases:
        d = textio.parse_stbox(c)
        b = textio.stbox_as_binary(d)
        assert isinstance(b, bytes) and len(b) >= 2
        d2 = textio.stbox_from_binary(b)
        assert textio.format_stbox(d2) == textio.format_stbox(d), c

"""Spanset set-algebra + printers + projections."""

from pyspark.sql import functions as F

from mobilityduck_spark import textio
from mobilityduck_spark.functions import span as S
from mobilityduck_spark.functions import tpoint as TP
from mobilityduck_spark.functions import temporal as TT

from tests.conftest import temporal_df


def one(df, col):
    return df.select(col.alias("r")).collect()[0]["r"]


def _ss(*pairs):
    return S.spanset(F.array(*[S.span(F.lit(float(a)), F.lit(float(b))) for a, b in pairs]))


def test_spanset_union_intersection_minus(spark):
    df = spark.range(1)
    a = _ss((1, 5), (10, 15))
    b = _ss((3, 12), (20, 25))
    assert textio.format_spanset(one(df, S.spanset_union(a, b)), "float") == (
        "{[1, 15), [20, 25)}"
    )
    assert textio.format_spanset(one(df, S.spanset_intersection(a, b)), "float") == (
        "{[3, 5), [10, 12)}"
    )
    assert textio.format_spanset(one(df, S.spanset_minus(a, b)), "float") == (
        "{[1, 3), [12, 15)}"
    )
    # minus that splits a span in two
    c = _ss((0, 20))
    d = _ss((5, 8))
    assert textio.format_spanset(one(df, S.spanset_minus(c, d)), "float") == (
        "{[0, 5), [8, 20)}"
    )


def test_printers(spark):
    df = spark.range(1)
    assert one(df, S.span_as_text(S.span(F.lit(1.0), F.lit(5.5), F.lit(True), F.lit(True)))) == "[1, 5.5]"
    assert one(df, S.set_as_text(F.array(F.lit(3.0), F.lit(1.5)))) == "{3, 1.5}"
    sp = S.span(
        F.to_timestamp(F.lit("2024-01-01")), F.to_timestamp(F.lit("2024-01-02"))
    )
    assert one(df, S.span_as_text(sp, timestamp=True)) == (
        "[2024-01-01 00:00:00+00, 2024-01-02 00:00:00+00)"
    )


def test_web_mercator(spark):
    df = spark.range(1)
    r = one(df, TP.web_mercator(F.lit(0.0), F.lit(0.0)))
    assert abs(r["x"]) < 1e-9 and abs(r["y"]) < 1e-6
    r = one(df, TP.web_mercator(F.lit(13.4050), F.lit(52.5200)))  # Berlin
    assert abs(r["x"] - 1492237.77) < 1.0
    assert abs(r["y"] - 6894699.80) < 5.0


def test_tgeometry_as_text_base(spark):
    # TGEOMETRY parity: generic geometry carried as WKT text base with
    # step interp — the temporal machinery is base-type generic
    # (reference: src/geo/tgeometry.cpp registrations)
    df = temporal_df(
        spark,
        ['["POINT(0 0)"@2024-01-01, "LINESTRING(0 0, 1 1)"@2024-01-02]'],
        "text",
    )
    t = F.col("t")
    assert one(df, TT.start_value(t)) == "POINT(0 0)"
    assert one(df, TT.end_value(t)) == "LINESTRING(0 0, 1 1)"
    assert one(df, TT.duration_secs(t)) == 86400.0

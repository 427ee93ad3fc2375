"""Temporal type core — goldens from /root/reference/test/sql/tint.test,
tbool.test (FIXTURES.md §2) replayed value-level through the engine."""

from pyspark.sql import functions as F

from mobilityduck_spark import textio
from mobilityduck_spark.functions import temporal as TT
from mobilityduck_spark.functions import span as S

from tests.conftest import temporal_df, span_df


def one(df, col):
    return df.select(col.alias("r")).collect()[0]["r"]


def fmt_t(df, col, base):
    return textio.format_temporal(one(df, col), base)


def test_parse_roundtrip_instant_tz(spark):
    # '100@2025-01-01 10:00:00+05' → '100@2025-01-01 05:00:00+00'
    # (test/sql/tint.test:13-16)
    df = temporal_df(spark, ["100@2025-01-01 10:00:00+05"], "int")
    assert fmt_t(df, F.col("t"), "int") == "100@2025-01-01 05:00:00+00"


def test_tbool_rendering(spark):
    # tbool.test:10-13
    df = temporal_df(spark, ["true@2012-01-01 08:00:00"], "bool")
    assert fmt_t(df, F.col("t"), "bool") == "t@2012-01-01 08:00:00+00"


def test_subtype_and_interp(spark):
    cases = [
        ("1@2000-01-01", "Instant", "None"),
        ("{1@2000-01-01, 2@2000-01-02}", "Sequence", "Discrete"),
        ("[1@2000-01-01, 2@2000-01-02]", "Sequence", "Step"),
        ("{[1@2000-01-01, 2@2000-01-02], [3@2000-01-04, 3@2000-01-05]}",
         "SequenceSet", "Step"),
    ]
    df = temporal_df(spark, [c[0] for c in cases], "int")
    rows = df.select(
        TT.temp_subtype(F.col("t")).alias("st"), TT.interp(F.col("t")).alias("i")
    ).collect()
    for (_, est, ei), r in zip(cases, rows):
        assert r["st"] == est and r["i"] == ei


def test_accessors(spark):
    df = temporal_df(
        spark, ["{[1@2000-01-01, 2@2000-01-02], [3@2000-01-04, 3@2000-01-05]}"], "int"
    )
    t = F.col("t")
    assert one(df, TT.start_value(t)) == 1
    assert one(df, TT.end_value(t)) == 3
    assert one(df, TT.min_value(t)) == 1
    assert one(df, TT.max_value(t)) == 3
    assert one(df, TT.num_instants(t)) == 4
    assert one(df, TT.num_sequences(t)) == 2
    assert one(df, TT.value_n(t, F.lit(2))) == 2
    assert one(df, TT.value_n(t, F.lit(9))) is None
    assert textio.format_ts(one(df, TT.start_timestamp(t))) == "2000-01-01 00:00:00+00"
    assert textio.format_ts(one(df, TT.end_timestamp(t))) == "2000-01-05 00:00:00+00"
    # duration: Σ per-seq extents = 1 day + 1 day; boundspan = 4 days
    assert one(df, TT.duration_secs(t)) == 2 * 86400.0
    assert one(df, TT.duration_secs(t, boundspan=True)) == 4 * 86400.0


def test_duration_discrete(spark):
    # duration('{1@2000-01-01, 2@2000-01-02, 1@2000-01-03}', true) = 2 days;
    # plain duration of a discrete sequence = 0 (tint.test:223-226)
    df = temporal_df(spark, ["{1@2000-01-01, 2@2000-01-02, 1@2000-01-03}"], "int")
    t = F.col("t")
    assert one(df, TT.duration_secs(t, boundspan=True)) == 2 * 86400.0
    assert one(df, TT.duration_secs(t)) == 0.0


def test_value_n_instant_null(spark):
    # valueN('1@2000-01-01', 2) → NULL (tint.test:158-161)
    df = temporal_df(spark, ["1@2000-01-01"], "int")
    assert one(df, TT.value_n(F.col("t"), F.lit(2))) is None


def test_value_span_int_canonical(spark):
    # valueSpan(tint '{[1@..,1@..],[4@..,6@..]}') = [1, 7) (tint.test:306-309)
    df = temporal_df(
        spark,
        ["{[1@2000-01-01, 1@2000-01-02], [4@2000-01-03, 6@2000-01-05]}"],
        "int",
    )
    r = one(df, TT.value_span(F.col("t"), int_base=True))
    assert textio.format_span(r, "int") == "[1, 7)"


def test_tsequence_constructor_sorts_and_dedups(spark):
    df = spark.range(1)
    inst = F.array(
        F.struct(F.to_timestamp(F.lit("2000-01-02")).alias("t"), F.lit(2).alias("v")),
        F.struct(F.to_timestamp(F.lit("2000-01-01")).alias("t"), F.lit(1).alias("v")),
        F.struct(F.to_timestamp(F.lit("2000-01-02")).alias("t"), F.lit(5).alias("v")),
    )
    t = TT.tsequence(inst, "step")
    assert fmt_t(df, t, "int") == "[1@2000-01-01 00:00:00+00, 5@2000-01-02 00:00:00+00]"


def test_at_time_step(spark):
    # atTime(tint '{[1@01, 2@02, 1@03],[3@04, 3@05]}', tstzspan '[01,02]')
    # = {[1@01, 2@02]} (tint.test:351-354) — SequenceSet subtype is
    # preserved through restriction, so braces remain.
    df = temporal_df(
        spark,
        ["{[1@2000-01-01, 2@2000-01-02, 1@2000-01-03], [3@2000-01-04, 3@2000-01-05]}"],
        "int",
    )
    sp = S.span(
        F.to_timestamp(F.lit("2000-01-01")),
        F.to_timestamp(F.lit("2000-01-02")),
        F.lit(True),
        F.lit(True),
    )
    r = fmt_t(df, TT.at_time(F.col("t"), sp, continuous=False), "int")
    assert r == "{[1@2000-01-01 00:00:00+00, 2@2000-01-02 00:00:00+00]}"


def test_at_time_step_interpolates_boundary(spark):
    df = temporal_df(spark, ["[1@2000-01-01, 5@2000-01-03]"], "int")
    sp = S.span(
        F.to_timestamp(F.lit("2000-01-02")),
        F.to_timestamp(F.lit("2000-01-04")),
        F.lit(True),
        F.lit(True),
    )
    # step: value at 01-02 is still 1; sequence clipped to [1@02, 5@03]
    r = fmt_t(df, TT.at_time(F.col("t"), sp, continuous=False), "int")
    assert r == "[1@2000-01-02 00:00:00+00, 5@2000-01-03 00:00:00+00]"


def test_at_time_linear_interpolates(spark):
    df = temporal_df(spark, ["[1@2000-01-01, 5@2000-01-03]"], "float")
    sp = S.span(
        F.to_timestamp(F.lit("2000-01-02")),
        F.to_timestamp(F.lit("2000-01-04")),
        F.lit(True),
        F.lit(True),
    )
    r = fmt_t(df, TT.at_time(F.col("t"), sp), "float")
    assert r == "[3@2000-01-02 00:00:00+00, 5@2000-01-03 00:00:00+00]"


def test_at_time_empty_is_null(spark):
    df = temporal_df(spark, ["[1@2000-01-01, 5@2000-01-03]"], "int")
    sp = S.span(
        F.to_timestamp(F.lit("2001-01-01")),
        F.to_timestamp(F.lit("2001-01-02")),
        F.lit(True),
        F.lit(True),
    )
    assert one(df, TT.at_time(F.col("t"), sp, continuous=False)) is None


def test_value_at_timestamp(spark):
    df = temporal_df(spark, ["[1@2000-01-01, 5@2000-01-03]"], "float")
    t = F.col("t")
    # linear default for float: midpoint = 3
    assert one(df, TT.value_at_timestamp(t, F.to_timestamp(F.lit("2000-01-02")))) == 3.0
    assert one(df, TT.value_at_timestamp(t, F.to_timestamp(F.lit("2000-01-03")))) == 5.0
    assert one(df, TT.value_at_timestamp(t, F.to_timestamp(F.lit("2001-01-01")))) is None
    df2 = temporal_df(spark, ["Interp=Step;[1@2000-01-01, 5@2000-01-03]"], "float")
    assert one(df2, TT.value_at_timestamp(F.col("t"), F.to_timestamp(F.lit("2000-01-02")))) == 1.0


def test_shift_scale_value(spark):
    # shiftScaleValue(tint '1@2001-01-01', 1, 5) = 2@2001-01-01
    # (tint.test:371-374)
    df = temporal_df(spark, ["1@2001-01-01"], "int")
    r = fmt_t(df, TT.shift_scale_value(F.col("t"), F.lit(1), F.lit(5), int_base=True), "int")
    assert r == "2@2001-01-01 00:00:00+00"


def test_when_true(spark):
    df = temporal_df(
        spark,
        ["[t@2000-01-01, t@2000-01-02, f@2000-01-03, t@2000-01-04, f@2000-01-05]"],
        "bool",
    )
    r = one(df, TT.when_true(F.col("t")))
    # true on [01, 03) and [04, 05)
    assert textio.format_spanset(r, "timestamp") == (
        "{[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00), "
        "[2000-01-04 00:00:00+00, 2000-01-05 00:00:00+00)}"
    )


def test_at_values(spark):
    df = temporal_df(
        spark, ["[1@2000-01-01, 2@2000-01-02, 1@2000-01-03, 1@2000-01-04]"], "int"
    )
    r = fmt_t(df, TT.at_values(F.col("t"), F.lit(1)), "int")
    # 1 on [01, 02) and [03, 04]
    assert r == (
        "{[1@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00), "
        "[1@2000-01-03 00:00:00+00, 1@2000-01-04 00:00:00+00]}"
    )


def test_get_time_and_time_span(spark):
    df = temporal_df(
        spark,
        ["{[1@2000-01-01, 2@2000-01-02], [3@2000-01-04, 3@2000-01-05]}"],
        "int",
    )
    t = F.col("t")
    r = one(df, TT.get_time(t))
    assert textio.format_spanset(r, "timestamp") == (
        "{[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00], "
        "[2000-01-04 00:00:00+00, 2000-01-05 00:00:00+00]}"
    )
    assert textio.format_span(one(df, TT.time_span(t)), "timestamp") == (
        "[2000-01-01 00:00:00+00, 2000-01-05 00:00:00+00]"
    )


def test_sequences_and_instant_n(spark):
    df = temporal_df(
        spark,
        ["{[1@2000-01-01, 2@2000-01-02], [3@2000-01-04, 3@2000-01-05]}"],
        "int",
    )
    t = F.col("t")
    seqs = one(df, TT.sequences(t))
    assert len(seqs) == 2
    assert textio.format_temporal(seqs[0], "int") == (
        "[1@2000-01-01 00:00:00+00, 2@2000-01-02 00:00:00+00]"
    )
    assert fmt_t(df, TT.instant_n(t, F.lit(3)), "int") == "3@2000-01-04 00:00:00+00"
    assert one(df, TT.instant_n(t, F.lit(9))) is None


def test_from_instants_gap_split(spark):
    df = spark.range(1)
    mk = lambda d, v: F.struct(  # noqa: E731
        F.to_timestamp(F.lit(f"2000-01-{d:02d}")).alias("t"),
        F.lit(float(v)).alias("v"),
    )
    inst = F.array(mk(1, 1), mk(2, 2), mk(10, 3), mk(11, 4))
    t = TT.from_instants(inst, interp="linear", max_gap_secs=2 * 86400)
    r = one(df, t)
    assert r["subtype"] == 3 and len(r["seqs"]) == 2
    assert len(r["seqs"][0]["instants"]) == 2
    assert len(r["seqs"][1]["instants"]) == 2


def test_merge_and_shift(spark):
    df = temporal_df(spark, ["[1@2000-01-01, 2@2000-01-02]"], "int")
    t = F.col("t")
    import datetime

    shifted = TT.shift_time(t, F.lit(datetime.timedelta(days=1)))
    assert fmt_t(df, shifted, "int") == "[1@2000-01-02 00:00:00+00, 2@2000-01-03 00:00:00+00]"
    assert fmt_t(df, TT.shift_value(t, F.lit(10)), "int") == (
        "[11@2000-01-01 00:00:00+00, 12@2000-01-02 00:00:00+00]"
    )

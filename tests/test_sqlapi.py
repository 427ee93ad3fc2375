"""SQL entry point (sqlapi.py): the reference's SQL-with-extension-types
surface (SURVEY §3.1) rendered as Spark SQL UDFs. Every test checks the
pure-SQL formulation against the DataFrame-API formulation — same
session, same data, row-identical results."""

import pytest
from pyspark.sql import functions as F

from mobilityduck_spark import sqlapi
from mobilityduck_spark.functions import box as B
from mobilityduck_spark.functions import span as S
from mobilityduck_spark.functions import temporal as TT
from mobilityduck_spark.functions import tpoint as TP
from mobilityduck_spark.queries import _user_trajectories
from mobilityduck_spark.sources import tables as SRC

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def sqlfns(spark):
    names = sqlapi.register_sql_functions(spark)
    assert "length_tpoint" in names and "timeSpan" in names
    tr = _user_trajectories(spark, SF)
    tr.createOrReplaceTempView("trips_v")
    SRC.period_grid(spark).createOrReplaceTempView("periods_v")
    SRC.user_tfloat(spark, SF).createOrReplaceTempView("tfloat_v")
    yield names


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_accessors_match_dataframe_api(spark):
    got = spark.sql(
        """
        SELECT user_id,
               numInstants(tp) AS n,
               startTimestamp(tp) AS st,
               endTimestamp(tp) AS en,
               ROUND(length_tpoint(tp), 6) AS len
        FROM trips_v
        """
    )
    tr = spark.table("trips_v")
    exp = tr.select(
        "user_id",
        TT.num_instants(F.col("tp")).cast("int").alias("n"),
        TT.start_timestamp(F.col("tp")).alias("st"),
        TT.end_timestamp(F.col("tp")).alias("en"),
        F.round(TP.length(F.col("tp")), 6).alias("len"),
    )
    cols = ("user_id", "n", "st", "en", "len")
    assert _rows(got, *cols) == _rows(exp, *cols)


def test_stbox_and_predicates_match(spark):
    got = spark.sql(
        """
        SELECT user_id,
               stbox(tp).xmin AS xmn, stbox(tp).ymax AS ymx,
               stbox_overlaps(expandSpace(stbox(tp), 1.0),
                              stbox_xy(0.0, 0.0, 50.0, 50.0)) AS ov
        FROM trips_v
        """
    )
    tr = spark.table("trips_v")
    bb = B.stbox_of_tpoint(F.col("tp"))
    probe = B.stbox(xmin=F.lit(0.0), ymin=F.lit(0.0), xmax=F.lit(50.0), ymax=F.lit(50.0))
    exp = tr.select(
        "user_id",
        bb["xmin"].alias("xmn"),
        bb["ymax"].alias("ymx"),
        B.stbox_overlaps(B.expand_space(bb, F.lit(1.0)), probe).alias("ov"),
    )
    cols = ("user_id", "xmn", "ymx", "ov")
    assert _rows(got, *cols) == _rows(exp, *cols)


def test_q8_shape_sql_matches_dataframe(spark):
    """The BerlinMOD q8 join shape in pure SQL: && on timeSpan as the
    join predicate, duration(atTime(...)) as the aggregate input."""
    got = spark.sql(
        """
        SELECT t.user_id, p.period_id,
               atTime_duration_us(t.tp, tstzspan(p.tstart, p.tend)) AS dur_us
        FROM trips_v t JOIN periods_v p
          ON span_overlaps(timeSpan(t.tp), tstzspan(p.tstart, p.tend))
        WHERE atTime_duration_us(t.tp, tstzspan(p.tstart, p.tend)) > 0
        """
    )
    tr = spark.table("trips_v")
    periods = spark.table("periods_v")
    sp = S.span(F.col("tstart"), F.col("tend"))
    joined = tr.crossJoin(F.broadcast(periods)).filter(
        S.overlaps(TT.time_span(F.col("tp")), sp)
    )
    clipped = joined.select(
        "user_id", "period_id", TT.at_time(F.col("tp"), sp, point=True).alias("c")
    )
    exp = clipped.select(
        "user_id", "period_id", TT.duration_us(F.col("c")).alias("dur_us")
    ).filter(F.col("dur_us") > 0)
    cols = ("user_id", "period_id", "dur_us")
    assert _rows(got, *cols) == _rows(exp, *cols)


def test_tfloat_minmax_match(spark):
    got = spark.sql(
        """
        SELECT user_id, minValue_tfloat(tf) AS mn, maxValue_tfloat(tf) AS mx,
               numInstants_tfloat(tf) AS n
        FROM tfloat_v
        """
    )
    exp = spark.table("tfloat_v").select(
        "user_id",
        TT.min_value(F.col("tf")).alias("mn"),
        TT.max_value(F.col("tf")).alias("mx"),
        TT.num_instants(F.col("tf")).cast("int").alias("n"),
    )
    cols = ("user_id", "mn", "mx", "n")
    assert _rows(got, *cols) == _rows(exp, *cols)


def test_span_contains_ts(spark):
    r = spark.sql(
        """
        SELECT span_contains_ts(tstzspan(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-03'),
                                TIMESTAMP '2024-01-02') AS inside,
               span_contains_ts(tstzspan(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-03'),
                                TIMESTAMP '2024-01-03') AS at_open_end,
               span_contains_ts(tstzspan(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-03'),
                                TIMESTAMP '2024-01-01') AS at_closed_start
        """
    ).collect()[0]
    assert r["inside"] is True
    assert r["at_open_end"] is False  # [lo, hi) constructor default
    assert r["at_closed_start"] is True


def test_sql_functions_inline_into_codegen(spark):
    """SQL UDF calls must dissolve into the plan (no BatchEvalPython /
    python UDF nodes) — the whole point of the SQL-UDF surface."""
    df = spark.sql("SELECT user_id, length_tpoint(tp) AS len FROM trips_v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_text_pipeline_sql_matches_dataframe(spark):
    """The text-pipeline family in pure SQL (tokens/fingerprint/split/
    quality) must match operators/text.py exactly — same hash, same
    bucket, same split label."""
    from mobilityduck_spark.operators import text as TX

    docs = SRC.load(spark, SF, "documents")
    docs.createOrReplaceTempView("documents_v")
    got = spark.sql(
        """
        SELECT doc_id,
               doc_token_count(text) AS ntok,
               doc_fingerprint(text) AS fp,
               ROUND(alpha_ratio(text), 6) AS ar,
               split_assign(doc_id, 0.8D, 0.1D, 'v1') AS split
        FROM documents_v
        """
    )
    exp = docs.select(
        "doc_id",
        TX.token_count("text").cast("int").alias("ntok"),
        TX.fingerprint("text").alias("fp"),
        F.round(TX.alpha_ratio("text"), 6).alias("ar"),
        TX.split_assign(F.col("doc_id"), train=0.8, val=0.1).alias("split"),
    )
    cols = ("doc_id", "ntok", "fp", "ar", "split")
    assert _rows(got, *cols) == _rows(exp, *cols)


def test_duration_us_sql(spark):
    r = spark.sql(
        """
        SELECT duration_us(tstzspan(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-02')) AS d
        """
    ).collect()[0]
    assert r["d"] == 86_400_000_000


def test_area_sql_matches_dataframe(spark):
    got = spark.sql("SELECT user_id, area(stbox(tp)) AS a FROM trips_v")
    tr = spark.table("trips_v")
    exp = tr.select(
        "user_id", B.area(B.stbox_of_tpoint(F.col("tp"))).alias("a")
    )
    assert _rows(got, "user_id", "a") == _rows(exp, "user_id", "a")

"""Oracle-checkable query registry.

Each entry implements one operator family from SURVEY.md §2 as a DataFrame
program over the driver's synthetic tables, paired with an ANSI-SQL oracle
DuckDB can run on the same parquet (driver contract in __spark_entry__.py).

Design rules for oracle parity:
- outputs use exact types (BIGINT microsecond durations via unix_micros,
  not float seconds; DECIMAL-exact money sums cast to DOUBLE at the end);
- every computed column aliased identically on both sides;
- no raw timestamps in outputs (epoch micros instead) to sidestep
  tz/rendering differences between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import set_ as ST
from .functions import span as S
from .functions import temporal as TT
from .sources import tables as SRC

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# =====================================================================
# Relational sanity: TPC-H Q1 shape (DECIMAL-exact, cast to DOUBLE)
# =====================================================================
@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# =====================================================================
# Temporal constructor + accessors (tsequence, start/end/min/max value,
# duration) — SURVEY §2.2/§2.3
# =====================================================================
@register(
    "tfloat_stats",
    """
    SELECT user_id,
           COUNT(*) AS n_instants,
           arg_min(value, ts) AS start_val,
           arg_max(value, ts) AS end_val,
           MIN(value) AS min_val,
           MAX(value) AS max_val,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
    FROM events GROUP BY user_id
    """,
)
def tfloat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = SRC.user_tfloat(spark, sf_dir)
    t = F.col("tf")
    return tf.select(
        "user_id",
        TT.num_instants(t).cast("long").alias("n_instants"),
        TT.start_value(t).alias("start_val"),
        TT.end_value(t).alias("end_val"),
        TT.min_value(t).alias("min_val"),
        TT.max_value(t).alias("max_val"),
        TT.duration_us(t, boundspan=True).alias("dur_us"),
    )


# =====================================================================
# valueAtTimestamp at probe instants (q3 shape: span @> instant,
# step interpolation) — SURVEY §2.5
# =====================================================================
@register(
    "value_at_instants",
    """
    WITH p AS (
      SELECT CAST(k AS INT) AS instant_id,
             TIMESTAMP '2024-01-05' + CAST(k AS INT) * INTERVAL 5 DAY AS instant
      FROM generate_series(0, 5) t(k)
    ),
    b AS (SELECT user_id, MAX(ts) AS mx FROM events GROUP BY user_id)
    SELECT v.user_id, v.instant_id, v.val
    FROM (
      SELECT e.user_id, p.instant_id, p.instant, arg_max(e.value, e.ts) AS val
      FROM events e JOIN p ON e.ts <= p.instant
      GROUP BY e.user_id, p.instant_id, p.instant
    ) v JOIN b ON v.user_id = b.user_id
    WHERE v.instant <= b.mx
    """,
)
def value_at_instants(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = SRC.user_tfloat(spark, sf_dir)  # step interp
    probes = SRC.instant_grid(spark)
    joined = tf.crossJoin(F.broadcast(probes))
    return joined.select(
        "user_id",
        "instant_id",
        TT.value_at_timestamp(F.col("tf"), F.col("instant")).alias("val"),
    ).filter(F.col("val").isNotNull())


# =====================================================================
# atTime + duration + && join + aggregate (BerlinMOD q8 shape) —
# SURVEY §2.5/§2.7; the flagship query
# =====================================================================
@register(
    "attime_duration",
    """
    WITH p AS (
      SELECT CAST(k AS INT) AS period_id,
             TIMESTAMP '2024-01-01' + CAST(k AS INT) * INTERVAL 4 DAY AS tstart,
             TIMESTAMP '2024-01-01' + CAST(k AS INT) * INTERVAL 4 DAY
               + INTERVAL 3 DAY AS tend
      FROM generate_series(0, 7) t(k)
    ),
    b AS (SELECT user_id, MIN(ts) AS mn, MAX(ts) AS mx FROM events GROUP BY user_id)
    SELECT b.user_id, p.period_id,
           epoch_us(LEAST(p.tend, b.mx)) - epoch_us(GREATEST(p.tstart, b.mn)) AS dur_us
    FROM b, p
    WHERE epoch_us(LEAST(p.tend, b.mx)) - epoch_us(GREATEST(p.tstart, b.mn)) > 0
    """,
)
def attime_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = SRC.user_tfloat(spark, sf_dir)
    periods = SRC.period_grid(spark)
    sp = S.span(F.col("tstart"), F.col("tend"))  # [tstart, tend)
    joined = tf.crossJoin(F.broadcast(periods)).filter(
        S.overlaps(TT.time_span(F.col("tf")), sp)
    )
    return joined.select(
        "user_id",
        "period_id",
        TT.duration_us(TT.at_time(F.col("tf"), sp)).alias("dur_us"),
    ).filter(F.col("dur_us") > 0)


# =====================================================================
# tbool + whenTrue → tstzspanset (SURVEY §2.5: whenTrue)
# =====================================================================
@register(
    "when_true_total",
    """
    WITH x AS (
      SELECT user_id, ts, value,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS nts
      FROM events
    )
    SELECT user_id,
           CAST(SUM(epoch_us(nts) - epoch_us(ts)) AS BIGINT) AS true_us
    FROM x
    WHERE value > 10 AND nts IS NOT NULL
    GROUP BY user_id
    HAVING SUM(epoch_us(nts) - epoch_us(ts)) > 0
    """,
)
def when_true_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    tb = SRC.user_tbool(spark, sf_dir, threshold=10.0)
    return (
        tb.select(
            "user_id",
            S.spanset_duration_us(TT.when_true(F.col("tb"))).alias("true_us"),
        )
        .filter(F.col("true_us") > 0)
    )


# =====================================================================
# spanset normalization at scale: sessionization (gaps-and-islands as
# span-merge) — SURVEY §2.2 spanset semantics
# =====================================================================
_SESSION_GAP_US = 1_800_000_000  # 30 min


@register(
    "sessions_spanset",
    f"""
    WITH x AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
      FROM events
    ),
    y AS (
      SELECT user_id, ts,
             CASE WHEN pts IS NULL
                       OR epoch_us(ts) - epoch_us(pts) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM x
    ),
    z AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM y
    ),
    s AS (
      SELECT user_id, grp,
             epoch_us(MAX(ts)) - epoch_us(MIN(ts)) + {_SESSION_GAP_US} AS w
      FROM z GROUP BY user_id, grp
    )
    SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(w) AS BIGINT) AS total_us
    FROM s GROUP BY user_id
    """,
)
def sessions_spanset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = SRC.load(spark, sf_dir, "events")
    gap = F.expr("INTERVAL 30 MINUTES")
    raw_spans = F.collect_list(S.span(F.col("ts"), F.col("ts") + gap))
    agg = ev.groupBy("user_id").agg(S.spanset(raw_spans).alias("ss"))
    return agg.select(
        "user_id",
        F.size(F.col("ss")).cast("long").alias("n_sessions"),
        S.spanset_duration_us(F.col("ss")).alias("total_us"),
    )


# =====================================================================
# set type: constructor + accessors (SURVEY §2.2/§2.3 set surface)
# =====================================================================
@register(
    "event_type_set",
    """
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           MIN(event_type) AS first_type,
           MAX(event_type) AS last_type,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_str
    FROM events GROUP BY user_id
    """,
)
def event_type_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = SRC.load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        ST.set_(F.collect_set("event_type")).alias("s")
    )
    s = F.col("s")
    return agg.select(
        "user_id",
        ST.num_values(s).cast("long").alias("n_types"),
        ST.start_value(s).alias("first_type"),
        ST.end_value(s).alias("last_type"),
        F.array_join(s, ",").alias("types_str"),
    )


# =====================================================================
# SetUnnest table function → explode (SURVEY §2.8)
# =====================================================================
@register(
    "set_unnest",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def set_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = SRC.load(spark, sf_dir, "events")
    sets = ev.groupBy("user_id").agg(ST.set_(F.collect_set("event_type")).alias("s"))
    return (
        sets.select("user_id", ST.unnest(F.col("s")).alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )

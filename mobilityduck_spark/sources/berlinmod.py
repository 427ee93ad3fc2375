"""BerlinMOD-shaped synthetic dataset derived deterministically from the
driver's `events` table (FIXTURES.md §1), shared by the bm_q* query pack
and its DuckDB oracles.

Derivations (identical formulas on both engines):
- position:  x = (event_id % 1000)/10,  y = (event_id*7919 % 1000)/10
- trips:     per-user pings split into sequences at gaps > 2h
             (islands in SQL; from_instants(max_gap) in Spark)
- vehicles:  vehicle_id = user_id, licence 'L<id>',
             type by id%10 → 6 passenger / 2 truck / 2 bus, model 'M<id%5>'
- probes:    instants1/points1 sampled from events by event_id modulus;
             periods1 = fixed 2-day windows; regions1 = fixed boxes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import temporal as TT
from . import tables as SRC

GAP_SECS = 7200

# ---------------------------------------------------------------- SQL CTEs
_PTS_BASE_SQL = """
  SELECT user_id, ts, event_id,
         (event_id % 1000) / CAST(10.0 AS DOUBLE) AS x,
         (event_id * 7919 % 1000) / CAST(10.0 AS DOUBLE) AS y
  FROM events
"""

# Two planted vehicles (ids 900001/900002) parked at the FIRST probe
# point from the FIRST probe instant for 10 minutes (two pings each, same
# position — both derived from the same events rows the probe dims
# sample: identical formulas, so the planted coordinates are bit-equal
# doubles to points1.(px,py) on both engines). Reference q12 finds
# vehicle pairs co-located at a probe point at a probe instant; without
# the plant the synthetic fleet never co-locates exactly and q12 is a
# vacuous 0=0 row at every SF. The second (stationary) ping gives each
# planted vehicle a real — zero-length — trajectory segment, so
# segment-based pair kernels (q5's point-to-segment arms) see it like
# any other vehicle. Ids are far above any real user_id so the
# licences1/licences2 heads only admit them at tiny SFs where the
# natural fleet is smaller than 20 (both engines derive the same heads).
PLANT_SQL = """
  SELECT CAST(900000 + k AS BIGINT) AS user_id,
         make_timestamp(epoch_us(pi.ts) + j * CAST(600000000 AS BIGINT)) AS ts,
         CAST(10000000000 + 2 * k + j AS BIGINT) AS event_id,
         pp.px AS x, pp.py AS y
  FROM (SELECT ts FROM events WHERE event_id % 101 = 0
        ORDER BY event_id LIMIT 1) pi,
       (SELECT (event_id % 1000) / CAST(10.0 AS DOUBLE) AS px,
               (event_id * 7919 % 1000) / CAST(10.0 AS DOUBLE) AS py
        FROM events WHERE event_id % 89 = 0
        ORDER BY event_id LIMIT 1) pp,
       generate_series(1, 2) t(k),
       generate_series(0, 1) s(j)
"""

PTS_SQL = f"""
  SELECT user_id, ts, event_id, x, y
  FROM (({_PTS_BASE_SQL}) UNION ALL ({PLANT_SQL}))
"""

ISLANDS_SQL = f"""
  SELECT user_id, ts, event_id, x, y,
         SUM(CASE WHEN pts IS NULL
                  OR epoch_us(ts) - epoch_us(pts) > {GAP_SECS}::BIGINT * 1000000
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
           AS island
  FROM (
    SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
    FROM ({PTS_SQL})
  )
"""

VEHICLES_SQL = f"""
  SELECT DISTINCT user_id AS vehicle_id,
         'L' || CAST(user_id AS VARCHAR) AS licence,
         CASE WHEN user_id % 10 < 6 THEN 'passenger'
              WHEN user_id % 10 < 8 THEN 'truck'
              ELSE 'bus' END AS vehicle_type,
         'M' || CAST(user_id % 5 AS VARCHAR) AS model
  FROM ({PTS_SQL})
"""

LICENCES1_SQL = f"SELECT * FROM ({VEHICLES_SQL}) ORDER BY vehicle_id LIMIT 10"
LICENCES2_SQL = (
    f"SELECT * FROM ({VEHICLES_SQL}) ORDER BY vehicle_id LIMIT 10 OFFSET 10"
)

INSTANTS1_SQL = """
  SELECT CAST(row_number() OVER (ORDER BY event_id) AS INT) AS instant_id,
         ts AS instant
  FROM events WHERE event_id % 101 = 0
  ORDER BY event_id LIMIT 10
"""

POINTS1_SQL = """
  SELECT CAST(row_number() OVER (ORDER BY event_id) AS INT) AS point_id,
         (event_id % 1000) / CAST(10.0 AS DOUBLE) AS px,
         (event_id * 7919 % 1000) / CAST(10.0 AS DOUBLE) AS py
  FROM events WHERE event_id % 89 = 0
  ORDER BY event_id LIMIT 10
"""

PERIODS1_SQL = """
  SELECT CAST(k AS INT) AS period_id,
         TIMESTAMP '2024-01-01' + CAST(k AS INT) * INTERVAL 3 DAY AS tstart,
         TIMESTAMP '2024-01-01' + CAST(k AS INT) * INTERVAL 3 DAY
           + INTERVAL 2 DAY AS tend
  FROM generate_series(0, 9) t(k)
"""

REGIONS1_SQL = """
  SELECT CAST(k AS INT) AS region_id,
         CAST(k * 9 % 80 AS DOUBLE) AS rx0,
         CAST(k * 9 % 80 + 21 AS DOUBLE) AS rx1,
         CAST(k * 13 % 80 AS DOUBLE) AS ry0,
         CAST(k * 13 % 80 + 21 AS DOUBLE) AS ry1
  FROM generate_series(0, 9) t(k)
"""

# Polygon regions (the reference's regions are real polygons —
# benchmark/BerlinMOD/sql/load/04_regions.sql:17-30): 10 deterministic
# star-shaped simple polygons, 8 angle-ordered vertices each. Vertices
# are center + radius_j * direction_j with RATIONAL directions and
# half-integer radii, so every coordinate is an exact multiple of 0.5 —
# bit-identical doubles on Spark and DuckDB with no trig involved.
# Directions (angle-ordered): (2,0) (2,1) (0,2) (-1,2) (-2,0) (-2,-1)
# (0,-2) (1,-2); radius_j = (6 + (k*3 + j*5) % 7) / 2 in [3, 6].
_POLY_DX = [2, 2, 0, -1, -2, -2, 0, 1]
_POLY_DY = [0, 1, 2, 2, 0, -1, -2, -2]

_DX_CASE = " ".join(
    f"WHEN {j} THEN {d}" for j, d in enumerate(_POLY_DX)
)
_DY_CASE = " ".join(
    f"WHEN {j} THEN {d}" for j, d in enumerate(_POLY_DY)
)

REGIONS_POLY_SQL = f"""
  SELECT CAST(k AS INT) AS region_id, CAST(j AS INT) AS j,
         CAST(k * 9 % 80 + 10.5 AS DOUBLE)
           + (6 + (k * 3 + j * 5) % 7) / CAST(2.0 AS DOUBLE)
             * CAST(CASE CAST(j AS INT) {_DX_CASE} END AS DOUBLE) AS vx,
         CAST(k * 13 % 80 + 10.5 AS DOUBLE)
           + (6 + (k * 3 + j * 5) % 7) / CAST(2.0 AS DOUBLE)
             * CAST(CASE CAST(j AS INT) {_DY_CASE} END AS DOUBLE) AS vy
  FROM generate_series(0, 9) t(k), generate_series(0, 7) s(j)
"""


# ---------------------------------------------------------------- Spark side
def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ping relation: per-event positions UNION the four planted q12
    pings (PLANT_SQL — two vehicles parked at the first probe point from
    the first probe instant for 10 min). The plant side is one partial-
    aggregated scan reduced to a single row, then exploded to 4 rows: a
    constant-size subplan with no joins."""
    ev = SRC.load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") % 1000) / F.lit(10.0)).alias("x"),
        ((F.col("event_id") * 7919 % 1000) / F.lit(10.0)).alias("y"),
    )
    # the probe-anchor row (first %101 instant, first %89 point) comes
    # from ONE partial-aggregated scan; the 4 planted pings then explode
    # from a literal array on that 1-row result — no join of any kind,
    # so the repo's no-BNLJ/no-Cartesian plan gates hold everywhere
    c101 = F.col("event_id") % 101 == 0
    c89 = F.col("event_id") % 89 == 0
    anchor = ev.agg(
        F.min_by(F.when(c101, F.col("ts")), F.when(c101, F.col("event_id")))
        .alias("pts"),
        F.min(F.when(c89, F.col("event_id"))).alias("pe"),
    )
    kj = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("long").alias("k"),
                    F.lit(j).cast("long").alias("j"),
                )
                for k in (1, 2)
                for j in (0, 1)
            ]
        )
    )
    plant = anchor.select("pts", "pe", kj.alias("kj")).select(
        (F.col("kj.k") + 900000).cast("long").alias("user_id"),
        F.timestamp_micros(
            F.unix_micros("pts") + F.col("kj.j") * F.lit(600000000)
        ).alias("ts"),
        (F.col("kj.k") * 2 + F.col("kj.j") + 10000000000)
        .cast("long")
        .alias("event_id"),
        ((F.col("pe") % 1000) / F.lit(10.0)).alias("x"),
        ((F.col("pe") * 7919 % 1000) / F.lit(10.0)).alias("y"),
    )
    return base.unionByName(plant)


def trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per vehicle: gap-split SequenceSet trajectory (the
    07_trips.sql assembly: group → sort → sequence construction)."""
    pts = points(spark, sf_dir)
    return pts.groupBy("user_id").agg(
        TT.from_instants(
            F.collect_list(
                F.struct(
                    F.col("ts").alias("t"),
                    F.struct(F.col("x"), F.col("y")).alias("v"),
                )
            ),
            interp="linear",
            max_gap_secs=GAP_SECS,
        ).alias("trip")
    ).withColumnRenamed("user_id", "vehicle_id")


_VEH_CACHE: dict = {}


def vehicles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vehicle dim derived from events (scan + distinct shuffle).
    Persisted per session: it feeds licences1/licences2/probe dims in
    most bm queries, and several of those embed it in multiple
    materialized (checkpointed) subtrees per run — without the cache
    each run re-scans and re-shuffles the events table per use."""
    key = (SRC.session_key(spark), sf_dir)
    if key not in _VEH_CACHE:
        _VEH_CACHE[key] = _vehicles_uncached(spark, sf_dir).persist()
    return _VEH_CACHE[key]


def _vehicles_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    # derived from the ping relation (not raw events) so the planted
    # q12 vehicles get licence/type/model rows like everyone else —
    # mirrors VEHICLES_SQL reading PTS_SQL
    vid = F.col("user_id")
    return points(spark, sf_dir).select("user_id").distinct().select(
        vid.alias("vehicle_id"),
        F.concat(F.lit("L"), vid.cast("string")).alias("licence"),
        F.when(vid % 10 < 6, "passenger")
        .when(vid % 10 < 8, "truck")
        .otherwise("bus")
        .alias("vehicle_type"),
        F.concat(F.lit("M"), (vid % 5).cast("string")).alias("model"),
    )


def _ranked_head(df: DataFrame, order_col: str, n: int, id_name: str) -> DataFrame:
    """Rank-id the n smallest rows by order_col WITHOUT an unpartitioned
    window over the full table: orderBy().limit() compiles to
    TakeOrderedAndProject (per-partition top-n + driver merge — scale-
    safe), and the row_number then runs on the ≤n-row head under a
    constant partition key (single task on bounded input by
    construction, no full-table sort, no 'no partition defined' hazard).
    The key is order_col % 1 (constant 0, but non-foldable — a literal
    would be constant-folded out of the partition spec, reviving the
    unpartitioned-WindowExec plan)."""
    w = Window.partitionBy(F.col(order_col) % 1).orderBy(order_col)
    return (
        df.orderBy(order_col)
        .limit(n)
        .withColumn(id_name, F.row_number().over(w).cast("int"))
    )


def licences1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vehicles(spark, sf_dir).orderBy("vehicle_id").limit(10)


def licences2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # licences 11..20: rank the 20-row TakeOrdered head, keep the tail
    return (
        _ranked_head(vehicles(spark, sf_dir), "vehicle_id", 20, "_rn")
        .filter(F.col("_rn") > 10)
        .drop("_rn")
    )


def instants1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = SRC.load(spark, sf_dir, "events")
    return _ranked_head(
        ev.filter(F.col("event_id") % 101 == 0).select("event_id", "ts"),
        "event_id",
        10,
        "instant_id",
    ).select("instant_id", F.col("ts").alias("instant"))


def points1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = SRC.load(spark, sf_dir, "events")
    return _ranked_head(
        ev.filter(F.col("event_id") % 89 == 0).select("event_id"),
        "event_id",
        10,
        "point_id",
    ).select(
        "point_id",
        ((F.col("event_id") % 1000) / F.lit(10.0)).alias("px"),
        ((F.col("event_id") * 7919 % 1000) / F.lit(10.0)).alias("py"),
    )


def periods1(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = F.to_timestamp(F.lit("2024-01-01"))
    k = F.col("id").cast("int")
    return spark.range(10).select(
        k.alias("period_id"),
        (base + k * F.expr("INTERVAL 3 DAYS")).alias("tstart"),
        (base + k * F.expr("INTERVAL 3 DAYS") + F.expr("INTERVAL 2 DAYS")).alias(
            "tend"
        ),
    )


def regions1(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("id").cast("int")
    return spark.range(10).select(
        k.alias("region_id"),
        (k * 9 % 80).cast("double").alias("rx0"),
        (k * 9 % 80 + 21).cast("double").alias("rx1"),
        (k * 13 % 80).cast("double").alias("ry0"),
        (k * 13 % 80 + 21).cast("double").alias("ry1"),
    )


def regions_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region_id, ring) polygon probe regions — same formula as
    REGIONS_POLY_SQL (identical IEEE doubles: every vertex coordinate
    is an exact multiple of 0.5)."""
    k = F.col("id").cast("int")
    dx = F.array(*[F.lit(d) for d in _POLY_DX])
    dy = F.array(*[F.lit(d) for d in _POLY_DY])
    cx = (k * 9 % 80).cast("double") + F.lit(10.5)
    cy = (k * 13 % 80).cast("double") + F.lit(10.5)
    ring = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.struct(
            (
                cx
                + (6 + (k * 3 + j * 5) % 7) / F.lit(2.0)
                * F.element_at(dx, j + 1).cast("double")
            ).alias("x"),
            (
                cy
                + (6 + (k * 3 + j * 5) % 7) / F.lit(2.0)
                * F.element_at(dy, j + 1).cast("double")
            ).alias("y"),
        ),
    )
    return spark.range(10).select(k.alias("region_id"), ring.alias("ring"))

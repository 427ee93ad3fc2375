"""TPC-H-shaped relational pack (q3/q5/q6/q10/q14) over the synthetic
star schema — widens SURVEY.md §2.0 coverage beyond tpch_q1 with
multi-way join plans that exercise the optimizer story at scale:

- dimension tables (customer/supplier/nation/region/part) travel as
  explicit `F.broadcast` hints — at 100 TB the fact-fact join
  (orders ⋈ lineitem on orderkey) is the only shuffle, hash-partitioned
  on the join key; every dim join is map-side;
- money aggregates are DECIMAL(18,2)-exact and cast to DOUBLE only at
  the output boundary, so Spark and the DuckDB oracle produce
  bit-identical doubles regardless of partial-agg order;
- top-N outputs carry deterministic tiebreakers (key ASC) so LIMIT is
  stable across engines.

Query text follows the public TPC-H specification shapes, adapted to
the driver's synthetic schema (no l_shipmode/o_shippriority columns;
p_type is a single word, so q14's PROMO test is equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .sources import tables as SRC

_DEC = "decimal(18,2)"


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount), DECIMAL-exact."""
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1 - l_discount AS DECIMAL(18,2))"
)


# =====================================================================
# Q3 — shipping priority: 3-way join, decimal top-N
# =====================================================================
@register(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           epoch_us(o_orderdate) AS o_orderdate_us
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY SUM({_SQL_DISC_PRICE}) DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = SRC.load(spark, sf_dir, "customer")
    orders = SRC.load(spark, sf_dir, "orders")
    li = SRC.load(spark, sf_dir, "lineitem")
    cutoff = F.to_timestamp(F.lit("1998-03-15"))
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                cust.filter(F.col("c_mktsegment") == "BUILDING")
                .select("c_custkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            F.unix_micros(F.col("o_orderdate")).alias("o_orderdate_us"),
        )
    )


# =====================================================================
# Q5 — local supplier volume: 6-way join through two paths to nation
# =====================================================================
@register(
    "tpch_q5",
    f"""
    SELECT n_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = SRC.load(spark, sf_dir, "customer")
    orders = SRC.load(spark, sf_dir, "orders")
    li = SRC.load(spark, sf_dir, "lineitem")
    supp = SRC.load(spark, sf_dir, "supplier")
    nation = SRC.load(spark, sf_dir, "nation")
    region = SRC.load(spark, sf_dir, "region")
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("n_name").asc())
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
    )


# =====================================================================
# Q6 — forecast revenue change: pure scan + filter + ungrouped agg
# (the predicate-pushdown benchmark shape)
# =====================================================================
@register(
    "tpch_q6",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * F.col("l_discount").cast(_DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# =====================================================================
# Q10 — returned-item reporting: fact-fact join + customer rollup top-20
# =====================================================================
@register(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY SUM({_SQL_DISC_PRICE}) DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = SRC.load(spark, sf_dir, "customer")
    orders = SRC.load(spark, sf_dir, "orders")
    li = SRC.load(spark, sf_dir, "lineitem")
    nation = SRC.load(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-07-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-10-01")))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey", "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


# =====================================================================
# Q14 — promo revenue share: broadcast part join, conditional agg
# =====================================================================
@register(
    "tpch_q14",
    f"""
    SELECT CAST(100.0 AS DOUBLE) *
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN {_SQL_DISC_PRICE}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS promo_share
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    part = SRC.load(spark, sf_dir, "part")
    joined = li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
            F.lit(0).cast(_DEC)
        )
    ).cast("double")
    total = F.sum(_disc_price()).cast("double")
    return joined.agg(
        (F.lit(100.0).cast("double") * promo / total).alias("promo_share")
    )


# =====================================================================
# Q18 — large-volume customers: high-cardinality shuffle agg (every
# orderkey is a group) + semi-join back to the facts
# =====================================================================
@register(
    "tpch_q18",
    """
    SELECT c_name, o_custkey, o_orderkey,
           epoch_us(o_orderdate) AS o_orderdate_us,
           o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB stress shape: a groupBy whose key cardinality is the
    fact table's (one group per orderkey — partial map-side combine
    carries the load), then a semi-join of the qualifying keys back to
    the facts. l_quantity values are integral, so the double sums are
    order-independent."""
    cust = SRC.load(spark, sf_dir, "customer")
    orders = SRC.load(spark, sf_dir, "orders")
    li = SRC.load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .filter(F.col("_tq") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_bk"),
                F.col("l_orderkey") == F.col("_bk"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            "c_name", "o_custkey", "o_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("o_orderdate_us"),
            "o_totalprice", "sum_qty",
        )
    )

"""TPC-H-shaped relational pack, part 2 (q4/q7/q8/q9/q12/q13/q15/q16/
q17/q19/q22 adapted to the driver's synthetic schema) — completes the
SURVEY.md §2.0 relational story with the join/subquery shapes part 1
doesn't cover:

- correlated EXISTS / NOT EXISTS         → left-semi / left-anti joins
  (q4, q16, q22) with compound non-equi conditions;
- LEFT OUTER JOIN + double aggregation   → q13 customer distribution;
- scalar subquery against a derived view → q15 (window-free max via a
  broadcast 1-row aggregate, so the revenue CTE is computed once);
- correlated scalar average              → q17 (per-part avg as a
  map-side broadcast join — the 100 TB plan for correlated aggregates);
- disjunctive multi-range predicates     → q19 (Catalyst pushes the
  OR-of-ANDs to the parquet scan as one residual filter);
- two-path nation joins + market share   → q7/q8/q9 conditional aggs.

Schema adaptations (the synthetic tables lack partsupp, l_shipmode,
l_commitdate, c_phone): q9 prices cost as p_retailprice*l_quantity,
q12 classifies by o_orderpriority over l_linestatus groups, q16 derives
the part→supplier relation from lineitem, q22 keys on c_mktsegment and
uses a narrow order window for the anti-join (every customer has SOME
order at these row counts — the window keeps the anti-join selective
both ways).

Determinism rules (same as part 1): money sums are DECIMAL(18,2)-exact
and cast to DOUBLE only at the output boundary; quantity sums/averages
are integral doubles (exact under any summation order); top-N carries
key tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .sources import tables as SRC
from .tpch import _DEC, _SQL_DISC_PRICE, _disc_price


def _ts(s: str) -> F.Column:
    return F.to_timestamp(F.lit(s))


# =====================================================================
# Q4 — order priority checking: correlated EXISTS → left-semi join
# with a non-equi residual (l_shipdate > o_orderdate)
# =====================================================================
@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = SRC.load(spark, sf_dir, "orders")
    li = SRC.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1997-04-01"))
        )
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# =====================================================================
# Q7 — volume shipping: the two-path nation join (supplier nation vs
# customer nation) with a symmetric pair filter
# =====================================================================
@register(
    "tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               {_SQL_DISC_PRICE} AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    orders = SRC.load(spark, sf_dir, "orders")
    supp = SRC.load(spark, sf_dir, "supplier")
    cust = SRC.load(spark, sf_dir, "customer")
    nation = SRC.load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).alias("_rev"))
        .orderBy("supp_nation", "cust_nation", "l_year")
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.col("_rev").cast("double").alias("revenue"),
        )
    )


# =====================================================================
# Q8 — national market share: conditional share aggregate over a
# region-filtered customer path and an unfiltered supplier path
# =====================================================================
@register(
    "tpch_q8",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               {_SQL_DISC_PRICE} AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    orders = SRC.load(spark, sf_dir, "orders")
    part = SRC.load(spark, sf_dir, "part")
    supp = SRC.load(spark, sf_dir, "supplier")
    cust = SRC.load(spark, sf_dir, "customer")
    nation = SRC.load(spark, sf_dir, "nation")
    region = SRC.load(spark, sf_dir, "region")
    america_nations = F.broadcast(
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
        )
    )
    vol = _disc_price()
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")
                        .select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(america_nations, F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_nation, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("nation") == "NATION_3", vol)
                .otherwise(F.lit(0).cast(_DEC))
            ).cast("double").alias("_n"),
            F.sum(vol).cast("double").alias("_d"),
        )
        .orderBy("o_year")
        .select("o_year", (F.col("_n") / F.col("_d")).alias("mkt_share"))
    )


# =====================================================================
# Q9 — product-type profit (cost priced as retailprice × quantity —
# no partsupp table in the synthetic schema)
# =====================================================================
@register(
    "tpch_q9",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               {_SQL_DISC_PRICE} -
               CAST(p_retailprice AS DECIMAL(18,2)) *
               CAST(l_quantity AS DECIMAL(18,2)) AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%ring%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    orders = SRC.load(spark, sf_dir, "orders")
    part = SRC.load(spark, sf_dir, "part")
    supp = SRC.load(spark, sf_dir, "supplier")
    nation = SRC.load(spark, sf_dir, "nation")
    amount = _disc_price() - (
        F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    )
    return (
        li.join(
            F.broadcast(
                part.filter(F.col("p_name").like("%ring%"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select(
                "n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).alias("_p"))
        .orderBy("nation", "o_year")
        .select("nation", "o_year", F.col("_p").cast("double").alias("sum_profit"))
    )


# =====================================================================
# Q12 — priority classes per line status: fact-fact join + dual
# conditional counts (adapted: classify by o_orderpriority)
# =====================================================================
@register(
    "tpch_q12",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                          AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = SRC.load(spark, sf_dir, "orders")
    li = SRC.load(spark, sf_dir, "lineitem")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# =====================================================================
# Q13 — customer order-count distribution: LEFT OUTER join with an
# extra join-side predicate, then a second aggregation over the counts
# =====================================================================
@register(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = SRC.load(spark, sf_dir, "customer")
    orders = SRC.load(spark, sf_dir, "orders")
    return (
        cust.select("c_custkey")
        .join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT")
            .select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# =====================================================================
# Q15 — top supplier: derived revenue view + scalar MAX subquery.
# The revenue aggregate is computed once and reused for both the rows
# and the max (no double evaluation — the 1-row max travels broadcast).
# =====================================================================
@register(
    "tpch_q15",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_SQL_DISC_PRICE}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    supp = SRC.load(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("_tr"))
    )
    # DECIMAL equality against the broadcast 1-row max is exact
    best = revenue.agg(F.max("_tr").alias("_best"))
    return (
        revenue.join(F.broadcast(best), F.col("_tr") == F.col("_best"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name",
                F.col("_tr").cast("double").alias("total_revenue"))
    )


# =====================================================================
# Q16 — supplier count by part attributes: NOT IN → left-anti join +
# COUNT(DISTINCT) over the lineitem-derived part→supplier relation
# =====================================================================
@register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    part = SRC.load(spark, sf_dir, "part")
    supp = SRC.load(spark, sf_dir, "supplier")
    bad_supp = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# =====================================================================
# Q17 — small-quantity-order revenue: correlated per-part average →
# broadcast per-part aggregate join (the scalable correlated-agg plan)
# =====================================================================
@register(
    "tpch_q17",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_quantity is integral (1..50) so AVG is an exact double under
    any partial-aggregation order; the 0.2× threshold is therefore
    bit-identical between Spark and the oracle."""
    li = SRC.load(spark, sf_dir, "lineitem")
    part = SRC.load(spark, sf_dir, "part")
    brand_parts = F.broadcast(
        part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    )
    # per-part average computed over ALL lineitem rows of that part
    # (correlation is on partkey only), then broadcast to the facts
    per_part_avg = F.broadcast(
        li.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("ap_key"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("_thresh"))
    )
    return (
        li.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("_thresh"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
             / F.lit(7.0)).cast("double").alias("avg_yearly")
        )
    )


# =====================================================================
# Q19 — discounted revenue: disjunctive multi-range predicates
# (brand × size × quantity bands) pushed through a broadcast part join
# =====================================================================
@register(
    "tpch_q19",
    f"""
    SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
            AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 20 AND l_quantity <= 30))
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    part = SRC.load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5) & (q >= 1) & (q <= 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10) & (q >= 10) & (q <= 20)
    ) | (
        (F.col("p_brand") == "Brand#14")
        & F.col("p_size").between(1, 15) & (q >= 20) & (q <= 30)
    )
    return (
        li.join(
            F.broadcast(
                part.filter(F.col("p_brand").isin(
                    "Brand#12", "Brand#13", "Brand#14"))
                .select("p_partkey", "p_brand", "p_size")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(band)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# =====================================================================
# Q22 — dormant high-balance customers: above-average balance filter +
# NOT EXISTS over a narrow order window → left-anti join
# =====================================================================
@register(
    "tpch_q22",
    """
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
      AND c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer
            WHERE c_acctbal > 0.0
              AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY'))
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = SRC.load(spark, sf_dir, "customer")
    orders = SRC.load(spark, sf_dir, "orders")
    segs = cust.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    )
    avg_bal = segs.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    window_orders = orders.filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    ).select("o_custkey")
    return (
        segs.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(window_orders, F.col("c_custkey") == F.col("o_custkey"),
              "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# =====================================================================
# Q2 — min-cost supplier (adapted: the part→supplier relation derives
# from lineitem, "cost" is s_acctbal): correlated MIN subquery → window
# min over the candidate relation, then re-join for attributes
# =====================================================================
@register(
    "tpch_q2",
    """
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
        FROM lineitem
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part, ps, eu
    WHERE p_partkey = ps.partkey AND eu.s_suppkey = ps.suppkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND s_acctbal = (
            SELECT MIN(eu2.s_acctbal)
            FROM ps ps2, eu eu2
            WHERE ps2.partkey = p_partkey AND eu2.s_suppkey = ps2.suppkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-MIN plan for scale: the candidate (part, supplier,
    acctbal) relation is built once, the per-part minimum is a window
    over it (one shuffle on partkey), and the equality filter replaces
    the per-row subquery — no re-evaluation of the subquery tree."""
    from pyspark.sql.window import Window

    li = SRC.load(spark, sf_dir, "lineitem")
    part = SRC.load(spark, sf_dir, "part")
    supp = SRC.load(spark, sf_dir, "supplier")
    nation = SRC.load(spark, sf_dir, "nation")
    region = SRC.load(spark, sf_dir, "region")
    eu = F.broadcast(
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    cand = ps.join(eu, F.col("suppkey") == F.col("s_suppkey"))
    best = cand.withColumn(
        "_mn", F.min("s_acctbal").over(Window.partitionBy("partkey"))
    ).filter(F.col("s_acctbal") == F.col("_mn"))
    return (
        best.join(
            F.broadcast(
                part.filter(
                    (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
                ).select("p_partkey", "p_type")
            ),
            F.col("partkey") == F.col("p_partkey"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
    )


# =====================================================================
# Q21 — suppliers who kept orders waiting (adapted: l_returnflag = 'R'
# stands in for the late-delivery flag): the double-correlated
# EXISTS + NOT EXISTS shape → left-semi then left-anti join
# =====================================================================
@register(
    "tpch_q21",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    orders = SRC.load(spark, sf_dir, "orders")
    supp = SRC.load(spark, sf_dir, "supplier")
    nation = SRC.load(spark, sf_dir, "nation")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    wanted = F.broadcast(
        supp.join(
            F.broadcast(
                nation.filter(
                    F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name")
    )
    return (
        waited.join(wanted, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# =====================================================================
# Q11 — important stock (adapted: value = discounted lineitem revenue
# per part for one nation's suppliers): per-group agg filtered against
# a GLOBAL aggregate fraction — the scalar-in-HAVING shape
# =====================================================================
@register(
    "tpch_q11",
    f"""
    WITH v AS (
        SELECT l_partkey, {_SQL_DISC_PRICE} AS val
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_4'
    )
    SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS value
    FROM v GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE) >
           (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM v)
    ORDER BY value DESC, l_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global-threshold plan: the value relation is computed once,
    aggregated per part AND in total (broadcast 1-row scalar), and the
    HAVING becomes a filter against the broadcast — the per-part
    partial aggregation carries the load at scale."""
    li = SRC.load(spark, sf_dir, "lineitem")
    supp = SRC.load(spark, sf_dir, "supplier")
    nation = SRC.load(spark, sf_dir, "nation")
    nation4_supps = F.broadcast(
        supp.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_4")
                        .select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    v = li.join(
        nation4_supps, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    ).select("l_partkey", _disc_price().alias("val"))
    per_part = v.groupBy("l_partkey").agg(
        F.sum("val").cast("double").alias("value")
    )
    total = v.agg((F.sum("val").cast("double") * F.lit(0.001)).alias("_thr"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("_thr"))
        .orderBy(F.col("value").desc(), "l_partkey")
        .select("l_partkey", "value")
    )


# =====================================================================
# Q20 — potential part promotion (adapted): nested IN over a grouped
# HAVING aggregate → semi-join against the derived agg relation
# =====================================================================
@register(
    "tpch_q20",
    """
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem, part
            WHERE l_partkey = p_partkey AND p_name LIKE '%ring%'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > 50)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = SRC.load(spark, sf_dir, "lineitem")
    part = SRC.load(spark, sf_dir, "part")
    supp = SRC.load(spark, sf_dir, "supplier")
    nation = SRC.load(spark, sf_dir, "nation")
    heavy = (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%ring%"))
                        .select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_5")
                        .select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_name")
        .select("s_name", "s_acctbal")
    )

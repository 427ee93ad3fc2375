"""Market-basket analysis: pairwise item co-occurrence with support
pruning and exact lift.

The A-priori first level expressed as Catalyst joins: distinct
(basket, item) pairs self-join on the basket key (item_a < item_b),
co-occurrence counts filter on minimum support, and lift comes from
the broadcast item margins.

Scale shape (100 TB): the self-join's work is sum over baskets of
(basket size)², so `max_basket` drops degenerate mega-baskets BEFORE
the join (the basket analog of the n-gram df-cap — one 1M-item basket
is a 10^12-pair bucket). Margins and the basket count are tiny
aggregates broadcast into the final projection; support pruning
happens in the pair aggregate itself, never materializing sub-support
pairs downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pair_rules", "item_cosine"]


def pair_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 1000,
    min_support_frac: float | None = None,
) -> DataFrame:
    """Frequent item PAIRS with exact lift: (item_a, item_b, n_co,
    lift_micro) for every unordered pair co-occurring in at least
    `min_support` baskets; lift = n_baskets * n_co / (n_a * n_b),
    micro-quantized. Baskets larger than `max_basket` items are
    dropped before the self-join.

    `min_support_frac` raises the threshold to
    max(min_support, ceil(frac * n_baskets)) — the scale-invariant
    RELATIVE support production A-priori uses, so output stays
    "genuinely frequent pairs" as the corpus grows instead of
    everything that repeats twice."""
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    sizes = items.groupBy("b").agg(F.count(F.lit(1)).alias("bn"))
    items = items.join(sizes, "b").where(
        F.col("bn") <= max_basket
    ).select("b", "i")
    margins = items.groupBy("i").agg(F.count(F.lit(1)).alias("m"))
    n_baskets = items.select("b").distinct().agg(
        F.count(F.lit(1)).alias("nb")
    )
    a = items.select("b", F.col("i").alias("item_a"))
    bb = items.select(F.col("b").alias("b2"), F.col("i").alias("item_b"))
    co = (
        a.join(bb, (a["b"] == bb["b2"]) & (a["item_a"] < bb["item_b"]))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    if min_support_frac is not None:
        co = co.crossJoin(F.broadcast(n_baskets)).where(
            F.col("n_co")
            >= F.greatest(
                F.lit(min_support),
                F.ceil(F.lit(min_support_frac) * F.col("nb")),
            )
        ).drop("nb")
    else:
        co = co.where(F.col("n_co") >= min_support)
    ma = margins.select(F.col("i").alias("item_a"), F.col("m").alias("m_a"))
    mb = margins.select(F.col("i").alias("item_b"), F.col("m").alias("m_b"))
    return (
        co.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_co",
            F.round(
                F.lit(1e6)
                * (F.col("nb") * F.col("n_co"))
                / (F.col("m_a") * F.col("m_b")).cast("double")
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
        .orderBy("item_a", "item_b")
    )


def item_cosine(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int = 2,
    max_basket: int = 1000,
    min_co_frac: float | None = None,
) -> DataFrame:
    """Item-item cosine similarity over basket co-occurrence — the
    collaborative-filtering neighbor table: for items a, b with basket
    sets A, B, cosine = |A ∩ B| / sqrt(|A| * |B|). Returns (item_a,
    item_b, n_co, n_a, n_b, cos_micro) with item_a < item_b and
    n_co >= min_co.

    The hashed score is micro-quantized from one fixed-order IEEE
    chain n_co / sqrt(n_a * n_b) where every operand is an exact
    BIGINT, so both engines compute the identical double. Same scale
    guards as pair_rules: mega-baskets dropped BEFORE the self-join,
    margins joined on the item key (AQE broadcasts a dim-sized item
    vocabulary on its own); `min_co_frac` raises the threshold to
    max(min_co, ceil(frac * n_baskets)) — the scale-invariant RELATIVE
    support that keeps the neighbor table "genuinely co-bought pairs"
    as the corpus grows."""
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    sizes = items.groupBy("b").agg(F.count(F.lit(1)).alias("bn"))
    items = items.join(sizes, "b").where(
        F.col("bn") <= max_basket
    ).select("b", "i")
    margins = items.groupBy("i").agg(F.count(F.lit(1)).alias("m"))
    a = items.select("b", F.col("i").alias("item_a"))
    bb = items.select(F.col("b").alias("b2"), F.col("i").alias("item_b"))
    co = (
        a.join(bb, (a["b"] == bb["b2"]) & (a["item_a"] < bb["item_b"]))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    if min_co_frac is not None:
        n_baskets = items.select("b").distinct().agg(
            F.count(F.lit(1)).alias("nb")
        )
        co = co.crossJoin(F.broadcast(n_baskets)).where(
            F.col("n_co")
            >= F.greatest(
                F.lit(min_co),
                F.ceil(F.lit(min_co_frac) * F.col("nb")),
            )
        ).drop("nb")
    else:
        co = co.where(F.col("n_co") >= min_co)
    ma = margins.select(F.col("i").alias("item_a"), F.col("m").alias("n_a"))
    mb = margins.select(F.col("i").alias("item_b"), F.col("m").alias("n_b"))
    return (
        co.join(ma, "item_a")
        .join(mb, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_co").cast("bigint").alias("n_co"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.lit(1e6) * F.col("n_co")
                / F.sqrt(F.col("n_a").cast("double") * F.col("n_b")),
            ).cast("bigint").alias("cos_micro"),
        )
    )

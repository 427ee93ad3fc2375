"""Bloom-filter semi-join reduction: shrink the big side of a
selective join BEFORE it shuffles, using a fixed-size broadcast
bitmap built from the dimension keys.

Why this exists (100 TB): a semi-join against a 100M-key dimension
cannot broadcast the keys (800 MB+), so it sort-merge-shuffles the
full fact table — even though only a few percent of fact rows
survive. A Bloom bitmap of m=2^23 bits is 1 MB regardless of key
count: broadcast it, drop non-matching fact rows at scan speed, and
only the survivors (matches + the filter's false-positive sliver)
enter the exact join that guarantees correctness. This is the
explicit, tunable form of what AQE's runtime row-group filters do
opportunistically; making it an operator lets a pipeline pin it on
joins the optimizer can't see through (e.g. after a UDF-derived key).

The bitmap is exact-deterministic: j hash positions per key via
xxhash64(key, seed) mod m, words of 32 bits packed into BIGINTs (a
64-bit pack would need bit 63 — sign trouble in both engines), OR-ed
by one groupBy. Membership probing is j broadcast equi-joins on the
word index + a bitwise AND — all JVM expressions inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key, m_bits: int, seeds: tuple[int, ...]) -> list:
    return [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)) for s in seeds
    ]


def bloom_build(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 20,
    seeds: tuple[int, ...] = (101, 202),
) -> DataFrame:
    """Build the bitmap as a (word, bits) table: word = position//32,
    bits = OR of 2^(position%32). One explode + one groupBy; the
    result has at most m_bits/32 rows (32k at the 1-Mbit default) —
    broadcastable at any dimension cardinality."""
    pos = dim.select(
        F.explode(
            F.array(*_positions(F.col(key_col), m_bits, seeds))
        ).alias("pos")
    )
    return (
        pos.select(
            ((F.col("pos") - F.pmod(F.col("pos"), F.lit(32))) / 32)
            .cast("long")
            .alias("word"),
            F.pow(F.lit(2.0), F.pmod(F.col("pos"), F.lit(32)))
            .cast("long")
            .alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_semi_join(
    big: DataFrame,
    dim: DataFrame,
    big_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    seeds: tuple[int, ...] = (101, 202),
) -> DataFrame:
    """EXACT semi-join of `big` against `dim` keys, with a Bloom
    bitmap prefilter: rows whose j probe bits aren't all set are
    dropped before the exact semi equi-join runs (false positives
    pass the filter and are removed by the join; false negatives are
    impossible). Returns the surviving `big` rows."""
    words = bloom_build(dim, dim_key, m_bits, seeds)
    probe = big
    cond = None
    for i, s in enumerate(seeds):
        p = F.pmod(F.xxhash64(F.col(big_key), F.lit(s)), F.lit(m_bits))
        probe = probe.withColumn(
            f"_w{i}",
            ((p - F.pmod(p, F.lit(32))) / 32).cast("long"),
        ).withColumn(
            f"_b{i}",
            F.pow(F.lit(2.0), F.pmod(p, F.lit(32))).cast("long"),
        )
        w = F.broadcast(
            words.select(
                F.col("word").alias(f"_w{i}"),
                F.col("bits").alias(f"_bits{i}"),
            )
        )
        probe = probe.join(w, f"_w{i}", "left")
        c = F.col(f"_bits{i}").isNotNull() & (
            F.col(f"_bits{i}").bitwiseAND(F.col(f"_b{i}")) != 0
        )
        cond = c if cond is None else (cond & c)
    filtered = probe.where(cond).drop(
        *[f"_{p}{i}" for i in range(len(seeds)) for p in ("w", "b", "bits")]
    )
    return filtered.join(
        dim.select(F.col(dim_key).alias(big_key)).distinct(),
        big_key,
        "semi",
    )

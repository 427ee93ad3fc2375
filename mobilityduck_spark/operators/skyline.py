"""Skyline (Pareto-frontier) operator: the rows not dominated by any
other row — here specialized to the classic 2-D case (minimize x,
maximize y), the shape that covers "cheapest for its size" / "fastest
for its cost" product queries.

Scale shape (100 TB): the textbook two-phase distributed skyline.
Phase 1 computes a LOCAL skyline inside each of n_parts hash
partitions with two window functions (no joins): a row is locally
dominated iff some strictly-cheaper row in its partition has y >= its
y (RANGE frame to x-1 on the integer x), or some equal-x row has a
strictly larger y. Local domination implies global domination, so
phase 1 never removes a skyline row; it shrinks each partition to its
frontier (O(log n) rows for independent dims). Phase 2 reruns the
same two windows globally over the surviving ~n_parts * |frontier|
rows — a bounded single-partition window, the same "survivors are
small" contract as the global top-k merge. No self-join, no
NOT-EXISTS anti-join over the full table (the oracle formulation —
quadratic and unshippable at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prune_dominated(df: DataFrame, part_cols: list) -> DataFrame:
    """Drop rows dominated within each partition of `part_cols`
    (global when empty): dominated iff a strictly-smaller-x row has
    y >= mine, or an equal-x row has y > mine."""
    w_lt = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("_x"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*part_cols, "_x")
    return (
        df.withColumn("_m1", F.max("_y").over(w_lt))
        .withColumn("_m2", F.max("_y").over(w_eq))
        .where(
            (F.col("_m1").isNull() | (F.col("_m1") < F.col("_y")))
            & (F.col("_m2") <= F.col("_y"))
        )
        .drop("_m1", "_m2")
    )


def skyline_min_max(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_parts: int = 32,
) -> DataFrame:
    """Exact 2-D skyline: rows r such that no other row has
    (x <= r.x, y >= r.y) with at least one strict. `x_col`/`y_col`
    must be integer-valued columns (quantize floats to cents/micros
    first — exact frames need exact keys). Ties on both dims are all
    kept (neither dominates). Returns the input columns of the
    surviving rows."""
    base = df.withColumn(
        "_x", F.col(x_col).cast("long")
    ).withColumn("_y", F.col(y_col).cast("long"))
    local = _prune_dominated(
        base.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts))
        ),
        ["_salt"],
    ).drop("_salt")
    return _prune_dominated(local, []).drop("_x", "_y")

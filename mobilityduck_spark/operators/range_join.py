"""Interval-overlap (range) joins.

The reference executes `t.Trip && p.Period` joins as BLOCKWISE_NL_JOIN /
CROSS_PRODUCT with one C call per pair (SURVEY.md §2.0). Here the
predicate expands to range comparisons, and we pick the physical
strategy explicitly:

- broadcast theta-join when one side is small (Catalyst turns the range
  predicate into BroadcastNestedLoopJoin with an early filter);
- bucketed equi-join for large×large: explode each interval into the
  fixed-width time buckets it covers, equi-join on bucket id (a plain
  shuffled hash join that partitions evenly), then post-filter the exact
  overlap and drop bucket-duplicated pairs by keeping the pair only in
  the FIRST shared bucket. At 100 TB this is the plan that survives:
  shuffle keys are bucket ids (bounded skew for bounded interval length),
  no cartesian blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import span as S


def broadcast_overlap_join(
    big: DataFrame, small: DataFrame, big_span: Column, small_span: Column
) -> DataFrame:
    """Small-side broadcast; exact inclusive-bound overlap predicate."""
    return big.join(F.broadcast(small), on=S.overlaps(big_span, small_span))


def bucketed_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width_secs: int = 86400,
) -> DataFrame:
    """Large×large interval join without a cartesian product.

    Each row explodes to its covered bucket ids; the equi-join on bucket
    id shuffles both sides on the same key; the exact `[lo, hi)` overlap
    plus a first-shared-bucket guard dedups pairs. Returns left.* ++
    right.* for overlapping pairs.
    """
    w = F.lit(bucket_width_secs)

    # floor, not cast('long'): cast truncates toward zero, so pre-1970
    # timestamps would bucket off-by-one and disagree with first_shared
    def bucket_of(c: str):
        return F.floor(F.unix_seconds(F.col(c)) / w).cast("long")

    def with_buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_bucket", F.explode(F.sequence(bucket_of(lo), bucket_of(hi)))
        )

    lb = with_buckets(left, left_lo, left_hi)
    rb = with_buckets(right, right_lo, right_hi).withColumnRenamed(
        "_bucket", "_rbucket"
    )
    exact = (F.col(left_lo) < F.col(right_hi)) & (F.col(right_lo) < F.col(left_hi))
    # keep each overlapping pair only in the first bucket both cover
    first_shared = F.col("_bucket") == F.greatest(
        bucket_of(left_lo), bucket_of(right_lo)
    )
    return (
        lb.join(rb, lb["_bucket"] == rb["_rbucket"])
        .filter(exact & first_shared)
        .drop("_bucket", "_rbucket")
    )

"""Streaming twin of the incremental rollup (operators/events.py
incremental_rollup_merge): the SAME keyed partial aggregate runs as an
unbounded streaming aggregation — Spark's state store plays the role of
the stored snapshot, each micro-batch plays the delta, and the merge is
the engine's own partial-aggregate combine (COUNT / micro-SUM are the
identical commutative monoids). Parity test drives one event set
through both paths (tests/test_streaming_rollup.py).

Scale shape: state is |distinct key tuples| rows — domain-sized, not
input-sized; no watermark is needed because the rollup is cumulative
over all time (a retention-bounded deployment adds one and a window
key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_stream(
    events: DataFrame,
    keys: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Cumulative per-key rollup usable on a batch OR streaming frame:
    (keys..., n_events, sum_micro) with exact integer sums. On a
    stream, run with outputMode complete/update — the state store
    maintains exactly the snapshot the batch merge materializes."""
    return (
        events.where(F.col(value_col).isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.round(F.col(value_col) * F.lit(1e6)).cast("long")
            ).cast("bigint").alias("sum_micro"),
        )
    )

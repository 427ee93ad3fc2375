"""Streaming joins: stream-static enrichment and the watermarked
stream-stream interval self-join.

Same batch/streaming duality as windows.py — the transformations are
identical DataFrame code; `streaming=True` adds the watermarks that
bound join state. At 100 TB-equivalent stream volume:

- stream-static: the dim side broadcasts (re-resolved per micro-batch
  by Structured Streaming, so slowly-changing dims pick up updates for
  free); the stream side is never shuffled.
- stream-stream: BOTH sides carry watermarks and the join condition
  carries an explicit event-time interval bound — without both, Spark
  must buffer unbounded state. The interval bound is what lets the
  state store evict rows older than watermark + interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    watermark: str = "30 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Stream-static equi-join: every event picks up its dimension
    attributes. The static side is broadcast; left join keeps events
    with no dim row (nulls), matching the batch semantics exactly."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return src.join(F.broadcast(dim), on, "left")


def interval_self_join(
    events: DataFrame,
    interval_secs: int = 300,
    watermark: str = "30 minutes",
    streaming: bool = True,
    id_col: str = "event_id",
    key_col: str = "user_id",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Pairs of events from the SAME key within `interval_secs` of each
    other (a < b orders the pair; the earlier event is `a`). The
    canonical correlation shape: \"which events of a user happened
    within 5 minutes of each other\".

    Streaming requirements baked in: watermark on BOTH inputs and a
    TWO-SIDED range predicate on the event-time columns — the
    combination Structured Streaming needs to bound the join state
    store. Pair order is by id, so gap_us is signed. Returns
    (key, id_a, id_b, gap_us).

    `how="left_outer"` additionally emits events that found NO partner
    (null id_b/gap_us). Under streaming, outer rows can only be emitted
    once the watermark proves no partner can still arrive — so a left
    row surfaces ~(watermark delay + interval) of event time after its
    timestamp, and rows newer than that at query end are withheld, not
    dropped incorrectly (exactly Spark's outer stream-stream join
    contract). Batch mode emits all outer rows immediately."""
    a = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id_a"),
        F.col(ts_col).alias("ts_a"),
    )
    b = events.select(
        F.col(key_col).alias("k2"),
        F.col(id_col).alias("id_b"),
        F.col(ts_col).alias("ts_b"),
    )
    if streaming:
        a = a.withWatermark("ts_a", watermark)
        b = b.withWatermark("ts_b", watermark)
    cond = (
        (F.col("k") == F.col("k2"))
        & (F.col("id_a") < F.col("id_b"))
        & (
            F.col("ts_b")
            >= F.col("ts_a") - F.expr(f"INTERVAL {interval_secs} SECONDS")
        )
        & (
            F.col("ts_b")
            <= F.col("ts_a") + F.expr(f"INTERVAL {interval_secs} SECONDS")
        )
    )
    return a.join(b, cond, how).select(
        F.col("k").alias(key_col),
        "id_a",
        "id_b",
        (F.unix_micros(F.col("ts_b")) - F.unix_micros(F.col("ts_a"))).alias(
            "gap_us"
        ),
    )

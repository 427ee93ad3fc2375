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
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-static equi-join: every event picks up its dimension
    attributes. The static side is broadcast; left join keeps events
    with no dim row (nulls), matching the batch semantics exactly."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
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
    contract). Batch mode emits all outer rows immediately.

    Scale shape (inner, and batch outer): joining on the key ALONE
    builds O(per-key-count²) intermediate pairs and filters time
    afterwards — measured 17× wall at 10× data in the sf1 sweep (the
    quadratic density law). The left side therefore explodes into its
    interval-width time bucket ±1 and the join is EQUI on
    (key, bucket): any partner within ±interval lives in exactly one
    of those three buckets (the right bucket is fixed, so no duplicate
    pairs), and intermediates are bounded by local per-bucket density —
    linear in data at fixed event rate. Batch left-outer = bucketed
    inner ∪ anti-join of unpartnered events (exploding the left side
    of a real outer join would triple its null rows). Streaming
    left-outer keeps the plain two-sided range join: Spark's outer
    state machinery tracks match bits per buffered row, and its state
    is already watermark + interval bounded."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"interval_self_join: unsupported how={how!r}")
    rng_lo = F.col("ts_b") >= F.col("ts_a") - F.expr(
        f"INTERVAL {interval_secs} SECONDS"
    )
    rng_hi = F.col("ts_b") <= F.col("ts_a") + F.expr(
        f"INTERVAL {interval_secs} SECONDS"
    )
    base = (F.col("k") == F.col("k2")) & (F.col("id_a") < F.col("id_b"))

    def sides(with_bucket: bool):
        w_us = interval_secs * 1_000_000
        bk = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(w_us)).cast("long")
        a_cols = [
            F.col(key_col).alias("k"),
            F.col(id_col).alias("id_a"),
            F.col(ts_col).alias("ts_a"),
        ]
        b_cols = [
            F.col(key_col).alias("k2"),
            F.col(id_col).alias("id_b"),
            F.col(ts_col).alias("ts_b"),
        ]
        if with_bucket:
            a_cols.append(F.explode(F.array(bk - 1, bk, bk + 1)).alias("bk"))
            b_cols.append(bk.alias("bk_b"))
        a, b = events.select(*a_cols), events.select(*b_cols)
        if streaming:
            a = a.withWatermark("ts_a", watermark)
            b = b.withWatermark("ts_b", watermark)
        return a, b

    def project(joined: DataFrame) -> DataFrame:
        return joined.select(
            F.col("k").alias(key_col),
            "id_a",
            "id_b",
            (
                F.unix_micros(F.col("ts_b")) - F.unix_micros(F.col("ts_a"))
            ).alias("gap_us"),
        )

    if streaming and how == "left_outer":
        a, b = sides(with_bucket=False)
        return project(a.join(b, base & rng_lo & rng_hi, "left_outer"))

    a, b = sides(with_bucket=True)
    inner = project(
        a.join(b, base & (F.col("bk") == F.col("bk_b")) & rng_lo & rng_hi)
    )
    if how == "inner":
        return inner
    # barrier: `inner` feeds both union branches (rows + the anti-join's
    # matched-id set) — without it the bucketed self-join DAG executes
    # twice per action (batch-only path; checkpoint is legal here)
    inner = inner.localCheckpoint(eager=False)
    outer = events.join(
        inner.select("id_a").distinct(),
        events[id_col] == F.col("id_a"),
        "left_anti",
    ).select(
        F.col(key_col),
        F.col(id_col).alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.lit(None).cast("long").alias("gap_us"),
    )
    return inner.unionByName(outer)

"""Streaming soak: run the watermarked interval self-join and the
session-window operator as REAL Structured Streaming jobs against a
rate source at sf0.1-equivalent volume, and record state-store size vs
watermark progress — evidence that join/session state is bounded by the
watermark (not by total input), beyond what the unit tests show.

Rate source → event shape: event_id = value, user_id = value % 199,
event time = 2024-01-01 + value seconds (1 event per event-second, so
N rowsPerSecond advances event time N seconds per wall second — the
watermark races ahead and state eviction is exercised continuously).

Expected steady state (inner interval join, interval=300s, watermark
30 min): each side buffers ~(watermark + interval) = 2100 event-seconds
of rows ≈ 2100 rows/side (×3 for the bucket-exploded left side) — FLAT
over the run while total input grows linearly. Sessions: open sessions
bounded by distinct keys with events younger than watermark + gap.

Usage: python scripts/streaming_soak.py [rows_per_sec] [seconds]
Prints one status line per sample and a PERF.md-ready summary table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mobilityduck_spark.session import get_spark  # noqa: E402
from mobilityduck_spark.streaming.joins import interval_self_join  # noqa: E402
from mobilityduck_spark.streaming.windows import session_spans_stream  # noqa: E402


def rate_events(spark, rows_per_sec: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("value").alias("event_id"),
            (F.col("value") % 199).alias("user_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_dt_interval(secs=F.col("value").cast("double"))
            ).alias("ts"),
        )
    )


def sample_progress(q, label: str, samples: list):
    p = q.lastProgress
    if not p or not p.get("stateOperators"):
        return
    ops = p["stateOperators"]
    total_state = sum(o.get("numRowsTotal", 0) for o in ops)
    wm = p.get("eventTime", {}).get("watermark", "-")
    rows_in = p.get("numInputRows", 0)
    samples.append(
        {
            "t": time.time(),
            "batch": p.get("batchId"),
            "state_rows": total_state,
            "watermark": wm,
            "input_rows": rows_in,
        }
    )
    print(
        f"  [{label}] batch={p.get('batchId')} input={rows_in} "
        f"state_rows={total_state} watermark={wm}",
        flush=True,
    )


def run_soak(spark, name: str, df, seconds: int) -> list:
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", f"/tmp/soak_ckpt_{name}_{os.getpid()}")
        .outputMode("append")
        .start()
    )
    samples: list = []
    t0 = time.time()
    try:
        last_batch = -1
        while time.time() - t0 < seconds:
            time.sleep(2)
            p = q.lastProgress
            if p and p.get("batchId") != last_batch:
                last_batch = p.get("batchId")
                sample_progress(q, name, samples)
    finally:
        q.stop()
    return samples


def summarize(name: str, rows_per_sec: int, samples: list):
    with_state = [s for s in samples if s["state_rows"] > 0]
    if not with_state:
        print(f"{name}: no state samples captured")
        return
    mid = len(with_state) // 2
    first_half = max(s["state_rows"] for s in with_state[: mid or 1])
    second_half = max(s["state_rows"] for s in with_state[mid:])
    peak = max(s["state_rows"] for s in with_state)
    total_in = sum(s["input_rows"] for s in samples)
    print(
        f"SUMMARY {name}: rate={rows_per_sec}/s total_input={total_in} "
        f"peak_state={peak} max_state_1st_half={first_half} "
        f"max_state_2nd_half={second_half} "
        f"growth_ratio={second_half / max(first_half, 1):.2f}"
    )


def main():
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark("streaming_soak")
    spark.sparkContext.setLogLevel("ERROR")

    ev = rate_events(spark, rows_per_sec)
    print(f"-- interval join soak ({rows_per_sec} rows/s, {seconds}s) --")
    j = interval_self_join(
        ev, interval_secs=300, watermark="30 minutes", streaming=True
    )
    js = run_soak(spark, "interval_join", j, seconds)

    print(f"-- sessionization soak ({rows_per_sec} rows/s, {seconds}s) --")
    s = session_spans_stream(
        ev, gap="30 minutes", watermark="1 hour", streaming=True
    )
    ss = run_soak(spark, "sessions", s, seconds)

    summarize("interval_join", rows_per_sec, js)
    summarize("sessions", rows_per_sec, ss)
    spark.stop()


if __name__ == "__main__":
    main()

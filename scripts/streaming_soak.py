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


def run_soak(spark, name: str, df, seconds: int,
             output_mode: str = "append") -> list:
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", f"/tmp/soak_ckpt_{name}_{os.getpid()}")
        .outputMode(output_mode)
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


def parity_soak(spark, sf_dir: str, n_slices: int = 40) -> None:
    """Replay a FIXED window (the full sf1 events table) through the
    streaming sessionizer as `n_slices` time-ordered file triggers and
    assert ROW-LEVEL equality of every closed session against the
    batch twin over the same window.

    Mechanics: events are range-partitioned by ts into one parquet
    slice per trigger, slice mtimes set ascending so FileStreamSource
    replays them in event-time order (the watermark advances and
    EVICTS session state mid-replay — the at-scale path, not a
    single-batch memory-sink test). A sentinel event 30 days past the
    max ts pushes the final watermark so every real session closes in
    append mode; the sentinel's own (still-open) session is excluded.
    """
    import glob
    import shutil

    from mobilityduck_spark.sources import tables as SRC

    base = f"/tmp/soak_parity_{os.getpid()}"
    slices = f"{base}/slices"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(slices)

    ev = SRC.load(spark, sf_dir, "events").select("user_id", "ts")
    mx = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    ev.repartitionByRange(n_slices, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(f"{base}/ranged")
    files = sorted(glob.glob(f"{base}/ranged/part-*.parquet"))
    # range partition file NAMES are ordered by range; re-stamp mtimes
    # ascending so the file source's (mtime-ordered) replay is
    # event-time-ordered
    now = time.time() - len(files) * 2 - 60
    for i, f in enumerate(files):
        dst = f"{slices}/{i:05d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now + 2 * i, now + 2 * i))
    # sentinel slice: one far-future event closes every real session
    sent = spark.createDataFrame(
        [(-1, mx)], "user_id long, ts timestamp"
    ).select("user_id", (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"))
    sent.coalesce(1).write.mode("overwrite").parquet(f"{base}/sent")
    sfile = glob.glob(f"{base}/sent/part-*.parquet")[0]
    dst = f"{slices}/{len(files):05d}.parquet"
    shutil.copy(sfile, dst)
    os.utime(dst, (now + 2 * len(files) + 2,) * 2)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(slices)
    )
    out = session_spans_stream(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("soak_parity")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .start()
    )
    peak_state, last_batch = 0, -1
    while q.isActive:
        time.sleep(1)
        p = q.lastProgress
        if p and p.get("stateOperators"):
            st = sum(o.get("numRowsTotal", 0) for o in p["stateOperators"])
            peak_state = max(peak_state, st)
            if p.get("batchId") != last_batch:
                last_batch = p.get("batchId")
                print(
                    f"  batch={last_batch} state_rows={st} "
                    f"watermark={p.get('eventTime', {}).get('watermark')}",
                    flush=True,
                )
        # availableNow isn't used (it would collapse the replay into
        # few triggers); stop once all slices are consumed and idle
        if p and p.get("numInputRows") == 0 and last_batch > len(files):
            break
    q.stop()
    q.awaitTermination(60)

    got = [
        (r["user_id"], r["sstart"], r["send"], r["n_events"])
        for r in spark.table("soak_parity").collect()
        if r["user_id"] != -1
    ]
    exp = [
        (r["user_id"], r["sstart"], r["send"], r["n_events"])
        for r in session_spans_stream(ev, gap="30 minutes", streaming=False)
        .collect()
    ]
    got.sort()
    exp.sort()
    n_total = ev.count()
    match = got == exp
    print(
        f"SUMMARY parity: input_rows={n_total} slices={len(files) + 1} "
        f"closed_sessions={len(got)} batch_sessions={len(exp)} "
        f"peak_state_rows={peak_state} row_level_equal={match}"
    )
    if not match:
        gs, es = set(got), set(exp)
        print("  only_stream:", sorted(gs - es)[:5])
        print("  only_batch:", sorted(es - gs)[:5])
        sys.exit(1)
    shutil.rmtree(base, ignore_errors=True)


def attribution_soak(spark, rows_per_sec: int, seconds: int):
    """Soak the stateful attribution twin against the rate source:
    state must stay EXACTLY |distinct users| (one (ts, type) tuple per
    user) while input grows linearly — the round-8 analog of the
    interval-join boundedness evidence. Every 5th event is a purchase,
    the rest cycle through 3 touch types."""
    from mobilityduck_spark.streaming.attribution import attribution_stream

    ev = rate_events(spark, rows_per_sec).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 == 0, F.lit("purchase"))
        .otherwise(
            F.concat(F.lit("touch_"), (F.col("event_id") % 3).cast("string"))
        )
        .alias("event_type"),
        (F.col("event_id") % 100).cast("double").alias("value"),
    )
    a = attribution_stream(ev, conversion_type="purchase", horizon="7 days")
    samples = run_soak(spark, "attribution", a, seconds)
    summarize("attribution", rows_per_sec, samples)
    if samples:
        peak = max(x["state_rows"] for x in samples)
        print(
            f"attribution peak state rows = {peak} "
            f"(bound: 199 distinct users -> one tuple each)"
        )
        assert peak <= 199, peak


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "attribution":
        rows_per_sec = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
        seconds = int(sys.argv[3]) if len(sys.argv) > 3 else 45
        spark = get_spark("streaming_soak_attr")
        spark.sparkContext.setLogLevel("ERROR")
        attribution_soak(spark, rows_per_sec, seconds)
        spark.stop()
        return

    if len(sys.argv) > 1 and sys.argv[1] == "parity":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"
        spark = get_spark("streaming_soak_parity")
        spark.sparkContext.setLogLevel("ERROR")
        parity_soak(spark, sf_dir)
        spark.stop()
        return

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

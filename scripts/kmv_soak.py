"""Streaming KMV soak (PERF.md evidence): run the k-bounded distinct
sketch as a real Structured Streaming job against a rate source where
EVERY event introduces a NEW user (the worst case for naive
distinct-count state, which would grow linearly forever) and record
state-store rows vs input. Expected steady state: exactly |etype
domain| state rows (one k-min array per key) — FLAT while distinct
users grow at the input rate.

Usage: python scripts/kmv_soak.py [rows_per_sec] [seconds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mobilityduck_spark.session import get_spark  # noqa: E402
from mobilityduck_spark.streaming.kmv import streaming_kmv_distinct  # noqa: E402
from streaming_soak import run_soak, summarize  # noqa: E402


def main() -> None:
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark("kmv_soak", shuffle_partitions=8)
    ev = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
        .select(
            F.concat(F.lit("type"), (F.col("value") % 5).cast("string"))
            .alias("event_type"),
            F.col("value").alias("user_id"),  # every event a NEW user
        )
    )
    sketch = streaming_kmv_distinct(ev, k=32)
    samples = run_soak(spark, "kmv", sketch, seconds, output_mode="update")
    summarize("kmv_sketch", rows_per_sec, samples)
    spark.stop()


if __name__ == "__main__":
    main()

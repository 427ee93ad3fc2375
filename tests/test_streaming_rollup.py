"""Stream ≡ batch parity for the cumulative rollup: the streaming
aggregation's final state must equal the batch snapshot+delta merge
(which itself equals a full recompute — the algebraic identity chain)."""

import datetime as dt

from pyspark.sql import functions as F

from mobilityduck_spark.operators import events as EV
from mobilityduck_spark.streaming.rollup import rollup_stream


def test_rollup_stream_equals_batch_merge(spark, tmp_path):
    rows = [
        (1, "a", dt.datetime(2024, 1, 1), 1.5),
        (1, "a", dt.datetime(2024, 1, 2), 2.5),
        (1, "b", dt.datetime(2024, 1, 3), 4.0),
        (2, "a", dt.datetime(2024, 1, 4), -1.0),
        (2, "b", dt.datetime(2024, 1, 5), None),  # dropped both paths
        (3, "a", dt.datetime(2024, 1, 6), 0.25),
    ]
    schema = "user_id bigint, event_type string, ts timestamp, value double"
    src_dir = str(tmp_path / "rollup_src")
    # two files -> two micro-batches: the second batch UPDATES keys the
    # first already aggregated (state-store merge, not a fresh group)
    for i in (0, 3):
        spark.createDataFrame(
            rows[i : i + 3], schema
        ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(
        spark.createDataFrame(rows, schema).schema
    ).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        rollup_stream(stream, ["user_id", "event_type"])
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["sum_micro"])
        for r in spark.table("rollup_out").collect()
    }

    ev = spark.createDataFrame(rows, schema)
    hist = ev.where(F.col("ts") < dt.datetime(2024, 1, 4))
    delta = ev.where(F.col("ts") >= dt.datetime(2024, 1, 4))
    exp = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["sum_micro"])
        for r in EV.incremental_rollup_merge(
            hist, delta, ["user_id", "event_type"]
        ).collect()
    }
    assert got == exp
    assert got[(1, "a")] == (2, 4_000_000)

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


def test_twap_stream_equals_batch(spark, tmp_path):
    """Replaying the sample stream in 3 micro-batches: the LAST emitted
    row per key must equal the batch time_weighted_avg over the full
    input (running-prefix contract)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mobilityduck_spark.operators import events as EV
    from mobilityduck_spark.streaming.twap import twap_stream

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(seconds=s), float(v))
        for u, s, v in [
            (1, 0, 10), (1, 2, 20), (1, 10, 99),
            (2, 0, 7), (2, 5, 3), (2, 6, 5),
            (3, 1, 42),
        ]
    ]
    schema = "key long, ts timestamp, value double"
    src = str(tmp_path / "twap_src")
    ordered = sorted(rows, key=lambda r: r[1])
    third = (len(ordered) + 2) // 3
    for i in range(3):
        spark.createDataFrame(
            ordered[i * third:(i + 1) * third], schema
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        twap_stream(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("twap_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    emitted = spark.table("twap_out").collect()
    last = {}
    for r in emitted:
        if r["key"] not in last or r["n_events"] > last[r["key"]][0]:
            last[r["key"]] = (r["n_events"], r["dur_us"], r["twap_micro"])
    batch_df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    exp = {
        r["key"]: (r["n_events"], r["dur_us"], r["twap_micro"])
        for r in EV.time_weighted_avg(batch_df, key_col="user_id").collect()
    }
    assert last == exp
    assert exp[1] == (3, 10_000_000, 18_000_000)

"""Streaming attribution parity: the applyInPandasWithState twin must
reproduce the batch operator's channel table over a time-ordered
multi-batch replay."""

from pyspark.sql import functions as F

from mobilityduck_spark.operators import events as EV
from mobilityduck_spark.sources import tables as SRC
from mobilityduck_spark.streaming.attribution import attribution_stream

SF = "/root/testdata/sf0.001"


def test_attribution_stream_equals_batch(spark, tmp_path):
    src_dir = str(tmp_path / "attr_src")
    ev = SRC.load(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    # replay in 4 time-ordered batches (one file each, maxFilesPerTrigger=1):
    # the per-key cross-batch ordering a Kafka deployment guarantees
    ordered = ev.orderBy("ts", "event_id").collect()
    quarter = (len(ordered) + 3) // 4
    for i in range(4):
        chunk = ordered[i * quarter : (i + 1) * quarter]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    q = (
        attribution_stream(stream, conversion_type="purchase", horizon="7 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.table("attr_out")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("v_micro").alias("revenue_micro"),
        )
        .collect()
    )
    got = {r["channel"]: (r["n_conversions"], r["revenue_micro"]) for r in got}
    exp = {
        r["channel"]: (r["n_conversions"], r["revenue_micro"])
        for r in EV.attribution(
            ev, conversion_type="purchase", horizon="7 days"
        ).collect()
    }
    assert got == exp and len(got) > 1
    # every conversion event is attributed exactly once
    n_conv = ev.where(F.col("event_type") == "purchase").count()
    assert sum(n for n, _ in got.values()) == n_conv


def test_attribution_stream_state_is_one_tuple_per_user(spark, tmp_path):
    """State growth check: the emitted rows carry per-conversion detail
    but state is a single (ts, type) tuple per user — replaying the
    same users twice must not duplicate attributions of the first
    window (the second batch's conversions see the updated touch)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "view", 0.0),
        (1, dt.datetime(2024, 1, 1, 11), 2, "purchase", 1.0),
        (1, dt.datetime(2024, 1, 2, 10), 3, "click", 0.0),
        (1, dt.datetime(2024, 1, 2, 11), 4, "purchase", 2.0),
    ]
    schema = "user_id bigint, ts timestamp, event_id bigint, event_type string, value double"
    src_dir = str(tmp_path / "attr2_src")
    for i in (0, 2):
        spark.createDataFrame(rows[i : i + 2], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = spark.readStream.schema(
        spark.createDataFrame(rows, schema).schema
    ).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        attribution_stream(stream, horizon="7 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr2_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["channel"])
        for r in spark.table("attr2_out").collect()
    )
    assert got == [(2, "view"), (4, "click")]

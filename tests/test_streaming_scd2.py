"""Streaming SCD2 parity: closed intervals emitted by the stream must
equal the batch scd2_compact's closed intervals over an ordered
replay; open intervals live in state."""

import datetime as dt

from pyspark.sql import functions as F

from mobilityduck_spark.operators import governance as GV
from mobilityduck_spark.sources import tables as SRC

SF = "/root/testdata/sf0.001"


def test_scd2_stream_equals_batch_closed_intervals(spark, tmp_path):
    from mobilityduck_spark.streaming.scd2 import scd2_stream

    src_dir = str(tmp_path / "scd2_src")
    orders = SRC.load(spark, SF, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("attr"),
        F.col("o_orderkey").alias("tb"),
    )
    # 3 time-ordered batch files (per-key order preserved)
    ordered = orders.orderBy("ts", "tb").collect()
    third = (len(ordered) + 2) // 3
    for i in range(3):
        chunk = ordered[i * third : (i + 1) * third]
        spark.createDataFrame(chunk, orders.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = spark.readStream.schema(orders.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    q = (
        scd2_stream(stream, "key", "ts", "attr", "tb")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("scd2_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        tuple(r)
        for r in spark.table("scd2_out")
        .select("key", "attr", "valid_from_us", "valid_to_us")
        .collect()
    )
    exp = sorted(
        tuple(r)
        for r in GV.scd2_compact(orders, "key", "ts", "attr", "tb")
        .where(F.col("valid_to_us") != -1)
        .select("key", "attr", "valid_from_us", "valid_to_us")
        .collect()
    )
    assert got == exp and len(got) > 100
    # exactly one open interval per key stays in state (not emitted):
    # closed + open == all batch intervals
    n_all = GV.scd2_compact(orders, "key", "ts", "attr", "tb").count()
    n_keys = orders.select("key").distinct().count()
    assert len(got) + n_keys == n_all


def test_scd2_stream_collapses_consecutive_duplicates(spark, tmp_path):
    from mobilityduck_spark.streaming.scd2 import scd2_stream

    rows = [
        (1, dt.datetime(2024, 1, 1), "A", 1),
        (1, dt.datetime(2024, 1, 2), "A", 2),   # absorbed
        (1, dt.datetime(2024, 1, 3), "B", 3),   # closes A
        (1, dt.datetime(2024, 1, 4), "B", 4),   # absorbed (across batch)
        (1, dt.datetime(2024, 1, 5), "A", 5),   # closes B
    ]
    schema = "key bigint, ts timestamp, attr string, tb bigint"
    src_dir = str(tmp_path / "scd2b_src")
    for i in (0, 3):
        spark.createDataFrame(
            rows[i : i + 3], schema
        ).coalesce(1).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(
        spark.createDataFrame(rows, schema).schema
    ).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        scd2_stream(stream, "key", "ts", "attr", "tb")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("scd2b_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    us = lambda d: int(
        dt.datetime(2024, 1, d, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    got = sorted(
        tuple(r)
        for r in spark.table("scd2b_out")
        .select("key", "attr", "valid_from_us", "valid_to_us")
        .collect()
    )
    assert got == [
        (1, "A", us(1), us(3)),
        (1, "B", us(3), us(5)),
    ]


def test_scd2_stream_null_attr_parity(spark, tmp_path):
    """NULL attribute values behave identically in stream and batch:
    non-NULL -> NULL closes the open interval and opens a NULL one,
    NULL runs collapse, and a key whose FIRST value is NULL opens a
    NULL interval rather than being swallowed by the no-state case."""
    import datetime as dt

    from mobilityduck_spark.operators import governance as GV
    from mobilityduck_spark.streaming.scd2 import scd2_stream

    rows = [
        (1, dt.datetime(2024, 1, 1), "A", 1),
        (1, dt.datetime(2024, 1, 2), None, 2),  # closes A, opens NULL
        (1, dt.datetime(2024, 1, 3), None, 3),  # absorbed
        (1, dt.datetime(2024, 1, 4), "B", 4),   # closes the NULL run
        (2, dt.datetime(2024, 1, 1), None, 5),  # first value NULL
        (2, dt.datetime(2024, 1, 2), "C", 6),   # closes it
    ]
    schema = "key bigint, ts timestamp, attr string, tb bigint"
    src_dir = str(tmp_path / "scd2n_src")
    for i in (0, 3):
        spark.createDataFrame(
            rows[i : i + 3], schema
        ).coalesce(1).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(
        spark.createDataFrame(rows, schema).schema
    ).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        scd2_stream(stream, "key", "ts", "attr", "tb")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("scd2n_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda t: tuple(str(x) for x in t)  # noqa: E731
    got = sorted(
        (
            tuple(r)
            for r in spark.table("scd2n_out")
            .select("key", "attr", "valid_from_us", "valid_to_us")
            .collect()
        ),
        key=key,
    )
    batch = spark.createDataFrame(rows, schema)
    exp = sorted(
        (
            (r["key"], r["attr"], r["valid_from_us"], r["valid_to_us"])
            for r in GV.scd2_compact(batch, "key", "ts", "attr", "tb")
            .where(F.col("valid_to_us") != -1)
            .collect()
        ),
        key=key,
    )
    assert got == exp
    # the NULL-valued closed intervals are actually present
    assert sum(1 for r in exp if r[1] is None) == 2


def test_cdc_stream_equals_batch_apply(spark, tmp_path):
    """Replaying the CDC log through the stream and keeping each key's
    LAST emission must equal batch cdc_apply (after dropping
    tombstones); a late lower-seq change must never regress the view."""
    from mobilityduck_spark.operators import governance as GV
    from mobilityduck_spark.streaming.cdc import cdc_stream

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k int, st string, v int",
    )
    log_rows = [
        # (k, seq, op, st, v) — batch 1 then batch 2; batch 2 carries a
        # LATE lower-seq change for key 1 that must not win
        [(1, 1, "U", "a2", 11), (2, 1, "D", None, None),
         (3, 2, "U", "c2", 31), (4, 1, "U", "d", 40)],
        [(1, 3, "U", "a4", 13), (1, 2, "U", "a3", 12),
         (3, 1, "D", None, None), (5, 1, "U", "e", 50)],
    ]
    base = dt.datetime(2024, 1, 1)
    src_dir = str(tmp_path / "cdc_src")
    schema = "key long, ts timestamp, seq long, op string, st string, v long"
    for i, rows in enumerate(log_rows):
        spark.createDataFrame(
            [(k, base + dt.timedelta(minutes=i), s, o, st, v)
             for (k, s, o, st, v) in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(src_dir)
    # snapshot rides the stream as seq-0 upserts (bootstrap batch)
    spark.createDataFrame(
        [(k, base, 0, "U", st, v) for (k, st, v) in
         [(1, "a", 10), (2, "b", 20), (3, "c", 30)]],
        schema,
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    q = (
        cdc_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cdc_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.table("cdc_out").collect()
    last = {}
    for r in emitted:
        if r["key"] not in last or r["seq"] > last[r["key"]][0]:
            last[r["key"]] = (r["seq"], r["op"], r["st"], r["v"])
    got = {
        k: (st, v, seq)
        for k, (seq, op, st, v) in last.items() if op != "D"
    }

    batch_log = spark.createDataFrame(
        [r for rows in log_rows for r in rows],
        "k int, seq long, op string, st string, v int",
    )
    exp = {
        r["k"]: (r["st"], r["v"], r["applied_seq"])
        for r in GV.cdc_apply(snap, batch_log, ["k"]).collect()
    }
    assert got == exp
    # the late (1, seq=2) change must have been swallowed by state:
    # emissions for a key are strictly increasing in seq (file pickup
    # order is not guaranteed, so which prefixes appear can vary, but
    # seq 2 never can) and the view ends at the true winner
    key1_seqs = [r["seq"] for r in emitted if r["key"] == 1]
    assert 2 not in key1_seqs
    assert max(key1_seqs) == 3

"""Checkpoint recovery: a Structured Streaming aggregation stopped
mid-stream must resume from its committed offsets (not reprocess from
scratch) and converge to exactly the batch answer — the exactly-once
contract a 100 TB pipeline relies on across executor loss and job
restarts. Uses a file source with maxFilesPerTrigger so progress is
deterministic and observable."""

import time

import pyspark.sql.functions as F

from mobilityduck_spark.sources import tables as SRC

SF_DIR = "/root/testdata/sf0.001"


def _agg(df):
    x = F.round(F.col("value") * F.lit(1e6)).cast("long")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(x).alias("sum_micro")
    )


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = SRC.load(spark, SF_DIR, "events").select("event_type", "value")
    ev.repartition(10).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def start(name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        return (
            _agg(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start("recov1")
    try:
        # wait for at least one committed batch, then kill mid-stream
        deadline = time.time() + 60
        while time.time() < deadline:
            p = q1.lastProgress
            if p is not None and p["batchId"] >= 1:
                break
            time.sleep(0.2)
        else:
            raise AssertionError("stream made no progress in 60s")
        stopped_at = q1.lastProgress["batchId"]
    finally:
        q1.stop()

    q2 = start("recov2")
    try:
        q2.processAllAvailable()
        resumed_at = q2.recentProgress[0]["batchId"] if q2.recentProgress else None
    finally:
        q2.stop()

    # the restart continued AFTER the stopped batch — offsets came from
    # the checkpoint, not a from-scratch replay
    assert resumed_at is not None and resumed_at > stopped_at

    got = {
        r.event_type: (r.n, r.sum_micro)
        for r in spark.sql("SELECT * FROM recov2").collect()
    }
    want = {r.event_type: (r.n, r.sum_micro) for r in _agg(ev).collect()}
    assert got == want  # exactly-once: no loss, no double counting

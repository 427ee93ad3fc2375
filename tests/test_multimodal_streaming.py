"""Multimodal plumbing (stubbed codec, real batch shapes) + streaming
window/session/stateful operators (memory-sink driven)."""

import pytest
from pyspark.sql import functions as F

from mobilityduck_spark.operators import multimodal as MM
from mobilityduck_spark.sources import tables as SRC
from mobilityduck_spark.streaming import (
    session_spans_stream,
    sliding_window_stats,
    tumbling_value_spans,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = SRC.load(spark, SF, "documents").limit(50)
    return MM.synthesize_media(docs, "doc_id", "text").cache()


def test_media_schema_and_determinism(spark, media):
    rows = media.orderBy("media_id").limit(5).collect()
    assert {r["kind"] for r in rows} <= {"image", "audio", "video"}
    again = MM.synthesize_media(
        SRC.load(spark, SF, "documents").limit(50), "doc_id", "text"
    ).orderBy("media_id").limit(5).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_feature_extraction_batch_shape(spark, media):
    feats = MM.extract_features(media, feat_dim=16)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert r["feat_dim"] == 16 and len(r["feat"]) == 16
        assert abs(sum(x * x for x in r["feat"]) - 1.0) < 1e-5  # normalized


def test_resize_images(spark, media):
    out = MM.resize_images(media, target_w=8, target_h=8).collect()
    assert len(out) == 50
    for r in out[:5]:
        assert r["width"] == 8 and r["height"] == 8
        assert len(bytes(r["content"])) == 64  # 8x8 uint8


def test_sample_frames(spark, media):
    vids = media.filter(F.col("kind") == "video")
    n_vids = vids.count()
    sampled = MM.sample_frames(media, every_n=10)
    assert sampled.count() >= n_vids  # ≥1 frame per video
    assert sampled.groupBy("media_id").count().count() == n_vids


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_real(b"abc", "image")


def test_batch_window_ops_match_sql(spark):
    ev = SRC.load(spark, SF, "events")
    agg = sliding_window_stats(ev, streaming=False)
    assert agg.count() > 0
    sess = session_spans_stream(ev, streaming=False)
    # session_window(gap=30m) must equal the batch spanset sessionization
    from mobilityduck_spark.queries import queries as qreg

    spanset_sessions = qreg()["sessions_spanset"](spark, SF)
    a = {
        (r["user_id"], r["n_sessions"])
        for r in spanset_sessions.collect()
    }
    b = {
        (r["user_id"], r["n"])
        for r in sess.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert a == b
    spans = tumbling_value_spans(ev, streaming=False)
    r = spans.limit(1).collect()[0]
    assert r["value_span"]["lower"] <= r["value_span"]["upper"]


def test_streaming_end_to_end(spark, tmp_path):
    # copy a slice of events to parquet dir → readStream → memory sink
    src_dir = str(tmp_path / "stream_src")
    ev = SRC.load(spark, SF, "events")
    ev.limit(500).write.mode("overwrite").parquet(src_dir)
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = sliding_window_stats(stream, streaming=True)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("mm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits finalized windows; completeness is checked by
    # running the same transform in batch mode
    batch_n = sliding_window_stats(ev.limit(500), streaming=False).count()
    assert batch_n > 0
    assert spark.table("mm_out").count() <= batch_n


def test_stateful_running_stats(spark, tmp_path):
    from mobilityduck_spark.streaming.stateful import running_user_stats

    src_dir = str(tmp_path / "state_src")
    ev = SRC.load(spark, SF, "events")
    ev.limit(300).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    out = running_user_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_instants"], r["min_value"], r["max_value"])
        for r in spark.table("state_out").collect()
    }
    exp = {
        r["user_id"]: (r["n"], r["mn"], r["mx"])
        for r in ev.limit(300)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == exp


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming exact dedup emits one row per distinct content hash
    (first arrival wins) — equal to the batch dedup over the same
    slice; the documents fixture plants exact-duplicate groups."""
    from mobilityduck_spark.streaming.dedup import exact_dedup_stream

    src_dir = str(tmp_path / "doc_src")
    base = SRC.load(spark, SF, "documents").limit(300).select(
        "doc_id", "text",
        # deterministic synthetic ingest time (documents carry none)
        F.timestamp_seconds(F.lit(946684800) + F.col("doc_id")).alias("ts"),
    )
    # plant exact duplicates: re-ingest 50 texts later under new ids
    dups = base.limit(50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ts"),
    )
    docs = base.unionByName(dups)
    docs.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    out = exact_dedup_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_out").count()
    exp = docs.select(F.md5("text")).distinct().count()
    assert got == exp
    assert got < docs.count()  # the fixture really contains duplicates


def test_streaming_text_pipeline_equals_batch(spark, tmp_path):
    """The text-pipeline ops (fingerprint / split / quality / token
    count) are stateless Column expressions, so they run UNCHANGED under
    Structured Streaming — stream results must equal the batch run row
    for row. This is the streaming ingestion shape for a training-data
    pipeline (new corpus shards land → score/split/fingerprint on
    arrival)."""
    from mobilityduck_spark.operators import text as TX

    src_dir = str(tmp_path / "docs_src")
    docs = SRC.load(spark, SF, "documents")
    docs.write.mode("overwrite").parquet(src_dir)

    def transform(df):
        return df.select(
            "doc_id",
            TX.fingerprint("text").alias("fp"),
            TX.split_assign(F.col("doc_id"), train=0.8, val=0.1).alias("split"),
            TX.token_count("text").alias("ntok"),
            F.round(TX.alpha_ratio("text"), 6).alias("ar"),
        )

    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    q = (
        transform(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("txt_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.table("txt_stream_out").collect()
    )
    exp = sorted(tuple(r) for r in transform(docs).collect())
    assert got == exp and len(got) > 0

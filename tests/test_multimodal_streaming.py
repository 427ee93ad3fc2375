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


def test_decode_real_unsupported_container_raises():
    """Codecs with no in-container decoder (MP3 etc.) must raise, not
    mis-decode; a truncated-but-magic-matching JPEG fails loudly too."""
    with pytest.raises(NotImplementedError):
        MM.decode_real(b"\xff\xfb\x90\x44 mp3-ish", "audio")
    with pytest.raises(ValueError):
        MM.decode_real(b"\xff\xd8\xff\xe0 jpeg-ish", "image")


def test_png_round_trip_all_filters():
    """encode_png cycles filter types 0..4 by row; decode must
    reconstruct bit-exactly for grayscale AND RGB, including dims not
    divisible by anything convenient."""
    import numpy as np

    rng = np.random.default_rng(42)
    for shape in [(7, 5), (23, 31), (6, 9, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = MM.decode_real(MM.encode_png(px), "image")
        assert out.shape == shape and (out == px).all()


def test_png_decodes_external_zlib_stream():
    """A PNG assembled independently of encode_png (single IDAT, filter
    0 only, RGBA) must also decode — guards against the decoder only
    understanding its sibling encoder's output."""
    import struct
    import zlib

    import numpy as np

    h, w = 4, 3
    px = np.arange(h * w * 4, dtype=np.uint8).reshape(h, w, 4)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    data = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(raw))
        + MM._png_chunk(b"IEND", b"")
    )
    out = MM.decode_real(data, "image")
    assert out.shape == (h, w, 4) and (out == px).all()


def test_bmp_decode():
    """Hand-assembled uncompressed 24-bit BMP (bottom-up, padded rows)
    decodes to the expected RGB grid."""
    import struct

    import numpy as np

    h, w = 3, 2
    px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    out = MM.decode_real(hdr + info + bytes(body), "image")
    assert out.shape == (h, w, 3) and (out == px).all()


def test_wav_decode():
    import struct

    import numpy as np

    rate, samples = 16000, np.array([0, 1000, -1000, 32767, -32768],
                                    dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    got_rate, got = MM.decode_real(wav, "audio")
    assert got_rate == rate and (got == samples).all()


def test_planted_png_decode_stats(spark):
    """End-to-end through Spark: plant gradient PNGs, decode with the
    real codec, check the analytic pixel sums."""
    ids = spark.createDataFrame([(3,), (17,)], ["media_id"])
    rows = {
        r["media_id"]: r
        for r in MM.decode_stats(MM.plant_gradient_png(ids)).collect()
    }
    import numpy as np

    for mid in (3, 17):
        w, h = 16 + mid % 16, 12 + mid % 12
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        px = (3 * x + 7 * y + mid) % 256
        r = rows[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_px"] == w * h and r["sum_px"] == int(px.sum())


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
    # update mode emits one row per key per micro-batch; keep the row
    # with the largest running count (the final state for that key)
    got: dict = {}
    for r in spark.table("state_out").collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_instants"] > cur[0]:
            got[r["user_id"]] = (
                r["n_instants"], r["min_value"], r["max_value"],
                r["last_value"],
            )
    exp = {
        r["user_id"]: (r["n"], r["mn"], r["mx"], r["lv"])
        for r in ev.limit(300)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.expr("max_by(value, ts)").alias("lv"),
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


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    """Stream-static enrichment (broadcast dim join) is stateless per
    micro-batch — the streamed result must equal the batch run row for
    row, including events whose user has no dim row (left-join nulls)."""
    from mobilityduck_spark.streaming import enrich_with_dim

    src_dir = str(tmp_path / "enrich_src")
    ev = SRC.load(spark, SF, "events").limit(400)
    ev.write.mode("overwrite").parquet(src_dir)
    dim = (
        SRC.load(spark, SF, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("seg"),
        )
        # drop half the users so the left-join null path is exercised
        .filter(F.col("user_id") % 2 == 0)
    )
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = (
        enrich_with_dim(stream, dim, on="user_id", streaming=True)
        .select("event_id", "user_id", "seg")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("enrich_out").collect())
    exp = sorted(
        tuple(r)
        for r in enrich_with_dim(ev, dim, on="user_id", streaming=False)
        .select("event_id", "user_id", "seg")
        .collect()
    )
    assert got == exp and len(got) == 400
    assert any(r[2] is None for r in got)  # left-join semantics held


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream interval self-join: inner-join matches
    are emitted eagerly (the watermark only bounds state), so the
    availableNow run must produce exactly the batch pair set."""
    from mobilityduck_spark.streaming import interval_self_join

    src_dir = str(tmp_path / "pairs_src")
    ev = SRC.load(spark, SF, "events")
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = (
        interval_self_join(stream, interval_secs=600, streaming=True)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pairs_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("pairs_out").collect())
    exp = sorted(
        tuple(r)
        for r in interval_self_join(ev, interval_secs=600, streaming=False).collect()
    )
    assert got == exp and len(got) > 0
    # the ±interval bound really is two-sided: every |gap| ≤ 600 s
    assert all(abs(r[3]) <= 600_000_000 for r in got)


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """Left-outer stream-stream join: matched rows equal batch exactly;
    outer (null-partner) rows are a subset of the batch outer rows —
    and every outer row old enough that the final watermark proved no
    partner can arrive MUST have been emitted. Rows newer than
    (delay + interval) before the max event time may be withheld at
    query end — that is the outer-join streaming contract, not loss."""
    from mobilityduck_spark.streaming import interval_self_join

    delay_s, interval_s = 600, 600
    src_dir = str(tmp_path / "louter_src")
    ev = SRC.load(spark, SF, "events")
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = (
        interval_self_join(
            stream,
            interval_secs=interval_s,
            watermark=f"{delay_s} seconds",
            streaming=True,
            how="left_outer",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("louter_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("louter_out").collect()}
    batch = {
        tuple(r)
        for r in interval_self_join(
            ev, interval_secs=interval_s, streaming=False, how="left_outer"
        ).collect()
    }
    got_matched = {r for r in got if r[2] is not None}
    batch_matched = {r for r in batch if r[2] is not None}
    assert got_matched == batch_matched and len(got_matched) > 0

    got_outer = {r for r in got if r[2] is None}
    batch_outer = {r for r in batch if r[2] is None}
    assert got_outer <= batch_outer and len(got_outer) > 0
    # completeness bound: outer rows older than max_ts - delay - interval
    # must all have been emitted before the query ended
    import datetime

    ts_by_id = {r["event_id"]: r["ts"] for r in ev.collect()}
    max_ts = max(ts_by_id.values())
    cutoff = max_ts - datetime.timedelta(seconds=delay_s + interval_s + 1)
    must_emit = {r for r in batch_outer if ts_by_id[r[1]] < cutoff}
    assert must_emit <= got_outer


# ------------------------------------------------------------- JPEG codec
def test_jpeg_block_constant_exact_round_trip():
    """Block-constant content is DC-only; with Q[0,0]=8 the quantized DC
    is exactly v-128, so decode(encode(px)) == px bit-for-bit — the
    property the media_jpeg_stats / media_features oracles rely on."""
    import numpy as np

    rng = np.random.default_rng(1)
    for _ in range(6):
        nbx, nby = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        vals = rng.integers(0, 256, size=(nby, nbx))
        px = np.kron(vals, np.ones((8, 8), np.int64)).astype(np.uint8)
        got = MM.decode_jpeg(MM.encode_jpeg(px))
        assert np.array_equal(got, px)


def test_jpeg_smooth_content_error_bound():
    """General (non-block-constant) content is lossy but bounded: smooth
    gradients reconstruct within a small quantization error."""
    import numpy as np

    x = np.arange(48)[None, :]
    y = np.arange(40)[:, None]
    px = ((np.sin(x / 5.0) + np.cos(y / 7.0)) * 60 + 128).clip(0, 255)
    px = px.astype(np.uint8)
    got = MM.decode_jpeg(MM.encode_jpeg(px))
    err = np.abs(got.astype(int) - px.astype(int))
    assert got.shape == px.shape
    assert err.max() <= 12 and err.mean() < 3.0


def test_jpeg_odd_dims_and_byte_stuffing():
    """Non-multiple-of-8 dims pad by replication and crop back; at least
    one fixture must produce an 0xFF entropy byte so the stuffing /
    unstuffing path is exercised."""
    import numpy as np

    rng = np.random.default_rng(2)
    stuffed = False
    for _ in range(40):
        h, w = int(rng.integers(5, 30)), int(rng.integers(5, 30))
        px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        data = MM.encode_jpeg(px)
        scan = data[data.index(b"\xff\xda") + 2 :]
        if b"\xff\x00" in scan:
            stuffed = True
        got = MM.decode_jpeg(data)
        assert got.shape == (h, w)
    assert stuffed, "no fixture exercised 0xFF byte stuffing"


def test_jpeg_decoder_boundaries():
    """Unsupported variants fail loudly, not wrongly."""
    import numpy as np

    import pytest as _pytest

    px = np.zeros((8, 8), np.uint8)
    data = bytearray(MM.encode_jpeg(px))
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with _pytest.raises(NotImplementedError):
        MM.decode_jpeg(bytes(data))
    with _pytest.raises(ValueError):
        MM.decode_jpeg(b"\x00\x01not a jpeg")


def test_jpeg_dispatch_in_decode_real():
    import numpy as np

    px = (np.ones((16, 16)) * 77).astype(np.uint8)
    got = MM.decode_real(MM.encode_jpeg(px), "image")
    assert np.array_equal(got, px)


def test_lzw_round_trip_stress():
    """GIF LZW pair: width bumps (9->12), KwKwK case, dictionary reset
    past 4096 entries, empty and single-byte streams."""
    import numpy as np

    rng = np.random.default_rng(0)
    cases = [
        rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
        bytes(2000),                       # constant -> KwKwK chains
        b"abababab" * 100,
        rng.integers(0, 8, 120_000, dtype=np.uint8).tobytes(),  # resets
        b"", b"\x42",
    ]
    for data in cases:
        assert MM._lzw_decompress(MM._lzw_compress(data)) == data


def test_gif_round_trip_and_dispatch():
    import numpy as np

    rng = np.random.default_rng(1)
    for shape in [(10, 14), (33, 27), (300, 400)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = MM.decode_real(MM.encode_gif(px), "image")
        assert out.shape == shape and (out == px).all()


def test_gif_decoder_boundaries():
    import numpy as np

    import pytest as _pytest

    px = np.zeros((4, 4), np.uint8)
    data = bytearray(MM.encode_gif(px))
    # image descriptor starts after header(13) + GCT(768); set the
    # interlace flag in its packed byte
    i = 13 + 768
    assert data[i] == 0x2C
    data[i + 9] |= 0x40
    with _pytest.raises(NotImplementedError):
        MM.decode_gif(bytes(data))
    with _pytest.raises(ValueError):
        MM.decode_gif(b"NOTAGIF!")


def test_mulaw_codec_properties():
    """All 256 codes round-trip canonically (except code 127, the
    standard negative-zero alias of 255), and encode->decode of
    arbitrary samples stays within the segment quantization step."""
    import numpy as np

    codes = np.arange(256, dtype=np.uint8)
    re = MM.mulaw_encode_np(MM.mulaw_decode_np(codes))
    mism = np.nonzero(re != codes)[0]
    assert list(mism) == [127]  # -0 encodes as +0 (0xFF)
    assert MM.mulaw_decode_np(np.array([127], np.uint8))[0] == 0

    rng = np.random.default_rng(2)
    s = rng.integers(-32000, 32000, 20000).astype(np.int16)
    d = MM.mulaw_decode_np(MM.mulaw_encode_np(s)).astype(np.int64)
    err = np.abs(d - s.astype(np.int64))
    bound = (np.abs(s.astype(np.int64)) + 132) / 16 + 4
    assert (err <= bound).all()


def test_mulaw_wav_container_round_trip():
    """A planted fmt-7 RIFF container decodes through decode_real to
    the closed-form expansion of its code bytes."""
    import struct

    import numpy as np

    codes = ((5 * np.arange(900, dtype=np.int64) + 21) % 256).astype(
        np.uint8
    )
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = codes.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, samples = MM.decode_real(wav, "audio")
    assert rate == 8000
    assert np.array_equal(samples, MM.mulaw_decode_np(codes))


def test_transform_with_state_matches_batch(spark, tmp_path):
    """The Spark-4 transformWithState flavor must agree with the batch
    aggregate (and therefore with the applyInPandasWithState flavor
    proven above). Engine-managed typed state needs the RocksDB state
    store provider."""
    from mobilityduck_spark.streaming import stateful as ST

    if ST.running_user_stats_tws is None:
        pytest.skip("transformWithState API unavailable")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        # TWS's state-server protocol is protobuf-based; the container
        # has no python protobuf package (and installs are disallowed),
        # so the engine's driver worker cannot start StateMessage_pb2.
        # The skip reason pins the EXACT import error so the blocker is
        # visible in CI output (pytest -rs), not a silent `s`; the
        # companion sentinel test below FAILS if the blocker ever
        # changes shape. The operator code is exercised the moment the
        # dependency exists.
        pytest.skip(
            "transformWithState blocked by missing python protobuf "
            f"runtime (pip installs disallowed): {e!r}"
        )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src_dir = str(tmp_path / "tws_src")
        ev = SRC.load(spark, SF, "events")
        ev.limit(300).write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(ev.schema).parquet(src_dir)
        q = (
            ST.running_user_stats_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got: dict = {}
        for r in spark.table("tws_out").collect():
            cur = got.get(r["user_id"])
            if cur is None or r["n_instants"] > cur[0]:
                got[r["user_id"]] = (
                    r["n_instants"], r["min_value"], r["max_value"],
                    r["last_value"],
                )
        exp = {
            r["user_id"]: (r["n"], r["mn"], r["mx"], r["lv"])
            for r in ev.limit(300)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
                F.expr("max_by(value, ts)").alias("lv"),
            )
            .collect()
        }
        assert got == exp
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_blocker_is_exactly_missing_protobuf():
    """Environment sentinel for the one skipped parity test above: it
    NEVER skips. Green means either (a) the python protobuf runtime
    exists, so the TWS parity test actually ran this session, or
    (b) the import fails with precisely the documented missing-module
    error. Any OTHER failure mode (half-installed protobuf, API break,
    renamed module) fails HERE loudly instead of widening the silent
    skip."""
    from mobilityduck_spark.streaming import stateful as ST

    assert ST.running_user_stats_tws is not None, (
        "pyspark no longer exposes transformWithStateInPandas — the "
        "TWS flavor needs porting, not skipping"
    )
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        assert isinstance(e, ModuleNotFoundError) and (
            e.name in ("google", "google.protobuf")
        ), f"TWS blocker changed shape; re-triage: {e!r}"
    # importable protobuf is also a pass: the parity test ran


def test_jpeg_color_mcu_constant_exact_round_trip():
    """MCU-constant YCbCr content is DC-only in all six blocks of every
    MCU; both quant tables' DC entry is 8, so the full interleaved
    color pipeline round-trips bit-exactly — the property the
    media_jpeg_color_stats oracle relies on."""
    import numpy as np

    rng = np.random.default_rng(3)
    for _ in range(6):
        mh, mw = int(rng.integers(1, 4)), int(rng.integers(1, 5))
        yv = rng.integers(0, 256, size=(mh, mw))
        cbv = rng.integers(0, 256, size=(mh, mw))
        crv = rng.integers(0, 256, size=(mh, mw))
        y = np.kron(yv, np.ones((16, 16), np.int64)).astype(np.uint8)
        cb = np.kron(cbv, np.ones((8, 8), np.int64)).astype(np.uint8)
        cr = np.kron(crv, np.ones((8, 8), np.int64)).astype(np.uint8)
        y2, cb2, cr2 = MM.decode_jpeg_color(MM.encode_jpeg_color(y, cb, cr))
        assert np.array_equal(y2, y)
        assert np.array_equal(cb2, cb)
        assert np.array_equal(cr2, cr)


def test_jpeg_color_lossy_bound_and_rgb():
    """Smooth color content reconstructs within quantization error on
    every plane; ycbcr_to_rgb applies the JFIF inverse with 2x2
    nearest-neighbor upsampling."""
    import numpy as np

    x = np.arange(32)[None, :]
    y = np.arange(32)[:, None]
    yp = ((np.sin(x / 5.0) + np.cos(y / 7.0)) * 60 + 128).clip(0, 255)
    yp = yp.astype(np.uint8)
    cx = np.arange(16)[None, :]
    cy = np.arange(16)[:, None]
    cbp = ((cx + cy) * 3 % 200 + 20).astype(np.uint8)
    crp = ((cx * 2 + cy) % 180 + 40).astype(np.uint8)
    data = MM.encode_jpeg_color(yp, cbp, crp)
    y2, cb2, cr2 = MM.decode_jpeg_color(data)
    assert np.abs(y2.astype(int) - yp.astype(int)).max() <= 12
    # chroma uses the coarser Annex-K chroma table
    assert np.abs(cb2.astype(int) - cbp.astype(int)).max() <= 40
    assert np.abs(cr2.astype(int) - crp.astype(int)).max() <= 40
    rgb = MM.ycbcr_to_rgb(y2, cb2, cr2)
    assert rgb.shape == (32, 32, 3) and rgb.dtype == np.uint8
    # gray pixel sanity: neutral chroma (128) means R=G=B=Y
    yk = np.full((16, 16), 99, np.uint8)
    ck = np.full((8, 8), 128, np.uint8)
    out = MM.ycbcr_to_rgb(yk, ck, ck)
    assert np.array_equal(out[..., 0], yk)
    assert np.array_equal(out[..., 1], yk)
    assert np.array_equal(out[..., 2], yk)


def test_jpeg_color_decoder_boundaries():
    """The color decoder rejects what it cannot decode correctly."""
    import numpy as np

    import pytest as _pytest

    y = np.zeros((16, 16), np.uint8)
    c = np.zeros((8, 8), np.uint8)
    data = bytearray(MM.encode_jpeg_color(y, c, c))
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2  # progressive
    with _pytest.raises(NotImplementedError):
        MM.decode_jpeg_color(bytes(data))
    # grayscale stream into the color decoder -> loud, not wrong
    g = MM.encode_jpeg(np.zeros((8, 8), np.uint8))
    with _pytest.raises(NotImplementedError):
        MM.decode_jpeg_color(g)
    # color stream into the grayscale decoder -> loud, not wrong
    with _pytest.raises(NotImplementedError):
        MM.decode_jpeg(bytes(MM.encode_jpeg_color(y, c, c)))


def test_streaming_heavy_hitters_exact_regime(spark, tmp_path):
    """With fewer distinct items than k per bucket, the Space-Saving
    summary is EXACT: final counts equal the batch groupBy-count and
    every error bound is 0 — while state is provably capped."""
    from mobilityduck_spark.streaming import streaming_heavy_hitters

    src_dir = str(tmp_path / "hh_src")
    ev = SRC.load(spark, SF, "events").select(
        F.col("event_type").alias("item")
    )
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema("item string").parquet(src_dir)
    q = (
        streaming_heavy_hitters(stream, k_per_bucket=8, n_buckets=4)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_exact")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("hh_exact").collect()
    # current answer: the max-ver row set per bucket
    latest_ver = {}
    for r in rows:
        latest_ver[r.bucket] = max(latest_ver.get(r.bucket, 0), r.ver)
    got = {
        r.item: (r.cnt, r.err)
        for r in rows
        if r.ver == latest_ver[r.bucket]
    }
    exp = {
        r["item"]: r["n"]
        for r in ev.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {i: c for i, (c, _) in got.items()} == exp
    assert all(e == 0 for _, e in got.values())


def test_streaming_heavy_hitters_eviction_guarantees(spark, tmp_path):
    """Force evictions (k=2 counters per bucket, 50 distinct items) and
    check the Space-Saving contract against exact batch counts:
    count_est ∈ [true, true + err] for every surviving item, and every
    item above the per-bucket threshold (bucket length / k) survives."""
    from mobilityduck_spark.streaming import streaming_heavy_hitters

    src_dir = str(tmp_path / "hh2_src")
    ev = SRC.load(spark, SF, "events").select(
        (F.col("user_id") % 50).cast("string").alias("item")
    )
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema("item string").parquet(src_dir)
    n_buckets, k = 4, 2
    q = (
        streaming_heavy_hitters(stream, k_per_bucket=k, n_buckets=n_buckets)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_evict")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "hh2_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("hh_evict").collect()
    latest_ver = {}
    for r in rows:
        latest_ver[r.bucket] = max(latest_ver.get(r.bucket, 0), r.ver)
    got = {
        r.item: (r.bucket, r.cnt, r.err)
        for r in rows
        if r.ver == latest_ver[r.bucket]
    }
    # state bound: at most k counters per bucket
    per_bucket: dict = {}
    for item, (b, _, _) in got.items():
        per_bucket.setdefault(b, []).append(item)
    assert all(len(v) <= k for v in per_bucket.values())
    true = {
        r["item"]: r["n"]
        for r in ev.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    bucket_of = {
        r["item"]: r["b"]
        for r in ev.select("item").distinct().select(
            "item",
            F.pmod(F.xxhash64(F.col("item")), F.lit(n_buckets))
            .cast("int")
            .alias("b"),
        ).collect()
    }
    bucket_len: dict = {}
    for item, n in true.items():
        bucket_len[bucket_of[item]] = bucket_len.get(bucket_of[item], 0) + n
    # overestimate-only, bounded by err
    for item, (b, cnt, err) in got.items():
        assert true[item] <= cnt <= true[item] + err
    # no false negatives above threshold
    for item, n in true.items():
        if n > bucket_len[bucket_of[item]] / k:
            assert item in got, f"heavy item {item} missing"


def test_streaming_incremental_dedup_vs_snapshot(spark, tmp_path):
    """Stream-static incremental dedup: docs whose fingerprint exists
    in the prior snapshot's fp index never emit; stream-internal
    duplicates emit once (first arrival); emitted set equals the batch
    incremental_dedup 'kept' set over the same window."""
    from mobilityduck_spark.operators import dedup as DD
    from mobilityduck_spark.operators import text as TXO
    from mobilityduck_spark.streaming.dedup import incremental_dedup_stream

    docs = SRC.load(spark, SF, "documents").select("doc_id", "text")
    prior = docs.where(F.col("doc_id") % 10 < 8)
    prior_fps = prior.select(
        TXO.fingerprint(F.col("text")).alias("fp")
    ).distinct()
    # ingest batch: unseen docs + copies of prior docs + an in-batch dup
    new = (
        docs.where(F.col("doc_id") % 10 >= 8)
        .unionAll(prior.limit(10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"))
        .unionAll(docs.where(F.col("doc_id") % 10 == 8).limit(5).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"))
        .select(
            "doc_id", "text",
            F.timestamp_seconds(F.lit(946684800) + F.col("doc_id") % 3600)
            .alias("ts"),
        )
    )
    src_dir = str(tmp_path / "incr_src")
    new.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(new.schema).parquet(src_dir)
    q = (
        incremental_dedup_stream(stream, prior_fps)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("incr_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "incr_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table("incr_out").collect()}
    tagged = DD.incremental_dedup(new.drop("ts"), prior)
    kept_fps = {
        r["fp"] for r in tagged.where(F.col("reason") == "kept").collect()
    }
    # first-arrival inside the stream may pick a different member of an
    # in-batch dup group than batch's min-id rule — compare by fp set
    got_fps = {
        r["fp"]
        for r in new.withColumn("fp", TXO.fingerprint(F.col("text")))
        .where(F.col("doc_id").isin(list(got)))
        .select("fp").collect()
    }
    assert got_fps == kept_fps
    # and no emitted doc's fp exists in the prior index
    prior_set = {r["fp"] for r in prior_fps.collect()}
    assert not (got_fps & prior_set)


def test_ima_adpcm_decode_arbitrary_codes():
    """Decode a varied-code block against an independent straight
    transcription of the IMA/DVI algorithm (per-sample loop written
    here, not shared with the operator)."""
    import struct

    import numpy as np

    step_table = MM._IMA_STEP_TABLE
    index_table = MM._IMA_INDEX_TABLE
    codes = [0, 15, 7, 8, 3, 12, 1, 14, 9, 2, 11, 4, 6, 13, 5, 10] * 8
    packed = bytes(
        codes[i] | (codes[i + 1] << 4) for i in range(0, len(codes), 2)
    )
    pred0, idx0 = -123, 17
    block = struct.pack("<hBB", pred0, idx0, 0) + packed
    got = MM.ima_adpcm_decode_block(block)
    # independent reference
    pred, idx, exp = pred0, idx0, [pred0]
    for c in codes:
        step = step_table[idx]
        diff = step >> 3
        if c & 1:
            diff += step >> 2
        if c & 2:
            diff += step >> 1
        if c & 4:
            diff += step
        if c & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + index_table[c & 7]))
        exp.append(pred)
    assert got.tolist() == exp
    assert got.dtype == np.int16


def test_adpcm_planted_wav_closed_form(spark):
    """plant_adpcm_wav fixtures decode to the provable arithmetic
    sequence 0, d, 2d, ..., nd through the REAL container + state
    machine path (decode_wav fmt 0x11)."""
    ids = spark.createDataFrame([(0,), (1,), (2,), (7,)], "media_id long")
    rows = MM.plant_adpcm_wav(ids).collect()
    assert len(rows) == 4
    for r in rows:
        mid = r["media_id"]
        n = 3000 + (mid % 5) * 200
        d = {1: 1, 2: 3, 3: 4}[1 + (mid % 3)]
        rate, samples = MM.decode_wav(bytes(r["content"]))
        assert rate == 8000
        assert samples.shape == (n + 1,)
        assert samples[0] == 0 and samples[-1] == n * d
        assert int(samples.astype("int64").sum()) == d * n * (n + 1) // 2


def test_ahash_brightness_invariance_and_sensitivity():
    """aHash contract: a uniform brightness shift never changes the
    hash (every strict block-vs-global comparison is preserved); a
    structural change (one bright block) must flip at least one bit."""
    import numpy as np

    from mobilityduck_spark.operators.multimodal import encode_png

    def ahash_of(px):
        # mirror the engine kernel on a local array
        h, w = px.shape
        b = px[: h // 8 * 8, : w // 8 * 8].astype(np.int64)
        bs = b.reshape(8, b.shape[0] // 8, 8, b.shape[1] // 8).sum(axis=(1, 3))
        return "".join(
            "1" if 64 * v > bs.sum() else "0" for v in bs.ravel()
        )

    x = np.arange(32)[None, :]
    y = np.arange(32)[:, None]
    base = ((3 * x + 7 * y + 11 * 5) % 199).astype(np.int64)
    shifted = base + 20
    assert ahash_of(base) == ahash_of(shifted)
    structural = base.copy()
    structural[0:4, 0:4] = 255
    assert ahash_of(base) != ahash_of(structural)
    # and the engine decode path reproduces the local kernel bit-exactly
    from mobilityduck_spark.operators.multimodal import decode_png

    assert (decode_png(encode_png(base.astype(np.uint8)))
            == base).all()


def test_item_cosine_exact_small(spark):
    from mobilityduck_spark.operators import basket as BK

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
            (4, "b"), (4, "c")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = {
        (r["item_a"], r["item_b"]): (r["n_co"], r["n_a"], r["n_b"],
                                     r["cos_micro"])
        for r in BK.item_cosine(df, "b", "i", min_co=1).collect()
    }
    # a: {1,2,3}, b: {1,2,4}, c: {3,4}
    assert out[("a", "b")] == (2, 3, 3, 666667)   # 2/3
    assert out[("a", "c")] == (1, 3, 2, 408248)   # 1/sqrt(6)
    assert out[("b", "c")] == (1, 3, 2, 408248)


def test_audio_fingerprint_scale_invariance_and_sensitivity():
    import numpy as np

    def fp_of(s, frames=64):
        s = s.astype(np.int64)
        ln = (s.size // frames) * frames
        e = (s[:ln] ** 2).reshape(frames, ln // frames).sum(axis=1)
        return "".join("1" if frames * v > e.sum() else "0" for v in e)

    i = np.arange(4400, dtype=np.int64)
    base = (7919 * i + 104729 * 3) % 16384 - 8192
    assert fp_of(base) == fp_of(2 * base)        # loudness-normalized dup
    structural = base.copy()
    structural[:200] = 0                          # silence the first frames
    assert fp_of(base) != fp_of(structural)
    # engine WAV round-trip reproduces the local kernel bit-exactly
    import struct

    from mobilityduck_spark.operators.multimodal import decode_wav

    data = base.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    rate, got = decode_wav(wav)
    assert rate == 16000 and (got.astype(np.int64) == base).all()


def test_tiff_decoder_paths():
    """TIFF decoder boundaries: multi-strip assembly, RowsPerStrip
    default, big-endian rejection of truncated magic, and documented
    NotImplementedError walls (compression, non-8-bit)."""
    import struct

    import numpy as np
    import pytest as pt

    from mobilityduck_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    x = np.arange(24)[None, :]
    y = np.arange(15)[:, None]
    px = ((5 * x + 3 * y + 9) % 251).astype(np.uint8)
    blob = encode_tiff(px)
    assert (decode_tiff(blob) == px).all()

    # multi-strip variant: rewrite as 4-row strips (hand-built IFD)
    h, w = px.shape
    rps = 4
    strips = [px[i:i + rps].tobytes() for i in range(0, h, rps)]
    n_tags = 8
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    noff = len(strips)
    arrays_off = data_off
    offs_bytes = b""
    cnts_bytes = b""
    strip_data_off = arrays_off + 8 * noff
    cur = strip_data_off
    for s in strips:
        offs_bytes += struct.pack("<I", cur)
        cnts_bytes += struct.pack("<I", len(s))
        cur += len(s)

    def tag(tid, ttype, count, value):
        return struct.pack("<HHI4s", tid, ttype, count,
                           struct.pack("<I", value))

    tags = [
        tag(256, 3, 1, w), tag(257, 3, 1, h), tag(258, 3, 1, 8),
        tag(259, 3, 1, 1), tag(262, 3, 1, 1),
        tag(273, 4, noff, arrays_off),
        tag(278, 3, 1, rps),
        tag(279, 4, noff, arrays_off + 4 * noff),
    ]
    ifd = struct.pack("<H", n_tags) + b"".join(tags) + struct.pack("<I", 0)
    blob2 = (b"II*\x00" + struct.pack("<I", ifd_off) + ifd
             + offs_bytes + cnts_bytes + b"".join(strips))
    assert (decode_tiff(blob2) == px).all()

    with pt.raises(ValueError):
        decode_tiff(b"XX*\x00garbage")
    # compression wall
    bad = bytearray(blob)
    # tag 259 is the 4th tag: value bytes at ifd_off+2 + 12*3 + 8
    o = 8 + 2 + 12 * 3 + 8
    bad[o:o + 4] = struct.pack("<I", 5)  # LZW
    with pt.raises(NotImplementedError):
        decode_tiff(bytes(bad))


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    """KMV is a mergeable sketch: the stream fold's final (kth_hash,
    est) per type must equal the batch operator's, regardless of
    micro-batching — and state is provably capped at k values."""
    from mobilityduck_spark.operators import events as EV
    from mobilityduck_spark.streaming import streaming_kmv_distinct

    src_dir = str(tmp_path / "kmv_src")
    ev = SRC.load(spark, SF, "events").select("event_type", "user_id")
    # two parquet files so availableNow processes multiple batches
    ev.repartition(2).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "event_type string, user_id long"
    ).parquet(src_dir)
    q = (
        streaming_kmv_distinct(stream, k=8)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("kmv_stream").collect()
    latest = {}
    for r in rows:
        if r.etype not in latest or r.ver > latest[r.etype].ver:
            latest[r.etype] = r
    batch = {
        r.event_type: r
        for r in EV.kmv_distinct(
            SRC.load(spark, SF, "events"), k=8
        ).collect()
    }
    assert set(latest) == set(batch)
    for t, r in latest.items():
        assert r.kth_hash == batch[t].kth_hash, t
        assert r.est == batch[t].est, t
        assert r.n_mins <= 8

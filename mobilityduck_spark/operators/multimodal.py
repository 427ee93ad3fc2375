"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample stages
as mapInPandas operators.

Spark-side plumbing (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested; the codec step itself is STUBBED because
image/audio libraries are not in this container:

- `decode_fake` produces a deterministic fake decode (seeded by the
  content hash) with the right shape metadata, so downstream stages and
  tests exercise real batch shapes;
- `decode_real` raises NotImplementedError with the intended
  implementation path (PIL/av/soundfile) documented.

At 100 TB: media bytes dominate row size — the operators keep bytes in
Arrow record batches end-to-end (mapInPandas iterator, no per-row
Python), and `target_batch_rows` bounds worker memory: batch_bytes ≈
rows × avg_media_size, independent of partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "feat array<float>, feat_dim int"
)

RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int"
)


def synthesize_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a media table from any binary-able column: treats the bytes
    as opaque content and derives deterministic metadata. This is the
    ingestion-shape adapter (real pipelines read bytes from object
    storage the same way)."""
    content = F.encode(F.col(payload_col).cast("string"), "utf-8")
    h = F.abs(F.xxhash64(F.col(payload_col)))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (h % 3 + 1).cast("int"),
        ).alias("kind"),
        content.alias("content"),
        (h % 512 + 32).cast("int").alias("width"),
        (h % 384 + 32).cast("int").alias("height"),
        (h % 120 + 1).cast("int").alias("n_frames"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )


_FAKE_DECODE_MAX_PIXELS = 4096


def _fake_pixels(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seed a PRNG from the content hash and
    emit a (h, w) uint8 array. Replaces PIL.Image.open in-container.

    Output is capped at _FAKE_DECODE_MAX_PIXELS (downscaled dims, aspect
    preserved) — the stub only has to be deterministic and shaped like a
    decode, not to burn CPU synthesizing full-size noise frames."""
    if width * height > _FAKE_DECODE_MAX_PIXELS:
        s = (_FAKE_DECODE_MAX_PIXELS / (width * height)) ** 0.5
        width, height = max(1, int(width * s)), max(1, int(height * s))
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


# ---------------------------------------------------------------------
# Real codecs, pure stdlib + numpy. The container has no PIL/soundfile/
# av, but PNG (zlib inflate + per-scanline defilter), uncompressed BMP,
# and PCM WAV are fully decodable from first principles — enough to run
# the decode→feature path on real bytes end-to-end. Anything else
# (JPEG/MP3/H.264 need entropy/DCT codecs) still raises.
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG encoder for uint8 grayscale (h, w) or RGB (h, w, 3)
    arrays. Scanline filters cycle 0..4 by row (None/Sub/Up/Average/
    Paeth) so a round-trip exercises every defilter branch of the
    decoder — the point of the planted fixtures."""
    import struct
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        row = px[y].astype(np.int32)
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
            filt = row - (left + prev) // 2
        else:  # Paeth
            left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
            ul = np.vstack([np.zeros((1, ch), np.int32), prev[:-1]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = row - pred
        raw.append(ft)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG decoder: chunk walk → zlib inflate → per-scanline defilter
    (all 5 filter types). Supports 8-bit grayscale / RGB / RGBA,
    non-interlaced — the subset the fixtures and any minimal encoder
    emit. Returns (h, w) or (h, w, ch) uint8."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, bytearray(), None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _, _, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    ch = {0: 1, 2: 3, 6: 4}.get(color_type)
    if ch is None:
        raise NotImplementedError(f"PNG color type {color_type} unsupported")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            # Sub/Average/Paeth need the reconstructed left pixel —
            # sequential in x by definition of the filter
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if ft == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ft == 3:
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ft == 4:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (line[x] + pr) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape(h, w, ch)
    return px[:, :, 0] if ch == 1 else px


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up, 4-byte row
    padding). Returns (h, w, 3) uint8 in RGB order."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack("<IiihhI", data[14:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(abs(h)):
        line = np.frombuffer(data, np.uint8, w * 3, off + y * stride)
        rows.append(line.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    px = np.stack(rows)
    return px[::-1] if h > 0 else px  # bottom-up -> top-down


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV (RIFF) decoder: returns (sample_rate, samples) with
    samples int16 (n,) mono or (n, ch)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, ch, bits, frames = 12, None, None, None, None
    while pos + 8 <= len(data):
        tag, ln = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only 16-bit PCM WAV supported")
        elif tag == b"data":
            frames = np.frombuffer(body, dtype="<i2")
        pos += 8 + ln + (ln & 1)
    if rate is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, frames if ch == 1 else frames.reshape(-1, ch)


def decode_real(content: bytes, kind: str):
    """Real codec dispatch by magic bytes: PNG, uncompressed BMP, and
    PCM WAV decode fully in pure stdlib+numpy (above). Compressed
    codecs (JPEG/MP3/H.264) need entropy/DCT libraries absent from this
    container and still raise — callers fall back to the deterministic
    fake-decode path for those."""
    content = bytes(content)
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    raise NotImplementedError(
        "unsupported media container (PNG/BMP/PCM-WAV decode natively; "
        "JPEG/MP3/H.264 need codec libs not in this environment)"
    )


DECODE_STATS_SCHEMA = (
    "media_id long, width int, height int, n_px long, sum_px long"
)


def plant_gradient_png(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL PNG per id with analytically-known content:
    dims (16 + id%16) × (12 + id%12), pixel(x, y) = (3x + 7y + id) % 256.
    Because the pixel grid is pure integer arithmetic on the id, an
    ANSI-SQL oracle can recompute every expected decode statistic from
    first principles (cross join two index ranges) while the engine path
    round-trips actual zlib-compressed, scanline-filtered PNG bytes —
    encode_png cycles all 5 filter types, so a defilter bug anywhere
    breaks the sums."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 16 + mid % 16, 12 + mid % 12
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = ((3 * x + 7 * y + mid) % 256).astype(np.uint8)
                out.append((mid, encode_png(px)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.mapInPandas(op, schema="media_id long, content binary")


AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, sum_samples long"
)


def plant_tone_wav(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL PCM WAV per id with analytically-known samples:
    rate = 16000 + (id%3)*8000, n = 4000 + (id%5)*400,
    sample(i) = ((7919*i + 104729*id) % 65536) - 32768 — pure integer
    arithmetic, so an ANSI oracle regenerates the sample stream
    relationally while the engine parses actual RIFF containers."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                rate = 16000 + (mid % 3) * 8000
                n = 4000 + (mid % 5) * 400
                i = np.arange(n, dtype=np.int64)
                s = ((7919 * i + 104729 * mid) % 65536 - 32768).astype("<i2")
                data = s.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
                wav = (
                    b"RIFF"
                    + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                    + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                out.append((mid, wav))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.mapInPandas(op, schema="media_id long, content binary")


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode PCM WAV bytes (decode_real) and emit per-item sample
    statistics — rate from the fmt chunk, sums from the sample stream,
    integer-exact."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, samples = decode_real(bytes(content), "audio")
                s = samples.astype(np.int64)
                rows.append((int(mid), int(rate), int(s.size), int(s.sum())))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "sum_samples"],
            )

    return media.mapInPandas(op, schema=AUDIO_STATS_SCHEMA)


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode real media bytes (decode_real) and emit per-item pixel
    statistics — dimensions from the container header, sums from the
    reconstructed pixels, so every stage of the decoder is load-bearing
    for the oracle comparison. Integer-exact outputs only; derived
    ratios (mean etc.) belong in the relational layer where both
    engines share one rounding rule."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_real(bytes(content), "image")
                arr = px.astype(np.int64)
                rows.append(
                    (int(mid), px.shape[1], px.shape[0],
                     int(arr.size), int(arr.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_px", "sum_px"],
            )

    return media.mapInPandas(op, schema=DECODE_STATS_SCHEMA)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: fake-decode → per-image histogram
    feature vector. Batch shape is the real contract: iterator of pandas
    DataFrames in, iterator out, nothing row-at-a-time."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                px = _fake_pixels(bytes(content), int(w), int(h))
                hist, _ = np.histogram(px, bins=feat_dim, range=(0, 256))
                f = hist.astype(np.float32)
                n = np.linalg.norm(f)
                feats.append((f / n if n > 0 else f).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "feat": feats,
                    "feat_dim": feat_dim,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """mapInPandas resize: fake-decode → nearest-neighbor downsample →
    re-encode bytes. Exercises the full decode→transform→encode loop."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                px = _fake_pixels(bytes(content), int(w), int(h))
                yi = np.linspace(0, px.shape[0] - 1, target_h).astype(int)
                xi = np.linspace(0, px.shape[1] - 1, target_w).astype(int)
                out_bytes.append(px[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_bytes,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: explode frame indices 0, n, 2n …
    n_frames-1. Pure relational (explode of a sequence) — the decode of
    each sampled frame would then go through extract_features."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
    )

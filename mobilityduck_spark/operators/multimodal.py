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


def decode_real(content: bytes, kind: str):
    """The real codec step. Not available in this container.

    Intended implementation: PIL.Image.open(io.BytesIO(content)) for
    images, soundfile.read for audio, av.open for video keyframes.
    """
    raise NotImplementedError(
        "media codecs not installed in this environment; "
        "use extract_features/resize_images (deterministic fake decode)"
    )


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

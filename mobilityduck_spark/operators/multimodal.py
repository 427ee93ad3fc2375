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


# ------------------------------------------------------------- GIF
# GIF87a with a 256-entry grayscale global color table and standard
# variable-width LZW (9->12 bits, LSB-first packing, CLEAR/EOI codes,
# dictionary reset at 4096, no early-change) — a REAL dictionary
# compression round-trip in pure stdlib, complementing PNG's zlib
# (Huffman+LZ77) and JPEG's entropy coding.


def _lzw_compress(data: bytes, min_code: int = 8) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, min_code + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, w: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += w
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    emit(clear, width)
    w_seq = b""
    for b in data:
        wk = w_seq + bytes([b])
        if wk in table:
            w_seq = wk
            continue
        emit(table[w_seq], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            # dictionary full: reset (decoder mirrors on CLEAR)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = eoi + 1, min_code + 1
        w_seq = bytes([b])
    if w_seq:
        emit(table[w_seq], width)
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code: int = 8) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    pos = acc = n_bits = 0

    def read(w: int) -> int:
        nonlocal pos, acc, n_bits
        while n_bits < w:
            if pos >= len(data):
                return eoi
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        v = acc & ((1 << w) - 1)
        acc >>= w
        n_bits -= w
        return v

    table: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # the decoder assigns each entry one code LATER than the
            # encoder did (it needs the next code's first byte), so it
            # must widen one entry early to read the first wider code
            # at the encoder's width
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """GIF87a encoder for uint8 grayscale (h, w): identity 256-gray
    global color table, one image, standard GIF LZW with 255-byte
    sub-block chunking."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    gct = bytes(v for i in range(256) for v in (i, i, i))
    lzw = _lzw_compress(px.reshape(-1).tobytes())
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
        + gct
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + b"\x08"  # LZW min code size
        + bytes(blocks)
        + b"\x3b"
    )


def decode_gif(data: bytes) -> np.ndarray:
    """GIF decoder: header walk -> global color table -> de-chunk the
    image sub-blocks -> LZW decompress -> palette lookup. Supports
    87a/89a single-image grayscale-palette files (the planted class);
    interlace and local color tables raise — the documented boundary."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension block: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:
            _l, _t, w, h, ipk = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            if ipk & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            if ipk & 0x80:
                raise NotImplementedError("local color table unsupported")
            min_code = data[pos + 10]
            pos += 11
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decompress(bytes(lzw), min_code), np.uint8
            )[: w * h].reshape(h, w)
            if gct is None:
                raise NotImplementedError("GIF without global color table")
            return gct[idx, 0]  # grayscale palette: r == g == b
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image")


# ----------------------------------------------------------- mu-law
# G.711-style mu-law companding (2:1 logarithmic audio compression):
# 8-bit codes <-> 14-bit-magnitude int16 samples. Stateless per-sample
# transform, so the decode expansion has a closed integer form an
# ANSI-SQL oracle can recompute (unlike adaptive codecs such as ADPCM,
# whose per-sample state machine is not relationally expressible).

_MULAW_BIAS = 0x84  # 132


def mulaw_decode_np(codes: np.ndarray) -> np.ndarray:
    c = (~codes.astype(np.int64)) & 0xFF
    exp = (c >> 4) & 0x07
    man = c & 0x0F
    mag = (((man << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(c & 0x80, -mag, mag).astype(np.int16)


def mulaw_encode_np(samples: np.ndarray) -> np.ndarray:
    s = np.clip(samples.astype(np.int64), -32635, 32635)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.abs(s) + _MULAW_BIAS
    exp = (np.floor(np.log2(mag)).astype(np.int64) - 7).clip(0, 7)
    man = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | man)) & 0xFF).astype(np.uint8)


# ------------------------------------------------------ IMA ADPCM
# IMA/DVI ADPCM (WAV fmt tag 0x11): 4-bit adaptive differential codes
# with the standard 89-entry step table and per-code index deltas. The
# per-sample state machine (predictor, step index) is inherently
# sequential — NOT relationally expressible in general — but a planted
# fixture whose codes all carry index delta -1 pins the step at
# step_table[0]=7 forever, making the per-sample delta a CONSTANT with
# a closed form an ANSI oracle can construct (see plant_adpcm_wav).

_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)


def ima_adpcm_decode_block(block: bytes) -> np.ndarray:
    """Decode ONE mono IMA-ADPCM block: 4-byte header (int16 LE
    predictor — emitted as the block's first sample, per the WAV
    IMA-ADPCM spec — uint8 step index, reserved byte), then packed
    nibbles, LOW nibble first. Both tables and the clamp arithmetic
    are the standard IMA/DVI definition."""
    pred = int.from_bytes(block[0:2], "little", signed=True)
    idx = block[2]
    if idx > 88:
        raise ValueError("IMA ADPCM: step index out of range")
    out = [pred]
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            step = _IMA_STEP_TABLE[idx]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            if nib & 8:
                diff = -diff
            pred = max(-32768, min(32767, pred + diff))
            idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
            out.append(pred)
    return np.array(out, dtype=np.int16)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV (RIFF) decoder: returns (sample_rate, samples) with
    samples int16 (n,) mono or (n, ch). Handles PCM (fmt 1), mu-law
    (fmt 7) and mono IMA ADPCM (fmt 0x11, block-aligned)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, ch, fmt, frames = 12, None, None, None, None
    raw, ba = None, None
    while pos + 8 <= len(data):
        tag, ln = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt, ch, rate, _br, ba, bits = struct.unpack("<HHIIHH", body[:16])
            if (fmt, bits) not in ((1, 16), (7, 8), (0x11, 4)):
                raise NotImplementedError(
                    "only 16-bit PCM, 8-bit mu-law or 4-bit IMA-ADPCM "
                    "WAV supported"
                )
        elif tag == b"data":
            raw = body
        pos += 8 + ln + (ln & 1)
    if raw is not None and fmt is not None:
        if fmt == 7:  # mu-law: expand codes to int16 PCM
            frames = mulaw_decode_np(np.frombuffer(raw, dtype=np.uint8))
        elif fmt == 0x11:  # IMA ADPCM: block-wise adaptive decode
            if ch != 1:
                raise NotImplementedError("IMA ADPCM: mono only")
            blocks = [
                ima_adpcm_decode_block(raw[off : off + ba])
                for off in range(0, len(raw), ba)
            ]
            frames = np.concatenate(blocks)
        else:
            frames = np.frombuffer(raw, dtype="<i2")
    if rate is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, frames if ch == 1 else frames.reshape(-1, ch)


# ------------------------------------------------------------- JPEG
# Baseline sequential JPEG (ITU-T T.81), grayscale, pure stdlib+numpy:
# 8x8 orthonormal DCT, Annex-K luminance quantization (DC entry set to 8
# so block-constant content round-trips bit-exactly — see
# plant_blocky_jpeg), canonical Huffman entropy coding with the Annex-K
# luminance tables, 0xFF byte stuffing. The decoder reads the DQT/DHT
# tables FROM the stream (not the encoder's constants), so the marker
# walk, canonical-code reconstruction, entropy decode, dequantize and
# IDCT are all load-bearing on real compressed bytes.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K luminance quantization table, with Q[0,0] lowered 16 -> 8:
# DC = 8*(v-128) for a constant block, so Q[0,0]=8 makes the quantized
# DC code exactly (v-128) — integer-exact for every v in 0..255.
_JPEG_QTAB = np.array([
    [ 8, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

# Annex K luminance Huffman specs: (BITS counts per code length 1..16,
# symbol values in canonical order)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_DCT_C = _dct_matrix()


def _huff_encode_table(bits: list, vals: list) -> dict:
    """symbol -> (code, length) via canonical construction."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list, vals: list) -> dict:
    """(length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, length: int) -> int:
        while self.n < length:
            self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_code(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _jpeg_category(v: int) -> int:
    return int(abs(v)).bit_length()


# Annex K chrominance tables (Tables K.2 / K.4 / K.6), same public-spec
# provenance as the luminance set above. Q[0,0] lowered 17 -> 8 for the
# same reason as the luma table: a constant block's quantized DC code is
# exactly v-128, making MCU-constant planted content integer-exact.
_JPEG_QTAB_C = np.array([
    [ 8, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

_JPEG_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_VALS_C = list(range(12))
_JPEG_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_JPEG_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _encode_block(
    bwr: "_BitWriter", blk: np.ndarray, qtab: np.ndarray,
    dc_tab: dict, ac_tab: dict, pred: int,
) -> int:
    """Forward-code one level-shifted 8x8 block: DCT -> quantize ->
    zigzag -> DC-diff + run/size AC Huffman. Returns the new DC pred."""
    zz_r, zz_c = _ZIGZAG // 8, _ZIGZAG % 8
    fq = _DCT_C @ blk @ _DCT_C.T
    q = np.round(fq / qtab).astype(np.int64)
    zz = q[zz_r, zz_c]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    cat = _jpeg_category(diff)
    code, ln = dc_tab[cat]
    bwr.write(code, ln)
    if cat:
        bwr.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bwr.write(code, ln)
            run -= 16
        cat = _jpeg_category(v)
        code, ln = ac_tab[(run << 4) | cat]
        bwr.write(code, ln)
        bwr.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bwr.write(code, ln)
    return pred


def _decode_block(
    br: "_BitReader", dct: dict, act: dict, qt: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    """Entropy-decode one block: Huffman -> dezigzag -> dequantize ->
    IDCT. Returns (spatial 8x8 float block, new DC pred)."""
    zz_r, zz_c = _ZIGZAG // 8, _ZIGZAG % 8

    def extend(v: int, cat: int) -> int:
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    zz = np.zeros(64, dtype=np.int64)
    cat = br.read_code(dct)
    diff = extend(br.read(cat), cat) if cat else 0
    pred += diff
    zz[0] = pred
    i = 1
    while i < 64:
        sym = br.read_code(act)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, cat = sym >> 4, sym & 0xF
        i += run
        if i > 63:
            raise ValueError("AC index overflow")
        zz[i] = extend(br.read(cat), cat)
        i += 1
    blk = np.zeros((8, 8), dtype=np.float64)
    blk[zz_r, zz_c] = zz
    blk *= qt
    return _DCT_C.T @ blk @ _DCT_C, pred


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Baseline sequential JPEG encoder for uint8 grayscale (h, w):
    level shift → 8×8 orthonormal DCT → quantize (_JPEG_QTAB) → zigzag
    → DC-difference + run-length AC Huffman coding with the Annex-K
    luminance tables. Edges pad by replication; output decodes in any
    standards-conformant JPEG decoder."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise NotImplementedError("encode_jpeg: grayscale (h, w) only")
    h, w = px.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[-1:, :]  # replicate bottom edge
    padded[:, w:] = padded[:, w - 1 : w]  # replicate right edge
    padded -= 128.0

    dc_tab = _huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    zz_r, zz_c = _ZIGZAG // 8, _ZIGZAG % 8
    bwr = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            pred = _encode_block(bwr, blk, _JPEG_QTAB, dc_tab, ac_tab, pred)
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qzz = _JPEG_QTAB[zz_r, zz_c].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qzz)
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bwr.buf) + b"\xff\xd9"
    )


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JPEG decoder, grayscale single-scan: marker
    walk (DQT/SOF0/DHT/SOS), canonical-Huffman entropy decode with the
    tables READ FROM THE STREAM, dequantize, IDCT, level shift, crop.
    Multi-component (color), progressive (SOF2), 12-bit, and restart
    intervals raise NotImplementedError — the documented boundary of the
    pure-stdlib codec. Returns (h, w) uint8."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple, dict] = {}
    h = w = None
    comp_q = 0
    scan_pos = None
    dc_id = ac_id = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(
                    body, np.uint8, 64, b + 1
                ).astype(np.int64)
                qtabs[tq] = tab.reshape(8, 8)
                b += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise NotImplementedError(
                    "only 8-bit grayscale baseline JPEG supported"
                )
            if body[7] != 0x11:
                raise NotImplementedError("subsampling unsupported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                b += 17 + nv
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            scan_pos = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_pos is None or h is None:
        raise ValueError("JPEG missing SOF/SOS")
    qt = qtabs[comp_q]
    dct, act = htabs[(0, dc_id)], htabs[(1, ac_id)]
    br = _BitReader(data, scan_pos)
    bh, bw = -(-h // 8), -(-w // 8)
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            spat, pred = _decode_block(br, dct, act, qt, pred)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spat
    px = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    return px[:h, :w]


def encode_jpeg_color(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Baseline sequential COLOR JPEG encoder, 4:2:0 YCbCr (the web's
    dominant photo layout): interleaved MCUs of four Y blocks + one Cb
    + one Cr, Annex-K luminance tables for Y and chrominance tables for
    Cb/Cr (both quant DC entries lowered to 8 — MCU-constant content
    round-trips bit-exactly), independent DC predictors per component.

    Takes the planes in the STORED color space (like libjpeg's raw-data
    mode): y is (16*mh, 16*mw) uint8; cb and cr are the 2x2-subsampled
    (8*mh, 8*mw) planes. Output decodes in any standards-conformant
    JPEG decoder."""
    import struct

    y = np.asarray(y, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    h, w = y.shape
    if h % 16 or w % 16:
        raise NotImplementedError(
            "encode_jpeg_color: luma dims must be multiples of 16"
        )
    mh, mw = h // 16, w // 16
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("chroma planes must be 2x2-subsampled luma dims")

    dc_y = _huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_y = _huff_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc_c = _huff_encode_table(_JPEG_DC_BITS_C, _JPEG_DC_VALS_C)
    ac_c = _huff_encode_table(_JPEG_AC_BITS_C, _JPEG_AC_VALS_C)
    yf = y.astype(np.float64) - 128.0
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    bwr = _BitWriter()
    py = pcb = pcr = 0
    for my in range(mh):
        for mx in range(mw):
            for sy in range(2):  # four Y blocks, raster order
                for sx in range(2):
                    r0, c0 = my * 16 + sy * 8, mx * 16 + sx * 8
                    py = _encode_block(
                        bwr, yf[r0 : r0 + 8, c0 : c0 + 8],
                        _JPEG_QTAB, dc_y, ac_y, py,
                    )
            r0, c0 = my * 8, mx * 8
            pcb = _encode_block(
                bwr, cbf[r0 : r0 + 8, c0 : c0 + 8],
                _JPEG_QTAB_C, dc_c, ac_c, pcb,
            )
            pcr = _encode_block(
                bwr, crf[r0 : r0 + 8, c0 : c0 + 8],
                _JPEG_QTAB_C, dc_c, ac_c, pcr,
            )
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_r, zz_c = _ZIGZAG // 8, _ZIGZAG % 8
    dqt = seg(
        0xFFDB,
        b"\x00" + _JPEG_QTAB[zz_r, zz_c].astype(np.uint8).tobytes()
        + b"\x01" + _JPEG_QTAB_C[zz_r, zz_c].astype(np.uint8).tobytes(),
    )
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x22\x00"  # Y: 2x2 sampling, qtab 0
        + b"\x02\x11\x01"  # Cb: 1x1, qtab 1
        + b"\x03\x11\x01",  # Cr: 1x1, qtab 1
    )
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        + b"\x01" + bytes(_JPEG_DC_BITS_C) + bytes(_JPEG_DC_VALS_C)
        + b"\x11" + bytes(_JPEG_AC_BITS_C) + bytes(_JPEG_AC_VALS_C),
    )
    sos = seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bwr.buf) + b"\xff\xd9"


def decode_jpeg_color(data: bytes):
    """Baseline sequential COLOR JPEG decoder, 3-component 4:2:0
    interleaved scan: full marker walk with DQT/DHT tables read FROM
    the stream, per-component Huffman/quant selection, independent DC
    predictors, MCU-interleaved entropy decode. Returns the stored
    (y, cb, cr) planes as uint8 arrays — y at (h, w), chroma at the
    subsampled (ceil(h/2), ceil(w/2)) — so integer-exact statistics
    can be taken in the file's native color space; use ycbcr_to_rgb
    for display-space pixels. Non-4:2:0 sampling, progressive, 12-bit
    and restart intervals raise NotImplementedError (same documented
    boundary as the grayscale decoder)."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple, dict] = {}
    h = w = None
    comps: list[tuple] = []  # (comp_id, hs, vs, qtab_id)
    scan_tabs: dict[int, tuple] = {}
    scan_pos = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(
                    body, np.uint8, 64, b + 1
                ).astype(np.int64)
                qtabs[tq] = tab.reshape(8, 8)
                b += 65
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 3:
                raise NotImplementedError(
                    "decode_jpeg_color: 8-bit 3-component baseline only"
                )
            for c in range(3):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, body[8 + 3 * c]))
            if [(c[1], c[2]) for c in comps] != [(2, 2), (1, 1), (1, 1)]:
                raise NotImplementedError(
                    "decode_jpeg_color: 4:2:0 sampling only"
                )
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                b += 17 + nv
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            if ns != 3:
                raise NotImplementedError("expected 3-component scan")
            for c in range(3):
                cid = body[1 + 2 * c]
                scan_tabs[cid] = (body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0xF)
            scan_pos = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_pos is None or h is None:
        raise ValueError("JPEG missing SOF/SOS")

    mh, mw = -(-h // 16), -(-w // 16)
    yp = np.empty((mh * 16, mw * 16), dtype=np.float64)
    cbp = np.empty((mh * 8, mw * 8), dtype=np.float64)
    crp = np.empty((mh * 8, mw * 8), dtype=np.float64)
    br = _BitReader(data, scan_pos)
    tabs = []
    for cid, _hs, _vs, qid in comps:
        dc_id, ac_id = scan_tabs[cid]
        tabs.append((htabs[(0, dc_id)], htabs[(1, ac_id)], qtabs[qid]))
    py = pcb = pcr = 0
    for my in range(mh):
        for mx in range(mw):
            for sy in range(2):
                for sx in range(2):
                    spat, py = _decode_block(br, *tabs[0], py)
                    r0, c0 = my * 16 + sy * 8, mx * 16 + sx * 8
                    yp[r0 : r0 + 8, c0 : c0 + 8] = spat
            spat, pcb = _decode_block(br, *tabs[1], pcb)
            cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = spat
            spat, pcr = _decode_block(br, *tabs[2], pcr)
            crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = spat

    def clip8(a):
        return np.clip(np.round(a + 128.0), 0, 255).astype(np.uint8)

    ch, cw = -(-h // 2), -(-w // 2)
    return clip8(yp)[:h, :w], clip8(cbp)[:ch, :cw], clip8(crp)[:ch, :cw]


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF YCbCr -> RGB with nearest-neighbor chroma upsampling:
    returns (h, w, 3) uint8. Display-space conversion only — oracle
    statistics are taken on the stored planes to keep them
    rounding-free."""
    yf = y.astype(np.float64)
    cbu = np.repeat(np.repeat(cb, 2, 0), 2, 1)[: y.shape[0], : y.shape[1]]
    cru = np.repeat(np.repeat(cr, 2, 0), 2, 1)[: y.shape[0], : y.shape[1]]
    cbf = cbu.astype(np.float64) - 128.0
    crf = cru.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def decode_real(content: bytes, kind: str):
    """Real codec dispatch by magic bytes: PNG, uncompressed BMP,
    GIF (LZW), PCM and mu-law WAV, and baseline grayscale JPEG decode
    fully in pure stdlib+numpy (above). MP3/H.264 need full
    entropy/psychoacoustic codec stacks absent from this container and
    still raise — callers fall back to the deterministic fake-decode
    path for those."""
    content = bytes(content)
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    if content[:2] == b"\xff\xd8":
        return decode_jpeg(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(content)
    raise NotImplementedError(
        "unsupported media container (PNG/BMP/GIF/PCM+mu-law-WAV/"
        "baseline-JPEG decode natively; MP3/H.264 need codec libs not "
        "in this environment)"
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


def plant_blocky_jpeg(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL baseline JPEG per id with analytically-known
    content: dims 8·(2+id%3) × 8·(2+id%2), and every 8×8 block constant
    at value(bx, by) = (5·bx + 11·by + 3·id) % 256. A constant block's
    DCT is DC-only with DC = 8·(v−128); the quant table's DC entry is 8,
    so the quantized code is exactly v−128 and the decode reconstructs v
    bit-exactly — the lossy pipeline becomes lossless on this content
    BY CONSTRUCTION, which lets an ANSI-SQL oracle recompute every
    decode statistic from the block formula while the engine runs the
    full marker-walk → canonical-Huffman → dequantize → IDCT path on
    genuine entropy-coded bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                nbx, nby = 2 + mid % 3, 2 + mid % 2
                bx = np.arange(nbx, dtype=np.int64)[None, :]
                by = np.arange(nby, dtype=np.int64)[:, None]
                vals = (5 * bx + 11 * by + 3 * mid) % 256
                px = np.kron(vals, np.ones((8, 8), np.int64)).astype(np.uint8)
                out.append((mid, encode_jpeg(px)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.mapInPandas(op, schema="media_id long, content binary")


def plant_mcu_jpeg_color(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL color 4:2:0 JPEG per id with analytically-known
    content: (2+id%3) × (2+id%2) MCUs, every 16×16 MCU constant per
    channel at y = (5mx+11my+3id)%256, cb = (7mx+3my+5id)%256,
    cr = (11mx+5my+7id)%256. MCU-constant content makes all six blocks
    of each MCU DC-only, and both quant tables' DC entry is 8, so the
    full color pipeline (interleaved scan, two Huffman table pairs, two
    quant tables, three DC predictors) reconstructs the planes
    bit-exactly — lettings an ANSI-SQL oracle recompute every stored-
    plane statistic from the MCU formula."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                nmx, nmy = 2 + mid % 3, 2 + mid % 2
                mx = np.arange(nmx, dtype=np.int64)[None, :]
                my = np.arange(nmy, dtype=np.int64)[:, None]
                yv = (5 * mx + 11 * my + 3 * mid) % 256
                cbv = (7 * mx + 3 * my + 5 * mid) % 256
                crv = (11 * mx + 5 * my + 7 * mid) % 256
                one16 = np.ones((16, 16), np.int64)
                one8 = np.ones((8, 8), np.int64)
                data = encode_jpeg_color(
                    np.kron(yv, one16).astype(np.uint8),
                    np.kron(cbv, one8).astype(np.uint8),
                    np.kron(crv, one8).astype(np.uint8),
                )
                out.append((mid, data))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.mapInPandas(op, schema="media_id long, content binary")


def decode_stats_color(media: DataFrame) -> DataFrame:
    """Decode real color JPEG bytes and emit per-item statistics of the
    STORED planes (native YCbCr color space — integer-exact, no
    rounding formula enters the oracle): dims from the SOF header, one
    exact sum per plane."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                y, cb, cr = decode_jpeg_color(bytes(content))
                rows.append(
                    (int(mid), y.shape[1], y.shape[0],
                     int(y.astype(np.int64).sum()),
                     int(cb.astype(np.int64).sum()),
                     int(cr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "sum_y", "sum_cb", "sum_cr",
                ],
            )

    return media.mapInPandas(
        op,
        schema=(
            "media_id long, width int, height int, "
            "sum_y long, sum_cb long, sum_cr long"
        ),
    )


def plant_gradient_gif(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL GIF87a per id with analytically-known content:
    dims (14 + id%18) x (10 + id%14), pixel(x, y) = (5x + 11y + 7·id)
    % 256. Same oracle contract as plant_gradient_png, but the decode
    path is dictionary (LZW) decompression + palette lookup instead of
    inflate + defilter — the third distinct compression family under
    real-codec test (zlib, DCT-entropy, LZW)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 14 + mid % 18, 10 + mid % 14
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = ((5 * x + 11 * y + 7 * mid) % 256).astype(np.uint8)
                out.append((mid, encode_gif(px)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.mapInPandas(op, schema="media_id long, content binary")


def plant_mulaw_wav(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL mu-law (G.711-style, fmt tag 7) WAV per id:
    rate 8000, n = 3000 + (id%7)*300, code byte(i) = (5i + 7·id) % 256.
    Because mu-law expansion is a STATELESS closed integer form, an
    ANSI oracle can recompute the expanded int16 samples directly from
    the code formula — the engine meanwhile parses a genuine RIFF
    container whose fmt chunk selects the companded decode path."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 3000 + (mid % 7) * 300
                i = np.arange(n, dtype=np.int64)
                codes = ((5 * i + 7 * mid) % 256).astype(np.uint8)
                data = codes.tobytes()
                fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
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


def plant_adpcm_wav(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL mono IMA-ADPCM WAV (fmt tag 0x11) per id, with a
    PROVABLE decode: every 4-bit code in the stream is the constant
    c = 1 + (id % 3) ∈ {1,2,3}. All three codes carry index delta -1
    (codes 0-3 map to -1 in the IMA index table), so the step index —
    started at 0 in the block header — clamps at 0 forever and the step
    stays step_table[0] = 7. The per-sample delta is then the constant
    bit-decomposition of 7: code 1 → 7>>2 = 1, code 2 → 7>>1 = 3,
    code 3 → 7>>2 + 7>>1 = 4. With header predictor 0 (emitted as
    sample 0) the decoded stream is exactly 0, d, 2d, …, nd — never
    near the int16 clamp (max 3800·4 = 15200) — so an ANSI oracle can
    CONSTRUCT n_samples = n+1 and sum = d·n(n+1)/2 from the id alone,
    while the engine runs the genuine table-driven state machine over
    a real RIFF container (n = 3000 + (id%5)·200 nibbles, one block)."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 3000 + (mid % 5) * 200  # even: packs to whole bytes
                code = 1 + (mid % 3)
                body = bytes([code | (code << 4)]) * (n // 2)
                header = struct.pack("<hBB", 0, 0, 0)  # pred=0, idx=0
                data = header + body
                ba = len(data)  # single block
                spb = 1 + 2 * (ba - 4)
                fmt = struct.pack(
                    "<HHIIHHHH", 0x11, 1, 8000, 8000 * ba // (2 * spb),
                    ba, 4, 2, spb,
                )
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


REAL_FEATURE_SCHEMA = (
    "media_id long, width int, height int, hist array<long>"
)


def extract_features_real(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Feature extraction over REAL decoded pixels (decode_real): per
    image, an integer `feat_dim`-bin histogram of the reconstructed
    pixel values — integer-exact, so an oracle that knows the expected
    pixels can recompute the features bin by bin. (The production
    embedding model is a stand-in histogram here; the contract —
    Arrow-batched decode → fixed-width feature vector — is the same.)"""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_real(bytes(content), "image")
                hist, _ = np.histogram(px, bins=feat_dim, range=(0, 256))
                rows.append(
                    (int(mid), px.shape[1], px.shape[0],
                     hist.astype(np.int64).tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "hist"]
            )

    return media.mapInPandas(op, schema=REAL_FEATURE_SCHEMA)


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


def plant_phash_png(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL 32x32 grayscale PNG per id with analytically-known
    content for the perceptual-hash dedup oracle: base = media_id // 10,
    variant = media_id % 10, pixel(x, y) = (3x + 7y + 11*base) % 199 +
    20*variant. Variants of the same base are BYTE-DIFFERENT images
    (uniform brightness shift, re-compressed) whose average-hash is
    provably identical — a uniform shift moves every block mean and the
    global mean by the same amount, so every strict block>global
    comparison is preserved. That is exactly the perceptual (not
    byte-exact) duplicate class an image dedup pass must catch, and the
    ANSI oracle can recompute every hash bit from the pixel formula.
    Keep variant <= 2 so pixels stay below 256 (198 + 40)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                base, variant = mid // 10, mid % 10
                x = np.arange(32, dtype=np.int64)[None, :]
                y = np.arange(32, dtype=np.int64)[:, None]
                px = ((3 * x + 7 * y + 11 * base) % 199 + 20 * variant)
                out.append((mid, encode_png(px.astype(np.uint8))))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.mapInPandas(op, schema="media_id long, content binary")


def ahash_images(media: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) per image: decode real bytes, crop to a
    grid-divisible region, block-average down to grid x grid, threshold
    each block STRICTLY above the global mean. The comparison is kept
    integer-exact (grid^2 * block_sum > total_sum) so an ANSI oracle can
    reproduce every bit without float drift. Returns the hash as a
    grid^2-char '0'/'1' string (row-major), which both engines can
    build without 64-bit shift-overflow gymnastics.

    Scale shape (100 TB): embarrassingly parallel mapInPandas — bytes
    never leave the Arrow batch; the downstream duplicate grouping is a
    single hash-partitioned shuffle on a high-entropy key."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_real(bytes(content), "image").astype(np.int64)
                h, w = px.shape
                hc, wc = (h // grid) * grid, (w // grid) * grid
                crop = px[:hc, :wc]
                bsum = crop.reshape(
                    grid, hc // grid, grid, wc // grid
                ).sum(axis=(1, 3))
                tsum = int(bsum.sum())
                bits = (grid * grid * bsum > tsum).astype(np.uint8)
                rows.append(
                    (int(mid), "".join("1" if b else "0"
                                       for b in bits.ravel()))
                )
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.mapInPandas(op, schema="media_id long, ahash string")


def plant_fp_wav(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL PCM WAV per id for the audio-fingerprint dedup
    oracle: base = media_id // 10, variant = media_id % 10,
    n = 4000 + (base%5)*400 samples of
    sample(i) = ((7919·i + 104729·base) % 16384 − 8192) · (1+variant).
    Variants of one base are byte-DIFFERENT files (every sample
    scaled) whose energy fingerprint is provably identical — a uniform
    amplitude scale k multiplies every frame energy and the total
    energy by k², preserving every strict frame>mean comparison. That
    is the loudness-normalization duplicate class an audio dedup pass
    must catch. Scale ≤ 2 keeps |sample| ≤ 16382 < 2^15 (no clip)."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                base, variant = mid // 10, mid % 10
                n = 4000 + (base % 5) * 400
                i = np.arange(n, dtype=np.int64)
                s = (((7919 * i + 104729 * base) % 16384 - 8192)
                     * (1 + variant)).astype("<i2")
                data = s.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
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


def fingerprint_audio(media: DataFrame, frames: int = 64) -> DataFrame:
    """Energy fingerprint per audio item — the audio sibling of
    ahash_images: decode real WAV bytes, crop to a frame-divisible
    length, split into `frames` equal frames, threshold each frame's
    energy (sum of squared samples, exact int64) STRICTLY above the
    mean via the integer comparison frames·e_j > e_total. Returns the
    fingerprint as a '0'/'1' string. Invariant to uniform amplitude
    scaling (energies scale together), sensitive to structure.

    Scale shape: embarrassingly parallel mapInPandas; downstream dup
    grouping is one hash-partitioned shuffle on a high-entropy key."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, samples = decode_real(bytes(content), "audio")
                s = samples.astype(np.int64)
                ln = (s.size // frames) * frames
                e = (s[:ln] ** 2).reshape(frames, ln // frames).sum(axis=1)
                tot = int(e.sum())
                rows.append(
                    (int(mid), "".join(
                        "1" if frames * v > tot else "0" for v in e
                    ))
                )
            yield pd.DataFrame(rows, columns=["media_id", "afp"])

    return media.mapInPandas(op, schema="media_id long, afp string")


def encode_tiff(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit grayscale uncompressed little-endian TIFF
    (baseline TIFF 6.0: II byte order, one IFD, strip-based storage in
    a single strip). Written from the public TIFF 6.0 spec — tag
    directory with the seven baseline tags a grayscale reader needs:
    ImageWidth(256), ImageLength(257), BitsPerSample(258),
    Compression(259=1), PhotometricInterpretation(262=1 BlackIsZero),
    StripOffsets(273), RowsPerStrip(278), StripByteCounts(279)."""
    import struct

    h, w = pixels.shape
    data = pixels.astype(np.uint8).tobytes()
    n_tags = 8
    # layout: header(8) + IFD(2 + 12*n + 4) + pixel data
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4

    def tag(tid: int, ttype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHI4s", tid, ttype, count,
                           struct.pack("<I", value))

    tags = [
        tag(256, 3, 1, w),          # ImageWidth SHORT
        tag(257, 3, 1, h),          # ImageLength SHORT
        tag(258, 3, 1, 8),          # BitsPerSample
        tag(259, 3, 1, 1),          # Compression: none
        tag(262, 3, 1, 1),          # Photometric: BlackIsZero
        tag(273, 4, 1, data_off),   # StripOffsets LONG
        tag(278, 3, 1, h),          # RowsPerStrip: one strip
        tag(279, 4, 1, len(data)),  # StripByteCounts
    ]
    ifd = struct.pack("<H", n_tags) + b"".join(tags) + struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", ifd_off) + ifd + data


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode a baseline uncompressed grayscale TIFF (II or MM byte
    order, 8-bit, strip-based, single sample). A real tag-directory
    walk: reads the IFD chain's first directory, honors SHORT/LONG
    value encodings (inline when they fit in the 4 value bytes),
    multi-strip layouts, and RowsPerStrip defaults. Raises
    NotImplementedError at the documented boundary (compression,
    BitsPerSample != 8, tiles, palettes)."""
    import struct

    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    if struct.unpack(e + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF: bad magic")
    ifd_off = struct.unpack(e + "I", data[4:8])[0]
    n = struct.unpack(e + "H", data[ifd_off:ifd_off + 2])[0]
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n):
        o = ifd_off + 2 + 12 * i
        tid, ttype, count = struct.unpack(e + "HHI", data[o:o + 8])
        tags[tid] = (ttype, count, data[o + 8:o + 12])

    sizes = {1: 1, 3: 2, 4: 4}

    def values(tid: int, default=None):
        if tid not in tags:
            if default is not None:
                return default
            raise ValueError(f"TIFF missing required tag {tid}")
        ttype, count, raw = tags[tid]
        if ttype not in sizes:
            raise NotImplementedError(f"TIFF tag type {ttype}")
        total = sizes[ttype] * count
        if total > 4:  # value bytes are an offset to the real values
            off = struct.unpack(e + "I", raw)[0]
            raw = data[off:off + total]
        else:
            raw = raw[:total]
        fmt = {1: "B", 3: "H", 4: "I"}[ttype]
        return list(struct.unpack(e + str(count) + fmt, raw))

    w = values(256)[0]
    h = values(257)[0]
    bps = values(258, [8])[0]
    comp = values(259, [1])[0]
    if comp != 1:
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
    if bps != 8:
        raise NotImplementedError(f"TIFF BitsPerSample {bps} unsupported")
    offs = values(273)
    rps = values(278, [h])[0]
    counts = values(279, [w * min(rps, h)] * len(offs))
    rows = []
    remaining = h
    for off, cnt in zip(offs, counts):
        nrows = min(rps, remaining)
        strip = np.frombuffer(data[off:off + cnt], dtype=np.uint8)
        rows.append(strip[: nrows * w].reshape(nrows, w))
        remaining -= nrows
    return np.vstack(rows)


def plant_gradient_tiff(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Encode one REAL baseline TIFF per id with analytically-known
    content (the PNG planter's contract on a different container):
    dims (16 + id%16) x (12 + id%12), pixel(x, y) = (5x + 3y + id) % 251.
    The engine path walks a genuine tag directory + strip layout; the
    ANSI oracle recomputes every statistic from the pixel formula."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 16 + mid % 16, 12 + mid % 12
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = ((5 * x + 3 * y + mid) % 251).astype(np.uint8)
                out.append((mid, encode_tiff(px)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.mapInPandas(op, schema="media_id long, content binary")


def tiff_stats(media: DataFrame) -> DataFrame:
    """Decode TIFF bytes and emit per-item pixel statistics — the
    decode_stats contract for the TIFF container path."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_tiff(bytes(content)).astype(np.int64)
                rows.append(
                    (int(mid), px.shape[1], px.shape[0],
                     int(px.size), int(px.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_px", "sum_px"],
            )

    return media.mapInPandas(op, schema=DECODE_STATS_SCHEMA)

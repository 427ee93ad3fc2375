"""Deduplication operators for training-data pipelines.

Four tiers, in increasing fuzziness:
- exact: md5 fingerprint groupBy (one shuffle on the hash — even key
  distribution by construction);
- n-gram Jaccard: exact set similarity within cheap blocking keys;
- MinHash + LSH: shingles → minhash signature → band buckets →
  candidate pairs via equi-join on (band, band-hash) — the web-scale
  path: no pairwise blowup, shuffle keys are bucket hashes;
- SimHash: 64-bit bit-vote fingerprint, near-dups = small Hamming
  distance within LSH-style chunk buckets.

All expression-based (xxhash64/md5 are JVM built-ins); no UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as TX
from ..functions.span import _c


# ---------------------------------------------------------------- exact
def exact_dups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint,
    group size, representative (min id). One hash-partitioned shuffle."""
    fp = docs.select(
        F.col(id_col), TX.fingerprint(F.col(text_col)).alias("fp")
    )
    return fp.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min(id_col).alias("keep_id"),
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative per fingerprint (min id wins)."""
    w = Window.partitionBy(TX.fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------- jaccard
def ngram_set(text, n: int = 3) -> Column:
    """Distinct word-n-gram hash set."""
    return F.array_distinct(TX.rolling_hash_shingles(text, k=n))


def jaccard(a, b) -> Column:
    inter = F.size(F.array_intersect(_c(a), _c(b)))
    union = F.size(F.array_union(_c(a), _c(b)))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Exact n-gram Jaccard over blocked candidate pairs. Blocking keys
    bound the quadratic term; at scale use minhash_lsh_pairs instead."""
    pre = docs.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        ngram_set(F.col(text_col), n).alias("grams"),
    )
    a = pre
    b = pre.select(
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("id").alias("id_b"),
        F.col("grams").alias("grams_b"),
    )
    cond = [a[c] == b[f"{c}_b"] for c in block_cols] + [a["id"] < b["id_b"]]
    joined = a.join(b, cond)
    return (
        joined.select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            F.round(jaccard(F.col("grams"), F.col("grams_b")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


# ---------------------------------------------------------------- minhash
_LONG_MAX = (1 << 63) - 1


def minhash_signature_from_shingles(shingles, num_hashes: int = 32) -> Column:
    """MinHash signature in ONE pass over the shingle array: fold with an
    elementwise-min accumulator of num_hashes lanes (zip_with + least).

    Single traversal matters: the naive per-hash-function formulation
    (num_hashes separate transforms over the shingle expression)
    re-evaluates the shingle subtree per lane under interpreted
    higher-order-function eval — measured 180s vs ~4s at sf0.1.
    """
    init = F.array(*[F.lit(_LONG_MAX).cast("long") for _ in range(num_hashes)])

    def lane_hashes(s: Column) -> Column:
        return F.array(*[F.xxhash64(F.lit(i), s) for i in range(num_hashes)])

    return F.aggregate(
        _c(shingles),
        init,
        lambda acc, s: F.zip_with(acc, lane_hashes(s), lambda a, b: F.least(a, b)),
    )


def minhash_signature(text, num_hashes: int = 32, shingle_k: int = 5) -> Column:
    """MinHash signature of a text column (shingle + fold)."""
    return minhash_signature_from_shingles(
        TX.rolling_hash_shingles(text, k=shingle_k), num_hashes
    )


def minhash_signature_numpy_udf():
    """Pandas UDF: shingle-hash array → minhash signature via a numpy
    universal-hash family (lane_i(h) = a_i·h + b_i over uint64, wrapping
    arithmetic). ~10× the interpreted zip_with fold at sf0.1: the 32-lane
    min runs as one (shingles × lanes) vectorized matrix op per doc."""
    from pyspark.sql import types as T_

    rng = np.random.default_rng(42)
    A = rng.integers(1, 2**63 - 1, size=64, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    B = rng.integers(0, 2**63 - 1, size=64, dtype=np.uint64)

    @F.pandas_udf(T_.ArrayType(T_.LongType()))
    def sig(shingles: pd.Series, num_hashes: pd.Series) -> pd.Series:
        out = []
        for sh, nh in zip(shingles, num_hashes):
            nh = int(nh)
            if sh is None or len(sh) == 0:
                out.append([0] * nh)
                continue
            h = np.asarray(sh, dtype=np.int64).astype(np.uint64)
            with np.errstate(over="ignore"):
                lanes = h[:, None] * A[None, :nh] + B[None, :nh]
            out.append(lanes.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return sig


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    signature → `bands` bands of num_hashes/bands rows; band hash =
    xxhash64 of the band slice; candidates = pairs sharing ≥1 band
    bucket (deduped via min band); estimated Jaccard = fraction of equal
    signature positions. Shuffles: one groupBy for signatures is not
    needed (map-side), one equi-join shuffle on (band, hash) — this is
    the plan that scales to billions of docs.
    """
    rows = num_hashes // bands
    # select barriers: shingles once (JVM xxhash), then the signature in a
    # numpy pandas UDF (vectorized lane-min — the interpreted fold costs
    # ~8s at sf0.1, the numpy kernel <1s)
    shingled = docs.select(
        F.col(id_col).alias("id"),
        TX.rolling_hash_shingles(F.col(text_col), k=shingle_k).alias("sh"),
    )
    sig_udf = minhash_signature_numpy_udf()
    sig = shingled.select(
        "id",
        sig_udf(F.col("sh"), F.lit(num_hashes)).alias("sig"),
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at(F.col("sig"), b * rows + r + 1) for r in range(rows)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))
    # both sides of the candidate self-join read the banded signatures;
    # materialize once (shingle+signature is the expensive stage)
    banded = banded.persist()
    other = banded.select(
        F.col("id").alias("id_b"),
        F.col("sig").alias("sig_b"),
        F.col("band").alias("band_b"),
        F.col("bhash").alias("bhash_b"),
    )
    cand = banded.join(
        other,
        (F.col("band") == F.col("band_b"))
        & (F.col("bhash") == F.col("bhash_b"))
        & (F.col("id") < F.col("id_b")),
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(num_hashes)
    return (
        cand.groupBy("id", "id_b")
        .agg(F.first("sig").alias("sig"), F.first("sig_b").alias("sig_b"))
        .select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            F.round(est, 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


# ---------------------------------------------------------------- simhash
def simhash(text, hashbits: int = 64) -> Column:
    """64-bit SimHash: per token hash, vote +1/-1 per bit, sign →
    fingerprint bit. Expression-only via bit arithmetic over an
    aggregate of per-bit counters."""
    toks = TX.tokens(text)
    hashes = F.transform(toks, lambda w: F.xxhash64(w))
    # votes[b] = Σ tokens (bit b set ? 1 : -1); bit b of result = votes[b] > 0
    bit_cols = []
    for b in range(hashbits):
        def _bit_set(bb):
            return lambda h: F.shiftright(h, bb).bitwiseAND(F.lit(1)) == 1

        ones = F.size(F.filter(hashes, _bit_set(b)))
        votes = ones * 2 - F.size(hashes)
        bit_cols.append(F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for b, bit in enumerate(bit_cols):
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return out


def hamming64(a, b) -> Column:
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of
    `chunks` 16-bit fingerprint chunks (pigeonhole guarantees recall for
    hamming < chunks), verified by exact Hamming distance."""
    sh = docs.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    width = 64 // chunks
    mask = (1 << width) - 1
    chunked = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "sh", "cc.chunk", "cc.ckey")
    other = chunked.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
        F.col("chunk").alias("chunk_b"), F.col("ckey").alias("ckey_b"),
    )
    cand = chunked.join(
        other,
        (F.col("chunk") == F.col("chunk_b"))
        & (F.col("ckey") == F.col("ckey_b"))
        & (F.col("id") < F.col("id_b")),
    )
    return (
        cand.groupBy("id", "id_b")
        .agg(F.first("sh").alias("sh"), F.first("sh_b").alias("sh_b"))
        .select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            hamming64(F.col("sh"), F.col("sh_b")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs_exploded(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Scalable exact n-gram Jaccard: explode grams → equi-join on
    (block, gram) → count shared grams per pair → |A∩B| / (|A|+|B|−|A∩B|).

    Identical results to ngram_jaccard_pairs, different physical plan:
    instead of interpreted array_intersect per candidate pair (quadratic
    in block size, measured 22s at sf0.1), the intersection is a plain
    shuffled hash join on gram hash — partitions by gram, no per-row
    array scans, and survives block-size skew at 100 TB.
    """
    pre = docs.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        ngram_set(F.col(text_col), n).alias("grams"),
    ).select(
        *block_cols, "id", F.size("grams").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    a = pre
    b = pre.select(
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("id").alias("id_b"),
        F.col("n_grams").alias("n_grams_b"),
        F.col("gram").alias("gram_b"),
    )
    cond = (
        [a[c] == b[f"{c}_b"] for c in block_cols]
        + [a["id"] < b["id_b"], a["gram"] == b["gram_b"]]
    )
    inter = (
        a.join(b, cond)
        .groupBy("id", "id_b", "n_grams", "n_grams_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (
        F.col("n_grams") + F.col("n_grams_b") - F.col("inter")
    )
    return (
        inter.select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            F.round(jac, 6).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def simhash_pairs_numpy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with the fingerprint computed in a
    mapInPandas numpy kernel (md5-based token hashes, bit votes as a
    (tokens × 64) matrix sum) — ~10× the interpreted-expression simhash
    at sf0.1. Bucketing/verify stays relational (same as
    simhash_near_dup_pairs)."""
    import hashlib

    import numpy as np
    import pandas as pd

    def compute(batches):
        for pdf in batches:
            fps = []
            for text in pdf[text_col]:
                toks = str(text).lower().split()
                if not toks:
                    fps.append(0)
                    continue
                hs = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                        for t in set(toks) and toks
                    ),
                    dtype=np.uint64,
                    count=len(toks),
                )
                bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = bits.sum(0) * 2 - len(toks)
                fp = np.uint64(0)
                fp_bits = (votes > 0).astype(np.uint64)
                fp = (fp_bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
                fps.append(int(np.int64(fp)))  # reinterpret as signed
            yield pd.DataFrame({"id": pdf[id_col], "sh": fps})

    sh = docs.mapInPandas(compute, schema="id long, sh long")
    width = 64 // chunks
    mask = (1 << width) - 1
    chunked = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "sh", "cc.chunk", "cc.ckey")
    other = chunked.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
        F.col("chunk").alias("chunk_b"), F.col("ckey").alias("ckey_b"),
    )
    cand = chunked.join(
        other,
        (F.col("chunk") == F.col("chunk_b"))
        & (F.col("ckey") == F.col("ckey_b"))
        & (F.col("id") < F.col("id_b")),
    )
    return (
        cand.groupBy("id", "id_b")
        .agg(F.first("sh").alias("sh"), F.first("sh_b").alias("sh_b"))
        .select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            hamming64(F.col("sh"), F.col("sh_b")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )

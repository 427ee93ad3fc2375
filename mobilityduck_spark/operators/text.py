"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting. All pure Column expressions
(JVM regex/hash) — no Python in the row path, so they run at full scan
speed over 100 TB of documents.
"""

# no `from __future__ import annotations`: pandas_udf factories below
# need evaluatable (non-string) type hints

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..functions.span import _c

_WS = r"\s+"


def tokens(text) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(_c(text))), _WS)


def token_count(text) -> Column:
    return F.size(tokens(text))


def char_count(text) -> Column:
    return F.length(_c(text))


def avg_word_len(text) -> Column:
    t = tokens(text)
    total = F.aggregate(
        F.transform(t, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def alpha_ratio(text) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    txt = _c(text)
    clean = F.regexp_replace(txt, r"[^A-Za-z ]", "")
    return F.when(
        F.length(txt) > 0, F.length(clean) / F.length(txt)
    ).otherwise(F.lit(0.0))


_STOPWORDS = ("the", "a", "and", "of", "is", "to", "in", "that", "it", "for")


def stopword_ratio(text) -> Column:
    t = tokens(text)
    sw = F.size(F.filter(t, lambda x: x.isin(*_STOPWORDS)))
    return F.when(F.size(t) > 0, sw / F.size(t)).otherwise(F.lit(0.0))


def quality_score(text) -> Column:
    """Composite [0,1] quality heuristic: alpha ratio, stopword presence,
    mean word length in a sane band — the standard cheap pre-filter in
    web-scale corpus cleaning (C4-style)."""
    aw = avg_word_len(text)
    wordlen_ok = F.when((aw >= 3.0) & (aw <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        (alpha_ratio(text) + F.least(stopword_ratio(text) * 5, F.lit(1.0)) + wordlen_ok)
        / 3.0,
        6,
    )


def gopher_flags(text) -> Column:
    """Gopher-rule quality flags (Rae et al. 2021 §A1.1, the standard
    pretraining pre-filter set), as ONE struct of booleans so a corpus
    pass computes every rule in a single scan-speed projection:

    - n_tokens in [50, 100000]
    - mean word length in [3, 10]
    - stopword count >= 2 (of the common-English set)
    - symbol-to-token ratio <= 0.1 ('#' and '...' occurrences)
    - dup-word fraction <= 0.3 (repetition guard)

    `keep` is the conjunction. All rules are pure JVM expressions with
    exact ANSI equivalents (doc_gopher_flags oracle)."""
    txt = _c(text)
    t = tokens(txt)
    n = F.size(t)
    awl = avg_word_len(txt)
    sw = F.size(F.filter(t, lambda x: x.isin(*_STOPWORDS)))
    # occurrence counts via split (n_parts - 1), identical in ANSI SQL
    symbols = (F.size(F.split(txt, r"#")) - 1) + (
        F.size(F.split(txt, r"\.\.\.")) - 1
    )
    ok_len = (n >= 50) & (n <= 100000)
    ok_awl = (awl >= 3.0) & (awl <= 10.0)
    ok_stop = sw >= 2
    ok_sym = F.when(n > 0, symbols / n <= 0.1).otherwise(F.lit(False))
    ok_rep = dup_word_fraction(t) <= 0.3
    return F.struct(
        ok_len.alias("ok_len"),
        ok_awl.alias("ok_awl"),
        ok_stop.alias("ok_stop"),
        ok_sym.alias("ok_sym"),
        ok_rep.alias("ok_rep"),
        (ok_len & ok_awl & ok_stop & ok_sym & ok_rep).alias("keep"),
    )


_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "que", "de", "es"),
}


def _isin_filter(marks):
    # closure factory: a default-arg lambda would have 2 params and PySpark
    # would treat it as an (element, index) lambda
    return lambda x: x.isin(*marks)


def lang_scores(text) -> Column:
    t = tokens(text)
    return F.struct(
        *[
            F.size(F.filter(t, _isin_filter(marks))).alias(lang)
            for lang, marks in _LANG_MARKERS.items()
        ]
    )


def lang_id(text) -> Column:
    """Marker-word language ID (n-gram/stopword heuristic). Returns the
    best-scoring language, 'und' when nothing matches."""
    s = lang_scores(text)
    best = F.greatest(*[s[lang] for lang in _LANG_MARKERS])
    out = F.lit("und")
    # reversed: earlier languages win ties (deterministic)
    for lang in reversed(list(_LANG_MARKERS)):
        out = F.when((s[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    (lowercased, whitespace-collapsed) text. Engine-portable (same hex in
    any SQL engine) — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(_c(text))), _WS, " ")
    return F.md5(norm)


def token_estimate(text) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: one token
    per word piece of ~4 chars plus punctuation marks."""
    txt = _c(text)
    punct = F.length(txt) - F.length(F.regexp_replace(txt, r"[^\w\s]", ""))
    words = tokens(txt)
    pieces = F.aggregate(
        F.transform(words, lambda w: (F.length(w) + 3) / 4),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (pieces + punct).cast("long")


def rolling_hash_shingles_from_tokens(toks, k: int = 5) -> Column:
    """Array of hashes of k-word shingles from a MATERIALIZED token
    array column. Project `tokens(text)` in its own select first — the
    per-element lambda references the token array, and an inlined
    tokenize subtree would re-evaluate per shingle (interpreted HOF,
    no CSE: O(tokens²) per doc)."""
    tc = _c(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.size(tc) - k + 1, F.lit(1)))
    return F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(tc, i, k), " "))
    )


def rolling_hash_shingles(text, k: int = 5) -> Column:
    """Array of hashes of k-word shingles (the MinHash input).
    Single-expression convenience; hot paths should tokenize behind a
    projection barrier and call rolling_hash_shingles_from_tokens."""
    return rolling_hash_shingles_from_tokens(tokens(text), k)


def word_ngrams(toks, n: int = 2) -> Column:
    """Contiguous word n-grams as space-joined STRINGS (occurrence-
    preserving, engine-portable — unlike the xxhash64 shingle forms) from
    a MATERIALIZED token array; empty when the doc has fewer than n
    tokens. Same projection-barrier rule as the shingle helpers."""
    tc = _c(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.size(tc) - n + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tc, i, n), " "))
    return F.when(F.size(tc) >= n, grams).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def split_bucket(key, salt: str = "v1") -> Column:
    """Deterministic uniform [0, 1) bucket from md5(key || '-' || salt).
    Engine-portable (identical value in any SQL engine with md5) and
    stable across runs/cluster sizes — the corpus-split primitive. Pure
    JVM expressions: runs at scan speed over 100 TB."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("-", _c(key).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h / F.lit(4294967296.0)


def split_assign(
    key, train: float = 0.8, val: float = 0.1, salt: str = "v1"
) -> Column:
    """Deterministic train/val/test assignment by hash bucket. Fractions
    land exactly (boundaries k/2^32 can never equal a decimal fraction
    like 0.8, so there are no engine-dependent boundary ties)."""
    b = split_bucket(key, salt)
    return (
        F.when(b < F.lit(train), F.lit("train"))
        .when(b < F.lit(train + val), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def corpus_manifest(
    docs,
    split_salt: str = "v1",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Reproducible corpus manifest: one row per (split, stratum) with
    exact doc/token/char counts and an ORDER-FREE content checksum —
    the dataset-versioning primitive a training pipeline records
    before/after every curation step so "same data" is a checkable
    claim, not an assumption. The checksum is bit_xor over a 60-bit
    md5 prefix (15 hex chars, identically on the Spark side and in
    the DuckDB oracle) of id:content, so it is invariant to row order and
    partitioning, binds ids to their text (a swap of two docs' texts
    changes it), and merges across shards by xor — the mergeability
    that lets 100 TB manifests roll up from per-file manifests
    without a global sort. Splits use the standard deterministic
    salted-bucket rule (split_assign), so the manifest also audits
    split sizes.

    Plan (100 TB): pure scan-speed expressions (md5, split, size) into
    ONE partial-aggregating groupBy on a tiny (split, stratum) domain
    — no windows, no joins, nothing leaves the JVM."""
    h63 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col(id_col).cast("string"),
                    F.md5(F.col(text_col)),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            split_assign(F.col(id_col), salt=split_salt).alias("split"),
            F.col(strata_col).alias("stratum"),
            F.size(F.split(F.col(text_col), " ", -1)).alias("_ntok"),
            F.length(F.col(text_col)).alias("_nchr"),
            h63.alias("_h"),
        )
        .groupBy("split", "stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_ntok").cast("bigint").alias("n_tokens"),
            F.sum("_nchr").cast("bigint").alias("n_chars"),
            F.expr("bit_xor(_h)").cast("bigint").alias("content_hash"),
        )
        .orderBy("split", "stratum")
    )


def pack_chunks(
    docs: "DataFrame",
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 8,
) -> "DataFrame":
    """GPT-style concat-and-chunk sequence packing: documents are laid
    end-to-end (in deterministic id order within a hash shard) and the
    stream is cut into fixed `capacity`-token training chunks; each doc
    reports the chunk span it lands in.

    Returns (shard, doc_id, tok, start_off, chunk_first, chunk_last)
    where start_off is the doc's token offset in its shard stream and
    chunk_first/chunk_last = floor(start/capacity) /
    floor((end-1)/capacity) — a doc straddling a cut contributes to
    both neighboring chunks (standard pretraining packing; no padding
    waste, boundary docs split).

    Scale shape: packing is inherently a prefix scan, so it is scoped
    PER SHARD (engine-portable md5 bucket of the id, as in split_bucket)
    — each shard's running sum is one window partition, shards are
    independent and the shard count scales with the cluster. One shuffle
    on the shard key. Note the whitespace tokenizer counts '' as one
    token (split yields ['']) on both engines, so even an empty doc
    occupies one stream slot; the tok>0 guard only drops genuinely
    0-token rows (NULL text)."""
    from pyspark.sql import Window as W

    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-", F.col(id_col).cast("string"), F.lit("pack")
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % F.lit(shards)
    ).cast("int")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        token_count(F.col(text_col)).alias("tok"),
    ).filter(F.col("tok") > 0)
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = d.select(
        "shard", "doc_id", "tok", F.sum("tok").over(w).alias("_cum")
    )
    start = F.col("_cum") - F.col("tok")
    return cum.select(
        "shard",
        "doc_id",
        "tok",
        start.alias("start_off"),
        F.floor(start / F.lit(capacity)).cast("long").alias("chunk_first"),
        F.floor((F.col("_cum") - 1) / F.lit(capacity))
        .cast("long")
        .alias("chunk_last"),
    )


def dup_word_fraction(toks) -> Column:
    """Repetition quality signal (Gopher-style): fraction of tokens that
    are repeats of an earlier token. 0 = all distinct, →1 = degenerate
    repetition. Pure expression over a materialized token array."""
    tc = _c(toks)
    return F.when(
        F.size(tc) > 0,
        1.0 - F.size(F.array_distinct(tc)) / F.size(tc),
    ).otherwise(F.lit(0.0))


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{1,4}\b"
_URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def url_domains(text) -> Column:
    """Lowercased domains of every http(s) URL in the text — the
    domain-blocklist primitive of web-corpus curation. RE2-portable
    pattern; pure JVM regexp, scan-speed at 100 TB."""
    return F.transform(
        F.regexp_extract_all(_c(text), F.lit(_URL_DOMAIN_RE), F.lit(1)),
        F.lower,
    )


def domain_filter(text, blocked: tuple) -> Column:
    """STRUCT(n_urls, n_blocked, keep): URL count, how many resolve to a
    blocklisted domain, and the keep verdict (no blocked domains). The
    blocklist is a literal IN-set here; at scale swap for a broadcast
    join against a blocklist table — the corpus side never shuffles
    either way."""
    ds = url_domains(text)
    nb = F.size(F.filter(ds, lambda d: d.isin(*blocked)))
    return F.struct(
        F.size(ds).alias("n_urls"),
        nb.alias("n_blocked"),
        (nb == 0).alias("keep"),
    )


def redact_pii(text) -> Column:
    """PII scrubbing: replace emails and phone-shaped numbers with typed
    placeholders. RE2-compatible patterns (identical semantics in Spark's
    Java regex and DuckDB's RE2) so the oracle can apply the same
    transformation; extend the pattern list per deployment."""
    t = F.regexp_replace(_c(text), _EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(t, _PHONE_RE, "<PHONE>")


def token_windows(toks, w: int = 20) -> Column:
    """Non-overlapping w-token windows, each re-joined to a string —
    the unit of cross-document repeated-passage detection (the
    line/paragraph-dedup analog for corpora without layout structure;
    CCNet prunes repeated lines the same way). Trailing partial windows
    are dropped so every window hash covers exactly w tokens."""
    tc = _c(toks)
    n_win = F.floor(F.size(tc) / w).cast("int")
    return F.when(
        n_win > 0,
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.concat_ws(" ", F.slice(tc, i * w + 1, w)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def _window_hash_kernel(k: int, id_col: str):
    """mapInPandas op factory: (id, _th per-token-hash array) ->
    (id, pos, gh) stride-1 k-token window hashes. The JVM side hashes
    each token ONCE (O(1) per token); the kernel combines k token
    hashes per window as a polynomial in a fixed odd base over uint64
    (wrapping) arithmetic — k vectorized adds per document instead of
    an O(k) string array_join per POSITION, which measured ~10 us per
    window in the interpreted-HOF form (16.5 s for 1.8M windows at the
    10x sweep SF). Window identity: equal token sequences give equal
    hashes in every engine run (xxhash64 is seed-fixed); 64-bit
    collisions are negligible at corpus candidate volumes."""
    import pandas as pd

    import numpy as np

    # powers of the base mod 2^64, computed in exact Python ints (same
    # wrap semantics as uint64 multiply, without numpy's scalar-overflow
    # RuntimeWarning)
    B = 1099511628211
    pows = np.array(
        [pow(B, j, 1 << 64) for j in range(k)], dtype=np.uint64
    )

    def op(batches):
        for pdf in batches:
            ids, poss, hs = [], [], []
            for did, th in zip(pdf[id_col], pdf["_th"]):
                a = np.asarray(th, dtype=np.int64).view(np.uint64)
                m = a.size - k + 1
                if m <= 0:
                    continue
                with np.errstate(over="ignore"):
                    H = np.zeros(m, dtype=np.uint64)
                    for j in range(k):
                        H += a[j : j + m] * pows[j]
                ids.append(np.full(m, did, dtype=np.int64))
                poss.append(np.arange(m, dtype=np.int64))
                hs.append(H.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "gh": np.concatenate(hs),
                    }
                )

    return op


def duplicated_span_stats(
    docs,
    k: int = 20,
    min_occ: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact-substring duplicated-SPAN detection (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better"
    operator, re-expressed relationally): every k-token window that
    occurs >= min_occ times anywhere in the corpus marks its token
    range [pos, pos+k) as duplicated; overlapping/adjacent marked
    ranges within a document merge into maximal spans (gaps-and-
    islands), and the output is each document's duplicated-token
    accounting — exactly what a span-removal pass would cut.

    Returns (id, total_tokens, n_spans, dup_tokens, dup_frac), one row
    per input document (zero spans for clean or short docs).

    Scale shape: stride-1 rolling k-gram hashes are the relational
    equivalent of the suffix-array scan — O(total tokens) rows, but
    each only (id, pos, hash8). The groupBy on the 64-bit hash has
    map-side partial aggregation (boilerplate grams pre-combine per
    task); the join-back carries hashes, never gram text. The island
    merge is a per-document window — bounded by document length, never
    by corpus size. Matching a duplicated substring of ANY length
    >= k is guaranteed (it contains a stride-1 window); shorter
    repeats are intentionally below the resolution, as in the paper."""
    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("_t")
    ).select(id_col, "_t", F.size("_t").alias("total_tokens"))
    th = toks.filter(F.col("total_tokens") >= k).select(
        id_col,
        F.transform("_t", lambda t: F.xxhash64(t)).alias("_th"),
    )
    grams = th.mapInPandas(
        _window_hash_kernel(k, id_col),
        schema=f"{id_col} long, pos long, gh long",
    )
    counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("n_occ"))
    flagged = grams.join(
        counts.filter(F.col("n_occ") >= min_occ).select("gh"), "gh"
    ).select(id_col, "pos")
    wl = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        flagged.withColumn("_prev", F.lag("pos").over(wl))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("_new").over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    spans = isl.groupBy(id_col, "island").agg(
        (F.max("pos") + k - F.min("pos")).alias("_len")
    )
    agg = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("_len").alias("dup_tokens"),
    )
    return (
        toks.drop("_t")
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            # greatest(coalesce(total,0),1): NULL-text docs divide by 1
            # in BOTH engines (engines disagree on greatest(NULL, 1))
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(
                    F.coalesce(F.col("total_tokens"), F.lit(0)), F.lit(1)
                ),
                6,
            ).alias("dup_frac"),
        )
    )


def _two_level_rank(base, strata_col: str, key_col: str):
    """Exact within-stratum rank by (bucket, key) WITHOUT a full-stratum
    sort — the scale-safe replacement for row_number() over
    (PARTITION BY stratum ORDER BY bucket, key), whose single window
    partition pushes an entire stratum (multiple TB for a dominant
    language at 100 TB) through one task.

    Two levels: (1) a tiny histogram groupBy (stratum, _cb coarse
    bucket) → per-stratum running sum over ≤ coarse_buckets rows gives
    each coarse bucket its global rank offset (broadcast back); (2)
    row_number() partitioned by (stratum, _cb) — expected partition
    size n_s/coarse_buckets — gives the local rank. Global rank =
    offset + local rank, exact because _cb = floor(bucket·B) is
    monotone in the sort key and ties in bucket can't cross a _cb
    boundary. Input needs columns bucket and _cb."""
    wh = (
        Window.partitionBy(strata_col)
        .orderBy("_cb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        base.groupBy(strata_col, "_cb")
        .agg(F.count(F.lit(1)).alias("_cbn"))
        .select(
            strata_col,
            "_cb",
            F.coalesce(F.sum("_cbn").over(wh), F.lit(0)).alias("_off"),
        )
    )
    w = Window.partitionBy(strata_col, "_cb").orderBy(
        F.col("bucket").asc(), F.col(key_col).asc()
    )
    return (
        base.join(F.broadcast(offs), [strata_col, "_cb"])
        .withColumn("rk", (F.col("_off") + F.row_number().over(w)).cast("int"))
        .drop("_off")
    )


def stratified_sample(
    df,
    frac: float,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "v1",
    prefilter_margin: float | None = None,
    coarse_buckets: int = 4096,
):
    """Exact per-stratum quota sampling: within each stratum keep the
    ceil(frac·n) rows with the smallest salted-md5 bucket (split_bucket
    order, key tiebreak) — deterministic, engine-portable, and exactly
    proportional per stratum, unlike Bernoulli sampleBy.

    Plan: one count agg + a two-level rank (_two_level_rank — no
    full-stratum sort; raise coarse_buckets so n_s/coarse_buckets rows
    fit one task at the target scale). At 100 TB also pass
    prefilter_margin (e.g. 2.0): rows with bucket ≥ margin·frac are
    discarded at scan speed BEFORE any shuffle, so the rank stage
    touches ~margin·frac of the data instead of all of it. Correctness
    is unconditional: the same count agg that computes quotas also
    counts prefilter survivors, and any stratum whose binomial survivor
    count dipped below its quota (tiny strata) is exempted from the
    prefilter via a broadcast flag — measured on the test corpus this
    actually fires (a 71-doc stratum missed its quota at margin 2), so
    the guard is load-bearing. Survivor ranks equal full-data ranks
    because every dropped row sorts after every survivor.

    Returns the kept rows plus (bucket, rk, n_stratum)."""
    base = df.select(
        "*", split_bucket(F.col(key_col), salt).alias("bucket")
    ).withColumn(
        "_cb", F.floor(F.col("bucket") * coarse_buckets).cast("int")
    )
    if prefilter_margin is not None:
        cut = min(1.0, prefilter_margin * frac)
        counts = base.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("n_stratum"),
            F.sum(
                F.when(F.col("bucket") < cut, 1).otherwise(0)
            ).alias("_survivors"),
        )
        flags = counts.select(
            strata_col,
            "n_stratum",
            (
                F.col("_survivors")
                < F.ceil(F.lit(frac) * F.col("n_stratum"))
            ).alias("_deficient"),
        )
        base = (
            base.join(F.broadcast(flags), strata_col)
            .filter((F.col("bucket") < cut) | F.col("_deficient"))
            .drop("_deficient")
        )
    else:
        counts = base.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("n_stratum")
        )
        base = base.join(F.broadcast(counts), strata_col)
    return (
        _two_level_rank(base, strata_col, key_col)
        .filter(F.col("rk") <= F.ceil(F.lit(frac) * F.col("n_stratum")))
        .drop("_cb")
    )


def weighted_sample_aes(
    df,
    k: int,
    weight_col: str,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "aes-v1",
) -> "DataFrame":
    """Weighted sampling WITHOUT replacement, k per stratum, by the
    Efraimidis-Spirakis A-ES rule: each row draws a deterministic
    uniform u from its salted md5 and is ranked by u^(1/w) descending
    — equivalently ln(u)/w, which is what we rank on for numeric
    spread. The k winners per stratum are a true weighted sample
    without replacement (heavier rows proportionally likelier, no row
    twice), yet fully deterministic and engine-portable — the
    length-proportional / quality-proportional document picker a
    curation pipeline needs to be reproducible across reruns and
    engines. u = (h32 + 1) / 2^32 ∈ (0, 1], so ln never sees 0.

    Returns (stratum, key, weight, score_nano, rk): score_nano is the
    nano-quantized ln(u)/w selection score (auditable), rk ∈ [1, k].

    Plan (100 TB): scoring is pure JVM scan-speed expressions; top-k
    per stratum is TWO-PHASE — a local row_number inside each of 32
    hash shards (partition-bounded), then a global row_number over
    the surviving 32k rows per stratum. A single per-stratum window
    would funnel every row of a stratum through one partition (the
    same straggler kmv_distinct's two-phase k-min avoids); the
    two-phase plan is exact because the global top k are among every
    shard's local top k. Weights must be > 0: enforced at scan speed
    by a filter, matching the A-ES domain."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("-", F.col(key_col).cast("string"), F.lit(salt))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    scored = (
        df.where(w > 0)
        .select(
            F.col(strata_col).alias("stratum"),
            F.col(key_col).alias("key"),
            F.col(weight_col).cast("bigint").alias("weight"),
            (F.log(u) / w).alias("_sc"),
        )
        .withColumn("_shard", F.pmod(F.xxhash64(F.col("key")), F.lit(32)))
    )
    w_local = Window.partitionBy("stratum", "_shard").orderBy(
        F.col("_sc").desc(), F.col("key").asc()
    )
    local = scored.withColumn(
        "_lrk", F.row_number().over(w_local)
    ).where(F.col("_lrk") <= k)
    w_glob = Window.partitionBy("stratum").orderBy(
        F.col("_sc").desc(), F.col("key").asc()
    )
    return (
        local.withColumn("rk", F.row_number().over(w_glob))
        .where(F.col("rk") <= k)
        .select(
            "stratum",
            "key",
            "weight",
            F.round(F.col("_sc") * 1e9).cast("bigint").alias("score_nano"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def mixture_sample(
    df,
    fracs: dict,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "v1",
    prefilter_margin: float | None = None,
    coarse_buckets: int = 4096,
):
    """Data-mix weighting: per-stratum quota sampling with a DIFFERENT
    fraction per stratum — the mixture-reweighting step of a training
    pipeline (upweight curated sources, downweight boilerplate-heavy
    ones). Same deterministic smallest-salted-bucket rule as
    stratified_sample, so quotas land exactly (ceil(frac_s · n_s) per
    stratum) and the kept set is stable across runs/partitionings;
    strata absent from `fracs` are dropped at scan speed.

    Scale shape matches stratified_sample: two-level rank (no
    full-stratum sort), and prefilter_margin applies a PER-STRATUM
    scan-speed cut min(1, margin·frac_s) before any shuffle, with the
    same broadcast deficiency guard (a stratum whose survivor count
    missed its quota is exempted, so correctness never depends on the
    margin)."""
    frac_col = F.lit(None).cast("double")
    for k, v in sorted(fracs.items()):
        frac_col = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(
            frac_col
        )
    base = (
        df.filter(F.col(strata_col).isin(*fracs.keys()))
        .select(
            "*",
            split_bucket(F.col(key_col), salt).alias("bucket"),
            frac_col.alias("_frac"),
        )
        .withColumn(
            "_cb", F.floor(F.col("bucket") * coarse_buckets).cast("int")
        )
    )
    if prefilter_margin is not None:
        base = base.withColumn(
            "_keep",
            F.col("bucket")
            < F.least(
                F.lit(1.0), F.lit(float(prefilter_margin)) * F.col("_frac")
            ),
        )
        counts = base.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("n_stratum"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("_survivors"),
            F.min("_frac").alias("_f"),
        )
        flags = counts.select(
            strata_col,
            "n_stratum",
            (
                F.col("_survivors") < F.ceil(F.col("_f") * F.col("n_stratum"))
            ).alias("_deficient"),
        )
        base = (
            base.join(F.broadcast(flags), strata_col)
            .filter(F.col("_keep") | F.col("_deficient"))
            .drop("_deficient", "_keep")
        )
    else:
        counts = base.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("n_stratum")
        )
        base = base.join(F.broadcast(counts), strata_col)
    return (
        _two_level_rank(base, strata_col, key_col)
        .filter(F.col("rk") <= F.ceil(F.col("_frac") * F.col("n_stratum")))
        .drop("_cb")
    )


def _mg_trim(counts, cap: int):
    """One Misra-Gries decrement round over a pandas Series
    (index=item, value=counter): subtract the (cap+1)-th largest
    counter value from every counter and drop the non-positive ones —
    at most `cap` survive. Each round removes >= (cap+1)*m of total
    counted mass while undercounting any single item by <= m, so the
    cumulative undercount within a partition is <= n_p / (cap + 1)."""
    m = counts.nlargest(cap + 1).iloc[-1]
    out = counts[counts > m] - m
    return out


def heavy_ngrams_exact(
    docs,
    n: int = 2,
    threshold_frac: float = 0.001,
    capacity: int | None = None,
    text_col: str = "text",
):
    """EXACT corpus-wide heavy n-grams (every gram with >=
    ceil(threshold_frac * total_grams) occurrences, with its exact
    count) computed WITHOUT shuffling the full gram-frequency table.

    Two passes over one cached scan shape:
      1. A per-partition Misra-Gries summary (mergeable-sketch
         guarantee: any gram with global frequency > N/(cap+1) survives
         in at least one partition's summary — pigeonhole over the
         per-partition bounds) emits a bounded candidate set:
         <= capacity rows per partition, vs the full distinct-gram
         domain a groupBy would shuffle.
      2. One relational pass recounts ONLY candidates exactly: grams
         left-join the broadcast candidate set, non-candidates collapse
         into a single NULL group (map-side partial agg folds them to
         one row per task before the shuffle), so the shuffle carries
         |candidates| + 1 keys. The exact total N for the threshold
         comes from a separate cheap aggregate of per-doc token counts
         (sum of size-n+1) — a text-column-only scan with no explode
         and no Python, deliberately NOT a second reference to the
         counting subtree: plan-identical subtrees do not reliably get
         ReusedExchange through mapInPandas, and a second reference
         would run the sketch pass twice.

    With capacity >= ceil(1.2/threshold_frac) (the default) the sketch
    superset is guaranteed, and the recount makes the final set and
    counts EXACT — equal to GROUP BY ... HAVING, which is the oracle.

    The sketch pass runs over 64-bit xxhash64 gram keys, not strings —
    Arrow moves 8 bytes per occurrence instead of the gram text, and
    the per-batch merge is a vectorized Series add (measured 7.7 ->
    ~2 s at the 10x sweep SF on the string version). A hash collision
    can only merge two grams' counters, which raises counts — the
    candidate SUPERSET guarantee survives, and the recount (which
    groups by the real gram string) restores exactness."""
    import math

    cap = capacity if capacity is not None else int(math.ceil(1.2 / threshold_frac))
    toks = docs.select(tokens(text_col).alias("_t"))
    grams = toks.select(F.explode(word_ngrams("_t", n)).alias("gram"))

    def mg_op(batches):
        import pandas as pd

        counts = None
        for pdf in batches:
            vc = pdf["gh"].value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > 2 * cap:
                counts = _mg_trim(counts, cap)
        if counts is not None and len(counts) > cap:
            counts = _mg_trim(counts, cap)
        yield pd.DataFrame(
            {"gh": counts.index.astype("int64") if counts is not None else []}
        )

    cand = (
        grams.select(F.xxhash64("gram").alias("gh"))
        .mapInPandas(mg_op, schema="gh long")
        .distinct()
    )
    marked = grams.withColumn("gh", F.xxhash64("gram")).join(
        F.broadcast(cand.withColumn("_hh", F.lit(1))), "gh", "left"
    )
    counts2 = (
        marked.select(
            F.when(F.col("_hh") == 1, F.col("gram")).alias("g2")
        )
        .groupBy("g2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = toks.agg(
        F.sum(
            F.when(
                F.size("_t") >= n, F.size("_t") - (n - 1)
            ).otherwise(0)
        ).alias("N")
    )
    return (
        counts2.filter(F.col("g2").isNotNull())
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("cnt") >= F.ceil(F.lit(threshold_frac) * F.col("N"))
        )
        .select(
            F.col("g2").alias("gram"), F.col("cnt").cast("long").alias("cnt")
        )
        .orderBy(F.col("cnt").desc(), "gram")
    )


def max_ngram_count_udf(n: int = 2):
    """Highest occurrence count of any single word n-gram within ONE
    document — an Arrow-batched kernel over the materialized token
    array. Per-doc metrics must stay per-row at scale: the relational
    alternative (explode → groupBy(doc, gram) → max) shuffles the whole
    exploded corpus to compute a quantity that never leaves the row,
    and the pure-expression alternative (sorted-run fold over a
    generated n-gram array) pays interpreted-HOF cost per gram —
    measured 9.2 s / 9.4 s vs 0.6 s for this kernel on 5k docs.
    Counts tuple n-grams: identical to counting space-joined gram
    strings because whitespace tokens cannot contain spaces."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _topc(w: pd.Series) -> pd.Series:
        from collections import Counter

        out = []
        for toks_ in w:
            if toks_ is None or len(toks_) < n:
                out.append(0)
                continue
            c = Counter(zip(*(toks_[i:] for i in range(n))))
            out.append(max(c.values()))
        return pd.Series(out, dtype="int32")

    return _topc


def linear_classifier_score(
    docs: "DataFrame",
    weights: dict[str, float],
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Fasttext-style linear text-classifier inference (the quality /
    domain classifiers LLM pipelines run over every document): explode
    tokens, broadcast-join the vocabulary weight table, sum matched
    weights per doc, sigmoid.

    The model is a TABLE, not a plan literal — at 100 TB a 10^6-token
    vocabulary broadcasts in MB and the plan stays O(1) in vocab size;
    the per-doc reduce is a partial-agg groupBy on the doc key. Weights
    are summed in DECIMAL(12,4) so the logit is exact and
    order-independent (bag-of-words: repeated tokens count per
    occurrence). Returns (id, n_hits, logit, score) — `logit` is the
    exact pre-sigmoid z incl. bias; `score` = sigmoid(z).

    Coverage is TOTAL: explode_outer keeps documents whose text is
    NULL (tokens(NULL) is a NULL array, which plain explode would
    drop), so every input id appears in the output with the bias-only
    logit (n_hits = 0) — a downstream consumer can rely on
    |output| == |input|."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(t, w) for t, w in weights.items()], "token string, wt double"
    ).select("token", F.col("wt").cast("decimal(12,4)").alias("wt"))
    tok = docs.select(
        F.col(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    z = F.coalesce(F.sum("wt"), F.lit(0).cast("decimal(12,4)")) + F.lit(
        bias
    ).cast("decimal(12,4)")
    scored = (
        tok.join(F.broadcast(wdf), tok["tok"] == wdf["token"], "left")
        .groupBy(id_col)
        .agg(
            F.count("token").cast("long").alias("n_hits"),
            z.cast("double").alias("logit"),
            # the EXACT logit in deci-milli units (decimal(12,4)·10^4 is
            # integral by construction) — downstream consumers that must
            # bucket or compare logits do it on this BIGINT, never on
            # the double
            (z * F.lit(10000)).cast("long").alias("logit_dmicro"),
        )
    )
    return scored.withColumn(
        "score", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit")))
    )


def classifier_calibration(
    docs,
    weights: dict[str, float],
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_dmicro: int = 5000,
    clamp_dmicro: int = 20000,
    label_flags: tuple = ("ok_len", "ok_awl", "ok_stop", "ok_sym", "ok_rep"),
) -> "DataFrame":
    """Classifier threshold calibration: sweep the logit axis in fixed
    buckets and count, per bucket, how many documents a trusted label
    (the conjunction of the selected Gopher flags) calls good — the
    curve a pipeline reads to pick the quality-classifier cutoff (each
    prefix of the table gives the precision/recall of one threshold).
    `label_flags` selects which Gopher rules form the label: on a
    corpus where some rules are degenerate (all-true or all-false),
    calibrate against the subset that actually discriminates.

    Exactness: buckets derive from the classifier's DECIMAL-exact
    logit in deci-milli units, clamped to ±clamp_dmicro and shifted
    non-negative BEFORE the integer division — floor-vs-truncate
    division never diverges across engines on non-negative operands,
    and no float touches the grouping key. Returns (bucket, lo_dmicro,
    n_docs, n_keep) ordered by bucket; lo_dmicro is the bucket's
    inclusive lower logit bound (clamp buckets absorb the tails).

    Plan: the classifier's explode+broadcast-join scan plus one
    scan-speed flag projection, joined on the doc key, rolled up to
    |buckets| rows.
    """
    scored = linear_classifier_score(
        docs, weights, bias, id_col=id_col, text_col=text_col
    ).select(id_col, "logit_dmicro")
    gf = gopher_flags(F.col(text_col))
    keep = F.lit(True)
    for fl in label_flags:
        keep = keep & gf[fl]
    flags = docs.select(F.col(id_col), keep.alias("keep"))
    shifted = F.least(
        F.greatest(F.col("logit_dmicro"), F.lit(-clamp_dmicro)),
        F.lit(clamp_dmicro - 1),
    ) + F.lit(clamp_dmicro)
    # shifted is a small non-negative BIGINT, so floor(a/b) is exact in
    # IEEE double at every bucket boundary (multiples of bucket_dmicro
    # divide exactly); both engines agree bit-for-bit
    joined = scored.join(flags, id_col).select(
        F.floor(shifted / F.lit(bucket_dmicro)).cast("int").alias("bucket"),
        F.col("keep"),
    )
    return (
        joined.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
        )
        .select(
            "bucket",
            (F.col("bucket").cast("long") * bucket_dmicro - clamp_dmicro)
            .alias("lo_dmicro"),
            "n_docs",
            "n_keep",
        )
        .orderBy("bucket")
    )


def token_entropy(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document Shannon token entropy — the vocabulary-diversity
    quality signal (low entropy = repetitive/template text, the same
    family as the Gopher repetition rules but distribution-aware):

        H = ln(n) - (sum_t c_t * ln(c_t)) / n

    Exactness contract: each distinct count's ln(c) is quantized to a
    BIGINT micro-unit BEFORE the c-weighted sum, so sum_clnc_micro is
    exact integer arithmetic and the only float in the hashed output is
    one fixed-shape final expression. Returns (doc_id, n_tokens,
    n_distinct, sum_clnc_micro, entropy).

    Plan: one explode + one (doc, token) groupBy + one per-doc rollup —
    shuffle keys are (doc, token) then doc, both well-distributed.
    """
    from pyspark.sql import functions as F

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    cnt = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    clnc = (
        F.col("c").cast("double")
        * F.round(F.log(F.col("c").cast("double")) * F.lit(1e6))
    ).cast("long")
    per_doc = cnt.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(clnc).alias("sum_clnc_micro"),
    )
    # + 0.0 canonicalizes IEEE negative zero (engine-parity with the
    # DuckDB oracle, whose ROUND preserves -0.0); the quantized
    # sum_clnc_micro can overshoot ln(n) by < 1e-6 for single-token docs
    ent = F.round(
        F.log(F.col("n_tokens").cast("double"))
        - (F.col("sum_clnc_micro").cast("double") / F.lit(1e6))
        / F.col("n_tokens").cast("double"),
        6,
    ) + F.lit(0.0)
    return per_doc.select(
        id_col, "n_tokens", "n_distinct", "sum_clnc_micro",
        ent.alias("entropy"),
    ).orderBy(id_col)


def token_budget(
    docs,
    total_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    weight_expr=None,
):
    """Training-mixture token budgeting: given per-source availability
    and target mixture weights, compute each source's token allocation
    and the implied epoch count — the bookkeeping a data-mixing recipe
    (upweight curated sources, cap boilerplate) turns into a sampling
    plan before any row is touched.

    All outputs are exact integers: target_tokens = floor(total_budget
    * w_s / Σw) and epochs_micro = floor(1e6 * target / available)
    (epochs_micro > 1e6 means the source must be oversampled/repeated
    to hit its quota — the signal that a mixture is infeasible without
    repetition). `weight_expr` is any integer Column deriving the raw
    weight from the source key (default: 1 + 7*source_index % 10).

    Plan shape at 100 TB: ONE corpus scan aggregates token counts into
    a |sources|-row table; the weight total is a single-partition
    window over THAT tiny table (a broadcast self-join formulation
    would recompute the corpus aggregate on both branches — two scans),
    so the only corpus-scale work is the groupBy on source.
    """
    if weight_expr is None:
        idx = F.regexp_extract(F.col(source_col), r"(\d+)$", 1).cast("long")
        weight_expr = F.lit(1) + (idx * 7) % 10
    per_src = (
        docs.select(
            source_col,
            token_count(F.col(text_col)).cast("long").alias("tc"),
        )
        .groupBy(source_col)
        .agg(F.sum("tc").alias("avail_tokens"))
        .withColumn("weight_raw", weight_expr.cast("long"))
    )
    wsum = F.sum("weight_raw").over(Window.partitionBy())
    out = per_src.select(
        source_col,
        "avail_tokens",
        "weight_raw",
        F.expr(f"{int(total_budget)} * weight_raw").alias("_bw"),
        wsum.alias("_wsum"),
    ).select(
        source_col,
        "avail_tokens",
        "weight_raw",
        F.expr("_bw div _wsum").alias("target_tokens"),
    )
    return out.select(
        source_col,
        "avail_tokens",
        "weight_raw",
        "target_tokens",
        F.expr("(1000000 * target_tokens) div avail_tokens").alias(
            "epochs_micro"
        ),
    ).orderBy(source_col)


def fixed_eval_sample(
    docs,
    n_per_stratum: int = 5,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "eval-v1",
):
    """Fixed-SIZE deterministic sampling: exactly min(n, |stratum|)
    documents per stratum, chosen by smallest salted md5 bucket — the
    frozen eval/holdout set every training pipeline carves out. Unlike
    fraction-based sampling the set size never drifts as the corpus
    grows: re-running on a superset corpus keeps previously-chosen docs
    unless a new doc hashes below them (monotone eviction, never
    churn-by-reshuffle).

    One rank window per stratum (the two-level trick stratified_sample
    uses is unnecessary at n≈constant: the window's sort is bounded by
    the stratum, and only rank ≤ n rows survive). Returns (stratum,
    doc_id, bucket_micro) ordered — bucket_micro is the selection
    score, exact integer micro-units of the md5 uniform so the choice
    is auditable and engine-portable."""
    b = split_bucket(F.col(key_col), salt)
    w = Window.partitionBy("stratum").orderBy(
        F.col("_b").asc(), F.col(key_col).asc()
    )
    return (
        docs.select(
            F.col(strata_col).alias("stratum"),
            F.col(key_col),
            b.alias("_b"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_per_stratum)
        .select(
            "stratum",
            key_col,
            F.round(F.col("_b") * F.lit(1e6)).cast("long").alias(
                "bucket_micro"
            ),
        )
        .orderBy("stratum", key_col)
    )


def chunk_dedup_rewrite(
    docs,
    chunk_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Global chunk-level dedup WITH text reassembly — the rewrite pass
    of a web-corpus pipeline (C4 / RefinedWeb line-dedup, generalized to
    fixed token windows since the synthetic corpus has no line breaks):
    every non-overlapping `chunk_tokens`-token window is kept only at
    its globally FIRST occurrence (min (doc_id, idx)); later occurrences
    anywhere in the corpus are cut, and each document's surviving chunks
    are stitched back in order.

    Returns (doc_id, n_chunks, n_removed, clean_fp) where clean_fp is
    the md5 of the reassembled text ('' when every chunk was removed).

    Plan (100 TB): chunking is row-local JVM expression work (slice +
    array_join over a sequence — no shuffle, no Python); the first-
    occurrence decision is ONE groupBy on the 16-byte chunk hash
    carrying only (hash, doc_id, idx) — min(struct) gives the winner
    without a window sort; reassembly is one shuffle back on doc_id
    with ordered assembly via array_sort(collect_list(struct)). Total:
    two keyed shuffles on bounded-width rows; the raw text is scanned
    twice (once for the chunk pipeline, once for the per-doc chunk
    totals — a projection-pruned scan, cheaper than a third shuffle).
    """
    C = chunk_tokens
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_chunks = F.greatest(
        F.ceil(F.size("__toks") / F.lit(float(C))).cast("int"), F.lit(1)
    )
    base = docs.select(id_col, toks.alias("__toks")).select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.alias("idx"),
                F.array_join(
                    F.slice(F.col("__toks"), i * C + 1, C), " "
                ).alias("chunk"),
            ),
        ).alias("__chunks"),
    )
    ch = base.select(
        id_col,
        F.size("__chunks").cast("bigint").alias("n_chunks"),
        F.explode("__chunks").alias("c"),
    ).select(
        F.col(id_col).alias("doc_id"),
        F.col("n_chunks"),
        F.col("c.idx").alias("idx"),
        F.col("c.chunk").alias("chunk"),
        F.md5(F.col("c.chunk")).alias("hsh"),
    )
    # Decide winners on METADATA and move the chunk text exactly once
    # (guide §8: every shuffle but the last operates on a lightweight
    # proxy). A (doc_id, idx) position is kept iff it IS its hash's
    # winner, and positions are globally unique — so the winner set
    # (w.doc_id, w.idx), grouped into a per-doc kept-idx array, is an
    # exact membership test. The old plan shipped the chunk TEXT
    # through the hsh exchange and again through the reassembly
    # exchange; now only (hsh, doc_id, idx) rows cross the hsh
    # exchange, the winner positions cross a second narrow doc_id
    # exchange, and the text crosses ONE exchange — the doc_id join,
    # whose partitioning the reassembly groupBy then reuses. The
    # per-doc totals ride along ch as a column instead of a third
    # chunking pass over the raw text (the chunk pipeline itself is
    # still evaluated once per consumer branch rather than pinned:
    # caching corpus-sized text at 100 TB costs a disk write the
    # row-local JVM re-chunk does not).
    winners = (
        # isNotNull preserves the old inner-join-on-hsh semantics: a
        # NULL-text chunk hashes to NULL and never joined, so it never
        # won (groupBy would otherwise keep the NULL key group)
        ch.select("hsh", "doc_id", "idx")
        .where(F.col("hsh").isNotNull())
        .groupBy("hsh")
        .agg(F.min(F.struct("doc_id", "idx")).alias("w"))
        .select(F.col("w.doc_id").alias("doc_id"), F.col("w.idx").alias("idx"))
    )
    keep_sets = winners.groupBy("doc_id").agg(
        F.collect_set("idx").alias("__ki")
    )
    kept_struct = F.when(
        F.array_contains(F.col("__ki"), F.col("idx")),
        F.struct("idx", "chunk"),
    )
    return (
        ch.join(keep_sets, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_chunks").alias("n_chunks"),
            F.count(kept_struct).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean"),
        )
        .select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - F.col("n_kept"))
            .cast("bigint")
            .alias("n_removed"),
            F.md5(F.col("clean")).alias("clean_fp"),
        )
    )


def curriculum_order(
    docs,
    n_stages: int = 4,
    salt: str = "cur1",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Curriculum ordering for training: documents bucketed into
    n_stages difficulty stages by token count (stage 1 = shortest —
    the easy-first schedule), with a deterministic within-stage
    shuffle key (md5 of the doc id) so a trainer reads batches in
    (stage, order_key) order and gets difficulty-ramped, reproducibly
    shuffled data. Stages are EXACT NTILE quantiles via the
    global-sort-free two-level-rank kernel (histogram offsets +
    coarse-bucket row_number — the RFM plan); the shuffle key is pure
    scan-speed hashing, so nothing here ever global-sorts. Returns
    (doc_id, n_tokens, stage, order_key)."""
    from .events import _scalable_ntile

    per = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        )
        .cast("long")
        .alias("n_tokens"),
    )
    staged = _scalable_ntile(
        per, "n_tokens", F.col("n_tokens"), "doc_id", n_stages, "stage"
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        "stage",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(salt))
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("order_key"),
    ).orderBy("stage", "order_key", "doc_id")

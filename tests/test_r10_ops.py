"""Unit tests for the round-10 operators: A-ES weighted sampling
without replacement and the Benford first-digit audit — each checked
against an independent pure-Python recomputation (the SQL oracle is
the driver's job)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mobilityduck_spark.operators import governance as GV
from mobilityduck_spark.operators import text as TX


def _u(key, salt):
    h = int(hashlib.md5(f"{key}-{salt}".encode()).hexdigest()[:8], 16)
    return (h + 1) / 4294967296.0


def test_weighted_sample_aes_matches_python(spark):
    """Exact agreement with a pure-Python A-ES recomputation: same
    winners, same ranks, same nano-quantized scores, per stratum."""
    rows = [
        (i, "a" if i % 2 == 0 else "b", 10 + (i * 37) % 500)
        for i in range(1, 201)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = {
        (r.stratum, r.rk): (r.key, r.weight, r.score_nano)
        for r in TX.weighted_sample_aes(
            df, k=5, weight_col="w", strata_col="lang",
            key_col="doc_id", salt="t1",
        ).collect()
    }
    by_stratum = {}
    for i, lang, w in rows:
        sc = math.log(_u(i, "t1")) / w
        by_stratum.setdefault(lang, []).append((sc, i, w))
    want = {}
    for lang, entries in by_stratum.items():
        entries.sort(key=lambda t: (-t[0], t[1]))
        for rk, (sc, i, w) in enumerate(entries[:5], start=1):
            want[(lang, rk)] = (i, w, round(sc * 1e9))
    assert got == want


def test_weighted_sample_aes_without_replacement_and_weight_bias(spark):
    """No key appears twice, nonpositive weights are excluded, and
    over many strata the heavy-weight key wins far more often than
    the uniform 1/n baseline (the A-ES property, checked determin-
    istically: every 'stratum' is an independent salted draw)."""
    n_strata, n_keys = 200, 10
    rows = []
    for s in range(n_strata):
        for i in range(n_keys):
            # key encodes the stratum so each stratum redraws u
            rows.append((s * 1000 + i, f"s{s}", 1000 if i == 0 else 10))
    rows.append((999999, "s0", 0))  # zero weight: must be excluded
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = TX.weighted_sample_aes(
        df, k=1, weight_col="w", strata_col="lang",
        key_col="doc_id", salt="t2",
    ).collect()
    assert len(out) == n_strata
    assert len({r.key for r in out}) == n_strata  # without replacement
    assert all(r.key != 999999 for r in out)
    heavy_wins = sum(1 for r in out if r.key % 1000 == 0)
    # heavy key has weight share 1000/1090 ~ 92%; uniform would be 10%.
    # With 200 independent draws, > 120 wins separates the two regimes
    # by many sigma in either direction.
    assert heavy_wins > 120, heavy_wins


def test_benford_audit_matches_python(spark):
    """Planted integer-cents amounts: zero/negative excluded, a digit
    with no observations still emits its row, and every quantized
    statistic matches the pure-Python recomputation exactly."""
    amounts = (
        [123, 1999, 17500, 1] * 5      # digit 1: 20 obs
        + [250, 2700] * 3              # digit 2: 6 obs
        + [999, 90001]                 # digit 9: 2 obs
        + [0, -500]                    # excluded
    )
    df = spark.createDataFrame([(a,) for a in amounts], "cents long")
    got = {
        r.digit: (r.n_obs, r.p_obs_micro, r.p_exp_micro, r.chi2_term_micro)
        for r in GV.benford_audit(df, "cents").collect()
    }
    pos = [a for a in amounts if a > 0]
    n = len(pos)
    obs = {d: 0 for d in range(1, 10)}
    for a in pos:
        obs[int(str(a)[0])] += 1
    want = {}
    for d in range(1, 10):
        p = math.log10(1.0 + 1.0 / d)
        e = n * p
        want[d] = (
            obs[d],
            round(obs[d] / n * 1e6),
            round(p * 1e6),
            round((obs[d] - e) * (obs[d] - e) / e * 1e6),
        )
    assert got == want
    assert got[3][0] == 0  # zero-obs digit still present


def test_benford_audit_rejects_bad_digit_count(spark):
    df = spark.createDataFrame([(123,)], "cents long")
    with pytest.raises(ValueError, match="digit_count"):
        GV.benford_audit(df, "cents", digit_count=3)


def test_benford_two_digit_mode(spark):
    """digit_count=2: spine covers 10..99, single-digit cents rows are
    excluded (no two leading digits), counts match python."""
    amounts = [7, 1234, 1250, 9900, 42]
    df = spark.createDataFrame([(a,) for a in amounts], "cents long")
    out = {r.digit: r.n_obs for r in
           GV.benford_audit(df, "cents", digit_count=2).collect()}
    assert len(out) == 90
    assert out[12] == 2 and out[99] == 1 and out[42] == 1
    assert sum(out.values()) == 4  # the 1-digit amount dropped


def test_corpus_manifest_order_invariance_and_swap_detection(spark):
    """The content checksum must be invariant to row order and
    partitioning, change when two docs SWAP texts (id-content binding),
    and merge across shards by xor (mergeability)."""
    rows = [(i, "en" if i % 3 else "de", f"doc text {i} " * (i % 7 + 1))
            for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    base = {
        (r.split, r.stratum): (r.n_docs, r.n_tokens, r.n_chars,
                               r.content_hash)
        for r in TX.corpus_manifest(df).collect()
    }
    # shuffled + repartitioned input -> identical manifest
    shuf = df.orderBy(F.reverse(F.col("text"))).repartition(7)
    again = {
        (r.split, r.stratum): (r.n_docs, r.n_tokens, r.n_chars,
                               r.content_hash)
        for r in TX.corpus_manifest(shuf).collect()
    }
    assert base == again
    # swapping two same-stratum docs' texts (ids 1 and 4, both 'en')
    # keeps every count equal but MUST change that cell's checksum
    a, b = rows[0], rows[3]
    swapped = [r for r in rows if r[0] not in (a[0], b[0])]
    swapped += [(a[0], a[1], b[2]), (b[0], b[1], a[2])]
    df2 = spark.createDataFrame(
        swapped, "doc_id long, lang string, text string"
    )
    after = {
        (r.split, r.stratum): (r.n_docs, r.n_tokens, r.n_chars,
                               r.content_hash)
        for r in TX.corpus_manifest(df2).collect()
    }
    changed = {k for k in base if base[k][3] != after.get(k, (0,0,0,0))[3]}
    assert changed, "text swap must move at least one cell checksum"
    # doc counts are invariant under a text swap (ids keep their split/
    # stratum cell; token/char totals legitimately move between the two
    # cells when the swapped ids hash to different splits)
    assert all(base[k][0] == after[k][0] for k in base if k in after)
    # mergeability: manifest of two halves xors to the whole
    h1 = TX.corpus_manifest(df.where(F.col("doc_id") <= 30)).collect()
    h2 = TX.corpus_manifest(df.where(F.col("doc_id") > 30)).collect()
    merged = {}
    for part in (h1, h2):
        for r in part:
            k = (r.split, r.stratum)
            merged[k] = merged.get(k, 0) ^ r.content_hash
    assert all(merged[k] == base[k][3] for k in merged)


def test_benford_audit_no_positive_amounts_emits_zeros(spark):
    """No positive amounts = no evidence, not a missing audit: all 9
    digit rows emit with defined zero statistics, never NULLs."""
    df = spark.createDataFrame([(0,), (-5,)], "cents long")
    rows = GV.benford_audit(df, "cents").collect()
    assert len(rows) == 9
    for r in rows:
        assert r.n_obs == 0
        assert r.p_obs_micro == 0 and r.chi2_term_micro == 0
        assert r.p_exp_micro > 0  # the expected law is data-free

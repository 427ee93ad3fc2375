"""BPE training/encoding gates: no ANSI oracle can express an iterative
argmax, so the correctness anchor is an INDEPENDENT pure-python
reference implementation (dict/Counter-based, no shared code with the
Spark path) whose merge table must match EXACTLY, plus structural
encode invariants."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mobilityduck_spark.operators import bpe as B
from mobilityduck_spark.sources import tables as SRC

SF = "/root/testdata/sf0.001"


def reference_bpe(texts, n_merges):
    """Dict-based reference BPE trainer (Sennrich-style), written
    independently of the Spark implementation."""
    hist = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                hist[w] += 1
    words = {w: list(w) + ["</w>"] for w in hist}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            n = hist[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        # count desc, then lexicographic — the documented tie-break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), _ = best
        merges.append((l, r))
        for w, syms in words.items():
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    docs = SRC.load(spark, SF, "documents").limit(120)
    texts = [r["text"] for r in docs.select("text").collect()]
    return docs, texts


def test_bpe_train_matches_independent_reference(spark, corpus):
    docs, texts = corpus
    got = B.bpe_train(docs, n_merges=15)
    want = reference_bpe(texts, 15)
    assert got == want, f"first divergence: {next((a, b) for a, b in zip(got, want) if a != b)}"


def test_bpe_encode_round_trips_and_compresses(spark, corpus):
    docs, texts = corpus
    merges = B.bpe_train(docs, n_merges=15)
    rows = B.bpe_encode(docs, merges).select("text", "bpe_tokens").collect()
    assert rows
    for r in rows:
        toks = r["bpe_tokens"]
        # concatenating tokens (end markers -> spaces) reproduces the
        # lowercased whitespace-normalized text
        joined = "".join(toks).replace("</w>", " ").strip()
        assert joined == " ".join(r["text"].lower().split())
    # with merges, token count must not exceed the char-level count
    n_merged = sum(len(r["bpe_tokens"]) for r in rows)
    n_chars = sum(len(t.replace(" ", "")) + len(t.split()) for t in texts)
    assert n_merged < n_chars


def test_bpe_zero_merges_is_char_level(spark):
    df = spark.range(1).select(F.lit("ab ba").alias("text"))
    r = B.bpe_encode(df, []).collect()[0]
    assert r["bpe_tokens"] == ["a", "b", "</w>", "b", "a", "</w>"]

"""Byte-pair-encoding tokenizer training and encoding over a corpus.

Scale architecture (the standard one, cf. GPT-2's tokenizer): BPE is
trained on the WORD HISTOGRAM, not the raw token stream — one
corpus-sized explode+groupBy (map-side partial counts) reduces 100 TB
of text to a (word, count) table whose size is the VOCABULARY: bounded
by construction (≤ max_vocab most-frequent words, and natural-language
vocabularies are millions of rows at any corpus size). That histogram
is a driver-sized object — exactly like the SQ8 codebook sample and
the IVF training sample — so the inherently-sequential merge loop runs
in-process on the histogram with incremental pair-count maintenance
(only words containing the merged pair are touched per round) instead
of paying one Spark job of scheduling latency per merge (measured:
16 distributed argmax rounds = 10.4 s of pure job overhead on a
31-word histogram; driver-side = milliseconds).

Determinism: ties on pair count break lexicographically, so the merge
table is a pure function of the corpus; the histogram cap takes the
max_vocab most frequent words with a word tie-break.

Verification: no ANSI oracle exists for an iterative argmax, so the
gate is an INDEPENDENT pure-python full-recount reference
implementation (tests/test_bpe.py — a different algorithm from the
incremental trainer here) whose merge table must match exactly, plus
encode invariants (concatenation round-trip, monotone token counts).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"  # end-of-word marker, standard BPE


def word_histogram(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, count) over whitespace pre-tokens — the one corpus-sized
    shuffle of BPE training. Map-side partial aggregation makes this a
    partial_count groupBy; empty/null tokens dropped."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    w = F.explode(F.split(F.trim(t), r"\s+")).alias("word")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _word_pairs(syms: list[str]) -> Counter:
    c: Counter = Counter()
    for i in range(len(syms) - 1):
        c[(syms[i], syms[i + 1])] += 1
    return c


def bpe_train(
    docs: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    lowercase: bool = True,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merge rules from the corpus. Returns the
    ordered merge list [(left, right), ...] — rank = list position.

    One distributed histogram aggregation (the corpus-scale step; the
    TakeOrdered cap keeps the fetch bounded at max_vocab rows), then an
    in-process merge loop with INCREMENTAL pair-count maintenance: a
    pair→words inverted index means each round touches only the words
    that actually contain the merged pair. Deterministic: count-desc,
    then (left, right) lexicographic tie-break; the histogram cap
    breaks count ties on the word."""
    hist = (
        word_histogram(docs, text_col, lowercase)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_vocab)
        .collect()
    )
    words = [(list(r["word"]) + [_END], int(r["n"])) for r in hist]
    pc: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> word indices
    for wi, (syms, n) in enumerate(words):
        for p, k in _word_pairs(syms).items():
            pc[p] += k * n
            where[p].add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (left, right), _cnt = best
        merges.append((left, right))
        merged = left + right
        for wi in list(where[(left, right)]):
            syms, n = words[wi]
            old = _word_pairs(syms)
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[wi] = (res, n)
            new = _word_pairs(res)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    pc[p] += d * n
                    if pc[p] <= 0:
                        del pc[p]
                if new.get(p, 0):
                    where[p].add(wi)
                elif p in where:
                    where[p].discard(wi)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    lowercase: bool = True,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to every document — one Arrow kernel
    pass, merges broadcast in the closure (rank-greedy application, the
    standard BPE encode: repeatedly merge the lowest-rank adjacent pair
    present in the word)."""
    rank = {m: i for i, m in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        s = list(word) + [_END]
        while len(s) > 1:
            best, bi = None, -1
            for i in range(len(s) - 1):
                rk = rank.get((s[i], s[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best, bi = rk, i
            if best is None:
                break
            s[bi : bi + 2] = [s[bi] + s[bi + 1]]
        return s

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            if t is not None:
                t2 = t.lower() if lowercase else t
                for w in t2.split():
                    if w not in cache:
                        cache[w] = encode_word(w)
                    toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return docs.withColumn(out_col, _enc(F.col(text_col)))

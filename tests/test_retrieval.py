"""Unit invariants for operators/retrieval.py (oracle parity is covered
by test_queries_oracle.py; these check operator-level semantics)."""

import pyspark.sql.functions as F

from mobilityduck_spark.operators import retrieval as RT
from mobilityduck_spark.sources import tables as SRC

SF_DIR = "/root/testdata/sf0.001"


def test_bm25_rare_term_ranks_first(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    out = RT.bm25_topk(docs, [("qr", "dup"), ("qc", "the")], k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    # ranks are 1..k, contiguous, scores non-increasing within a query
    for rows in by_q.values():
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.score_micro for r in rows]
        assert scores == sorted(scores, reverse=True)
    # the rare term carries a much higher idf than the stopword
    if by_q.get("qr") and by_q.get("qc"):
        assert by_q["qr"][0].score_micro > by_q["qc"][0].score_micro
    # every hit for the 'dup' query actually contains the term
    hit_ids = [r.doc_id for r in by_q.get("qr", [])]
    if hit_ids:
        txts = {
            r.doc_id: r.text
            for r in docs.where(F.col("doc_id").isin(hit_ids)).collect()
        }
        assert all("dup" in txts[i].lower().split() for i in hit_ids)


def test_bigram_lm_scores_are_log_probs(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    out = RT.bigram_lm_scores(docs).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_bigrams >= 1
        assert r.avg_lp < 0.0  # log of a probability < 1
        # exact-integer contract: avg derives from the BIGINT sum
        assert abs(r.sum_lp_micro / 1e6 / r.n_bigrams - r.avg_lp) < 1e-6


def test_pmi_bigrams_ranked_and_positive_counts(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    rows = RT.pmi_bigrams(docs, min_count=2, k=20).collect()
    assert 0 < len(rows) <= 20
    ratios = [r.pmi_ratio for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    assert all(r.cnt >= 2 and r.pmi_ratio > 0 for r in rows)


def test_weighted_sample_deterministic_and_sized(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    a = [r.doc_id for r in RT.weighted_sample(docs, k=10).collect()]
    b = [r.doc_id for r in RT.weighted_sample(docs, k=10).collect()]
    assert a == b and len(a) == 10 == len(set(a))
    # repartitioning must not change the chosen set
    c = [
        r.doc_id
        for r in RT.weighted_sample(docs.repartition(7), k=10).collect()
    ]
    assert sorted(c) == sorted(a)


def test_textrank_matches_pure_python(spark):
    from collections import Counter, defaultdict

    docs = SRC.load(spark, SF_DIR, "documents")
    got = {
        r.term: r.rank_micro
        for r in RT.textrank_keywords(docs, iterations=2, k=10).collect()
    }
    # independent recomputation with plain dicts and int arithmetic
    cnt = Counter()
    for r in docs.select("text").collect():
        if r.text is None:
            continue
        w = r.text.strip().lower().split()
        for a, b in zip(w, w[1:]):
            if a != b:
                cnt[(a, b)] += 1
                cnt[(b, a)] += 1
    tot = defaultdict(int)
    for (a, b), c in cnt.items():
        tot[a] += c
    ranks = {a: 1_000_000 for a in tot}
    for _ in range(2):
        inc = defaultdict(int)
        for (a, b), c in cnt.items():
            inc[b] += (ranks[a] * c) // tot[a]
        ranks = {t: 150_000 + (85 * s) // 100 for t, s in inc.items()}
    top = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == dict(top)


def test_bm25_plan_broadcasts_dims_no_cartesian(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    plan = (
        RT.bm25_topk(docs, [("q1", "hash join")], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # query terms, df table, query map, and the 1-row stats dim are all
    # broadcast — the corpus side never builds a hash table
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 4


def test_token_entropy_bounds_and_python_parity(spark):
    import math
    from collections import Counter

    from mobilityduck_spark.operators import text as TX

    docs = SRC.load(spark, SF_DIR, "documents")
    out = {r.doc_id: r for r in TX.token_entropy(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        if r.text is None:
            continue
        toks = r.text.strip().lower().split()
        c = Counter(toks)
        got = out[r.doc_id]
        assert got.n_tokens == len(toks) and got.n_distinct == len(c)
        s = sum(n * round(math.log(n) * 1e6) for n in c.values())
        assert got.sum_clnc_micro == s
        # entropy in [0, ln(n_distinct)] up to quantization
        assert -1e-5 <= got.entropy <= math.log(max(2, len(c))) + 1e-5

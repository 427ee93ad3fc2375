"""Unit tests for the round-9 second-session operators: binary sign-
code retrieval, k-core peeling, 2-D skyline, ACF, and CUPED — each
checked against an independent in-Python recomputation (not the SQL
oracle, which the driver already replays)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobilityduck_spark.operators import graph as G
from mobilityduck_spark.operators import similarity as SIM
from mobilityduck_spark.operators import skyline as SK
from mobilityduck_spark.operators import events as EV
from mobilityduck_spark.sources import tables as SRC

SF = "/root/testdata/sf0.001"


def test_binary_codes_planted_copy_hamming_zero(spark):
    """An exact copy of the query vector must have Hamming distance 0
    to it and therefore always enter the shortlist and rerank to the
    top cosine slot."""
    emb = SRC.load(spark, SF, "embeddings")
    plant = emb.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(plant)
    q = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    top = SIM.binary_topk(corpus, q, k=3, shortlist=8).collect()
    first = [r for r in top if r.rank == 1][0]
    assert first.vec_id == 1_000_003
    assert first.hamming == 0
    assert first.cos == 1.0


def test_binary_topk_full_shortlist_equals_exact(spark):
    """With shortlist >= |corpus| the Hamming stage prunes nothing, so
    the rerank must reproduce the exact brute-force top-k verbatim."""
    emb = SRC.load(spark, SF, "embeddings").limit(60)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    bt = {
        (r.query_id, r.rank): r.vec_id
        for r in SIM.binary_topk(emb, q, k=5, shortlist=100).collect()
    }
    ex = {
        (r.query_id, r.rank): r.vec_id
        for r in SIM.brute_force_topk(emb, q, k=5).collect()
    }
    assert bt == ex


def test_binary_codes_match_numpy_pack(spark):
    emb = SRC.load(spark, SF, "embeddings").limit(10)
    rows = emb.select(
        "vec_id", "embedding", *SIM.binary_sign_codes(F.col("embedding"))
    ).collect()
    for r in rows:
        v = np.array(r.embedding)
        bits = (v >= 0).astype(np.int64)
        lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
        hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
        assert (r.bq_w0, r.bq_w1) == (lo, hi), r.vec_id


def _py_kcore(edges, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {
            n for n in alive if sum(1 for m in adj[n] if m in alive) < k
        }
        if not drop:
            break
        alive -= drop
    return {
        n: sum(1 for m in adj[n] if m in alive) for n in alive
    }


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 4), (2, 5)])
def test_kcore_matches_python_peel_on_random_graph(spark, seed, k):
    rng = np.random.RandomState(seed)
    n = 60
    edges = set()
    for _ in range(150):
        a, b = rng.randint(0, n, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    got = {
        (r.node, r.core_deg) for r in G.kcore(df, k=k).collect()
    }
    want = {(n_, d) for n_, d in _py_kcore(edges, k).items()}
    assert got == want
    G.release_caches()


def test_kcore_empty_core(spark):
    """A path graph has no 2-core — peeling must drain it completely
    (the all-nodes-die fixpoint, reached from the ends inward)."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a long, b long"
    )
    assert G.kcore(df, k=2).count() == 0
    G.release_caches()


def test_kcore_long_path_runs_to_fixpoint(spark):
    """A 120-node path at k=2 peels two ends per round, so it needs
    ~60 rounds to drain — past the old silent 50-round budget that
    used to report interior nodes as a phantom core. The unbounded
    default must reach the true (empty) fixpoint."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "a long, b long"
    )
    assert G.kcore(df, k=2).count() == 0
    G.release_caches()


def test_kcore_max_rounds_exhaustion_raises(spark):
    """An explicit round budget too small for the fixpoint must raise
    loudly, never return the unconverged live set as a core."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        G.kcore(df, k=2, max_rounds=2)
    G.release_caches()


def _py_skyline(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dom = any(
            (ox <= x and oy >= y and (ox < x or oy > y))
            for j, (ox, oy) in enumerate(pts)
            if j != i
        )
        if not dom:
            out.append((x, y))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 7])
def test_skyline_matches_quadratic_reference(spark, seed):
    rng = np.random.RandomState(seed)
    pts = [
        (int(x), int(y))
        for x, y in zip(rng.randint(0, 40, 300), rng.randint(0, 40, 300))
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )
    got = sorted(
        (r.x, r.y) for r in SK.skyline_min_max(df, "x", "y", "id").collect()
    )
    assert got == _py_skyline(pts)


def test_skyline_keeps_full_ties(spark):
    """Two identical points dominate each other in neither direction:
    both stay on the frontier."""
    df = spark.createDataFrame(
        [(0, 5, 5), (1, 5, 5), (2, 9, 4)], "id long, x long, y long"
    )
    got = sorted(r.id for r in SK.skyline_min_max(df, "x", "y", "id").collect())
    assert got == [0, 1]


def test_acf_matches_numpy_on_constructed_series(spark):
    """Alternating daily counts have lag-1 ACF near -1 and lag-2 near
    +1; check the exact Pearson r against numpy on the same aligned
    pairs."""
    import datetime

    rows = []
    counts = [5, 20, 6, 21, 5, 19, 7, 22, 4, 20, 6, 18]
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 3, 1 + d, 12, 0, 0),
                    1,
                    "tick",
                    1.0,
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    got = {
        (r.lag): r.acf for r in EV.acf(ev, lags=(1, 2)).collect()
    }
    x = np.array(counts, dtype=float)
    for lag in (1, 2):
        want = np.corrcoef(x[lag:], x[:-lag])[0, 1]
        assert got[lag] == pytest.approx(want, abs=2e-6), lag


def test_cuped_theta_and_adjustment_match_numpy(spark):
    """theta and the adjusted means must equal the numpy closed form
    on the same per-user (pre, post) integer sums; the adjustment must
    move both variant means TOWARD each other when the covariate
    explains the spread."""
    import datetime

    rows = []
    eid = 0
    rng = np.random.RandomState(3)
    for u in range(40):
        base = float(rng.randint(10, 60))
        for d in (2, 5, 8):  # pre period
            rows.append(
                (eid, datetime.datetime(2024, 3, d), u, "purchase",
                 base + d)
            )
            eid += 1
        for d in (20, 25):  # post period
            rows.append(
                (eid, datetime.datetime(2024, 3, d), u, "purchase",
                 2 * base + d)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {r.variant: r for r in EV.cuped_readout(ev, salt="t9").collect()}
    assert set(out) == {"A", "B"}
    # recompute in numpy from the same deterministic assignment
    import hashlib

    pre, post, var = {}, {}, {}
    for (eid_, ts, u, _t, v) in rows:
        c = int(round(v * 100))
        if ts.day < 16:
            pre[u] = pre.get(u, 0) + c
        else:
            post[u] = post.get(u, 0) + c
    for u in range(40):
        b = int(hashlib.md5(f"{u}t9".encode()).hexdigest()[:2], 16)
        var[u] = "A" if b % 2 == 0 else "B"
    c = np.array([pre.get(u, 0) for u in range(40)], dtype=float)
    x = np.array([post.get(u, 0) for u in range(40)], dtype=float)
    theta = ((len(c) * (c * x).sum() - c.sum() * x.sum())
             / (len(c) * (c * c).sum() - c.sum() ** 2))
    assert out["A"].theta == pytest.approx(theta, abs=2e-6)
    for vn in ("A", "B"):
        sel = np.array([var[u] == vn for u in range(40)])
        want_adj = x[sel].mean() - theta * (c[sel].mean() - c.mean())
        assert out[vn].mean_adj == pytest.approx(want_adj, abs=2e-6)
    # variance-reduction direction: adjusted means are closer together
    raw_gap = abs(out["A"].mean_post - out["B"].mean_post)
    adj_gap = abs(out["A"].mean_adj - out["B"].mean_adj)
    assert adj_gap <= raw_gap


def test_bloom_semi_join_exact_vs_plain_semi(spark):
    """The Bloom prefilter must be invisible in the RESULT: surviving
    rows == the plain semi-join, at any bitmap size — even a tiny,
    collision-heavy 256-bit filter (every false positive must be
    killed by the exact join)."""
    from mobilityduck_spark.operators import bloomjoin as BJ

    orders = SRC.load(spark, SF, "orders")
    cust = SRC.load(spark, SF, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    want = sorted(
        r.o_orderkey
        for r in orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "semi",
        ).collect()
    )
    for m_bits in (256, 1 << 20):
        got = sorted(
            r.o_orderkey
            for r in BJ.bloom_semi_join(
                orders, cust, "o_custkey", "c_custkey", m_bits=m_bits
            ).collect()
        )
        assert got == want, m_bits


def test_bloom_build_bitmap_matches_python(spark):
    """The (word, bits) table must equal a python recomputation of
    xxhash64(key, seed) % m — same words, same OR-ed bit patterns."""
    from mobilityduck_spark.operators import bloomjoin as BJ

    dim = spark.createDataFrame([(i,) for i in range(50)], "k long")
    m_bits = 1 << 10
    words = {
        r.word: r.bits
        for r in BJ.bloom_build(dim, "k", m_bits=m_bits).collect()
    }
    pos = dim.select(
        F.pmod(F.xxhash64(F.col("k"), F.lit(101)), F.lit(m_bits)).alias(
            "p1"
        ),
        F.pmod(F.xxhash64(F.col("k"), F.lit(202)), F.lit(m_bits)).alias(
            "p2"
        ),
    ).collect()
    want = {}
    for r in pos:
        for p in (r.p1, r.p2):
            want[p // 32] = want.get(p // 32, 0) | (1 << (p % 32))
    assert words == want


def test_retrieval_eval_metrics_by_hand(spark):
    """Metrics on a hand-built run/qrels: known first ranks, top-k
    membership, and zero-relevant queries must come out exactly."""
    from mobilityduck_spark.operators import retrieval as RT

    run = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
         ("q2", 10, 1), ("q2", 13, 2)],
        "query_id string, doc_id long, rnk int",
    )
    qrels = spark.createDataFrame(
        [("q1", 11), ("q1", 12), ("q1", 99), ("q2", 77)],
        "query_id string, doc_id long",
    )
    out = {r.query_id: r for r in RT.retrieval_eval(run, qrels, k=2).collect()}
    assert out["q1"].n_rel_total == 3
    assert out["q1"].n_rel_at_2 == 1          # only doc 11 in top-2
    assert out["q1"].first_rel_rank == 2
    assert out["q2"].n_rel_total == 1
    assert out["q2"].n_rel_at_2 == 0
    assert out["q2"].first_rel_rank is None


def test_compaction_plan_partitions_whole_inventory(spark):
    """Every file lands in exactly one contiguous group; group row
    volumes track the ceil(total/n) target (each group stops at the
    first file crossing the boundary)."""
    from mobilityduck_spark.operators import governance as GV

    files = spark.createDataFrame(
        [(d, 10 + (d * 7) % 13) for d in range(50)],
        "day long, n_rows long",
    )
    total = sum(10 + (d * 7) % 13 for d in range(50))
    out = GV.compaction_plan(files, "day", "n_rows", n_groups=5).collect()
    assert sum(r.n_files for r in out) == 50
    assert sum(r.total_rows for r in out) == total
    # contiguity: group key ranges never interleave
    spans = sorted((r.first_key, r.last_key) for r in out)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 < b0
    # sequential packing invariant: every group except possibly the
    # last crosses the target only with its final file
    target = -(-total // 5)
    cum = 0
    for r in sorted(out, key=lambda r: r.group_id):
        assert cum // target == r.group_id
        cum += r.total_rows


def test_woe_iv_matches_python(spark):
    import datetime
    import math

    rows = []
    eid = 0
    for u in range(30):
        n_ev = 5 + 3 * u  # buckets 0..4 via width 20
        n_purch = 15 if u % 3 == 0 else 2
        for i in range(n_ev):
            t = "purchase" if i < n_purch else "view"
            rows.append(
                (eid, datetime.datetime(2024, 4, 1 + i % 28), u, t, 1.0)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {r.bucket: r for r in EV.woe_iv(ev).collect()}
    # python recount
    import collections

    per = collections.defaultdict(lambda: [0, 0])
    for u in range(30):
        n_ev = 5 + 3 * u
        n_purch = min(n_ev, 15 if u % 3 == 0 else 2)
        good = 1 if n_purch >= 12 else 0
        bucket = min(n_ev // 20, 4)
        per[bucket][good] += 1
    tg = sum(v[1] for v in per.values())
    tb = sum(v[0] for v in per.values())
    for b, (nb, ng) in per.items():
        r = out[b]
        assert (r.n_good, r.n_bad) == (ng, nb), b
        if ng > 0 and nb > 0:
            woe = (
                round(math.log(ng / tg) * 1e6)
                - round(math.log(nb / tb) * 1e6)
            ) / 1e6
            assert r.woe_defined
            assert r.woe == pytest.approx(round(woe, 6), abs=1e-9)
        else:
            assert not r.woe_defined and r.woe == 0.0


def test_survival_curve_matches_lifelines_style_recount(spark):
    """KM bookkeeping on a hand-built cohort: known event/censor days,
    risk sets, and the micro-quantized log-survival terms."""
    import datetime
    import math

    rows = []
    eid = 0
    # user u enters day 1; conversion day per spec; horizon 7
    spec = {0: 0, 1: 1, 2: 1, 3: 3, 4: None, 5: 9, 6: 2, 7: None}
    for u, d in spec.items():
        rows.append((eid, datetime.datetime(2024, 5, 1), u, "view", 1.0))
        eid += 1
        if d is not None:
            rows.append(
                (eid, datetime.datetime(2024, 5, 1 + d), u, "purchase", 1.0)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {r.day: r for r in EV.survival_curve(ev, horizon_days=7).collect()}
    # events: d0:1, d1:2, d2:1, d3:1; censored at 7: users 4,5,7 -> 3
    assert (out[0].n_risk, out[0].n_event) == (8, 1)
    assert (out[1].n_risk, out[1].n_event) == (7, 2)
    assert (out[2].n_risk, out[2].n_event) == (5, 1)
    assert (out[3].n_risk, out[3].n_event) == (4, 1)
    assert (out[7].n_risk, out[7].n_censored) == (3, 3)
    want = 0
    for n, e in [(8, 1), (7, 2), (5, 1), (4, 1)]:
        want += round(math.log(1 - e / n) * 1e6)
    assert out[3].ln_s_micro == want
    assert out[7].ln_s_micro == want  # no events at day 7, only censoring
    assert all(r.s_defined for r in out.values())


def test_survival_total_degradation_flagged(spark):
    """If every user at risk converts on some day, S hits zero —
    s_defined must flip false from that day on."""
    import datetime

    rows = []
    eid = 0
    for u in range(4):
        rows.append((eid, datetime.datetime(2024, 5, 1), u, "view", 1.0))
        eid += 1
        rows.append(
            (eid, datetime.datetime(2024, 5, 2), u, "purchase", 1.0)
        )
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {r.day: r for r in EV.survival_curve(ev, horizon_days=7).collect()}
    assert not out[1].s_defined and out[1].ln_s_micro == 0


def test_kmv_estimate_matches_python_and_is_close(spark):
    """kth hash and estimate must equal the python md5 recomputation;
    at k=32 over ~150 users the estimate should land within ~60% of
    exact (sanity, not a statistical claim)."""
    import hashlib

    ev = SRC.load(spark, "/root/testdata/sf0.01", "events")
    out = {r.event_type: r for r in EV.kmv_distinct(ev, k=32).collect()}
    pairs = ev.select("event_type", "user_id").distinct().collect()
    import collections

    users = collections.defaultdict(set)
    for r in pairs:
        users[r.event_type].add(r.user_id)
    for t, us in users.items():
        hs = sorted(
            int(hashlib.md5(f"{u}kmv1".encode()).hexdigest()[:12], 16)
            for u in us
        )
        r = out[t]
        assert r.n_exact == len(us)
        if len(hs) >= 32:
            assert r.kth_hash == hs[31]
            est = round(31.0 * 281474976710656.0 / hs[31])
            assert r.est == est
            assert abs(est - len(us)) / len(us) < 0.6, (t, est, len(us))
        else:
            assert r.est == len(us)


def test_salted_join_equals_plain_join(spark):
    """Salting must be invisible in the result — inner and left, with
    duplicate fact rows (which share a salt) and unmatched keys."""
    from mobilityduck_spark.operators import skewjoin as SJ

    fact = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c"), (9, "z")],
        "k long, v string",
    )
    dim = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, w long"
    )
    for how in ("inner", "left"):
        want = sorted(
            (r.k, r.v, r.w)
            for r in fact.join(dim, "k", how).collect()
        )
        got = sorted(
            (r.k, r.v, r.w)
            for r in SJ.salted_join(fact, dim, "k", n_salts=7, how=how)
            .collect()
        )
        assert got == want, how


def test_salted_join_rejects_replication_unsafe_how(spark):
    """right/full would emit one spurious null-fact row per salt for
    each unmatched dim key — the operator must refuse, not corrupt."""
    from mobilityduck_spark.operators import skewjoin as SJ

    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, 10), (4, 40)], "k long, w long")
    for how in ("right", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="replication-safe"):
            SJ.salted_join(fact, dim, "k", n_salts=4, how=how)
    # semi/anti are fact-preserving and stay allowed
    assert SJ.salted_join(fact, dim, "k", n_salts=4, how="semi").count() == 1
    assert SJ.salted_join(fact, dim, "k", n_salts=4, how="anti").count() == 0


def test_salted_join_on_testdata_aggregate(spark):
    from mobilityduck_spark.operators import skewjoin as SJ

    orders = SRC.load(spark, SF, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = SRC.load(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    want = (
        orders.join(cust, "o_custkey")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    got = (
        SJ.salted_join(orders, cust, "o_custkey", n_salts=16)
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    assert sorted((r.c_nationkey, r["count"]) for r in got) == sorted(
        (r.c_nationkey, r["count"]) for r in want
    )


def test_multi_touch_credit_conservation_and_models(spark):
    """Hand-built journeys: linear splits evenly (per-touch rounding),
    first goes entirely to the earliest touch, a touchless conversion
    credits 'direct', and every model distributes ~1e6 credit per
    conversion."""
    import datetime

    rows = [
        # user 1: click (d1), view (d2), purchase 100.0 (d3)
        (1, datetime.datetime(2024, 6, 1), 1, "click", 1.0),
        (2, datetime.datetime(2024, 6, 2), 1, "view", 1.0),
        (3, datetime.datetime(2024, 6, 3), 1, "purchase", 100.0),
        # user 2: touchless purchase 50.0
        (4, datetime.datetime(2024, 6, 3), 2, "purchase", 50.0),
        # user 3: stale touch outside the 7d horizon, then purchase
        (5, datetime.datetime(2024, 5, 1), 3, "click", 1.0),
        (6, datetime.datetime(2024, 6, 3), 3, "purchase", 10.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {
        (r.model, r.channel): r
        for r in EV.multi_touch_attribution(ev, horizon="7 days").collect()
    }
    # linear: user1 credit split 500k/500k between click and view
    assert out[("linear", "click")].conv_credit_micro == 500_000
    assert out[("linear", "view")].conv_credit_micro == 500_000
    assert out[("linear", "click")].revenue_credit_micro == 50_000_000
    # first: all of user1 to click (the earlier touch)
    assert out[("first", "click")].conv_credit_micro == 1_000_000
    assert ("first", "view") not in out
    # users 2 and 3 are direct in both models (touchless / stale touch)
    for m in ("linear", "first"):
        assert out[(m, "direct")].conv_credit_micro == 2_000_000
        assert out[(m, "direct")].revenue_credit_micro == 60_000_000
    # conservation: each model totals 3 conversions' credit
    for m in ("linear", "first"):
        tot = sum(
            r.conv_credit_micro for (mm, _), r in out.items() if mm == m
        )
        assert tot == 3_000_000, m


def test_multi_touch_horizon_band_boundaries(spark):
    """The banded PIT join must keep pairs exactly on the half-open
    horizon [tc-hz, tc): a touch exactly horizon-old is IN, one
    microsecond older is OUT, a same-instant touch is OUT, and a
    touch landing exactly on a band boundary (tt multiple of hz)
    is matched once, never zero or twice."""
    import datetime

    base = datetime.datetime(2024, 6, 8)  # epoch-us divisible by day
    hz = datetime.timedelta(days=7)
    us = datetime.timedelta(microseconds=1)
    rows = [
        # conversion at base for user 1..4, one touch each:
        (1, base - hz, 1, "edge_in", 1.0),          # tt == tc-hz -> IN
        (2, base, 1, "purchase", 10.0),
        (3, base - hz - us, 2, "too_old", 1.0),     # just outside
        (4, base, 2, "purchase", 10.0),
        (5, base, 3, "same_instant", 1.0),          # tt == tc -> OUT
        (6, base, 3, "purchase", 10.0),
        # user 4's touch sits exactly on a band boundary inside the
        # horizon (tc - 1 day, still a multiple of hz? no — it pins
        # the replicated-band dedup: matched exactly once)
        (7, base - datetime.timedelta(days=1), 4, "recent", 1.0),
        (8, base, 4, "purchase", 10.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {
        (r.model, r.channel): r.conv_credit_micro
        for r in EV.multi_touch_attribution(ev, horizon="7 days").collect()
    }
    assert out[("linear", "edge_in")] == 1_000_000
    assert out[("linear", "recent")] == 1_000_000
    # users 2 and 3 fall to direct (stale / same-instant)
    assert out[("linear", "direct")] == 2_000_000
    assert ("linear", "too_old") not in out
    assert ("linear", "same_instant") not in out
    # conservation across the band replication: 4 conversions total
    assert sum(v for (m, _), v in out.items() if m == "linear") == 4_000_000


def test_join_cardinality_co_sampling_unbiased_shape(spark):
    """On a planted key distribution (one hot key with 40 rows, 60
    singleton keys), the co-sampled estimate must (a) equal the
    python recomputation of the same hash sample exactly and (b) use
    KEY sampling — a surviving key contributes its FULL n^2, never a
    thinned one."""
    import hashlib

    from mobilityduck_spark.operators import governance as GV

    rows = [("hot",)] * 40 + [(f"k{i}",) for i in range(60)]
    df = spark.createDataFrame(rows, "k string")
    out = GV.join_cardinality_estimate(df, df, "k", "k", mod=4).collect()[0]
    import collections

    cnt = collections.Counter(k for (k,) in rows)
    exact = sum(c * c for c in cnt.values())
    kept = {
        k
        for k in cnt
        if int(hashlib.md5(f"{k}jce1".encode()).hexdigest()[:8], 16) % 4
        == 0
    }
    sampled = sum(cnt[k] ** 2 for k in kept)
    assert out.n_exact == exact
    assert out.n_sampled == sampled
    assert out.est == sampled * 4


def test_target_encoding_no_leakage_and_math(spark):
    """(a) Encodings equal the python out-of-fold recomputation on the
    same deterministic folds; (b) LEAKAGE GUARD: perturbing one row's
    target must not move the encoding of that row's own (category,
    fold) cell — the property that separates OOF encoding from plain
    mean encoding."""
    import hashlib

    def fold(i):
        return int(hashlib.md5(f"{i}te1".encode()).hexdigest()[:4], 16) % 4

    rows = [(i, "A" if i % 3 else "B", 100 + 7 * i) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, cat string, t long")
    out = {
        (r.category, r.fold): r.enc
        for r in EV.target_encoding_oof(
            df, "cat", F.col("t"), "id", n_folds=4
        ).collect()
    }
    import collections

    s = collections.defaultdict(int)
    n = collections.defaultdict(int)
    for i, c, t in rows:
        s[(c, fold(i))] += t
        n[(c, fold(i))] += 1
    for (c, f), enc in out.items():
        sc = sum(v for (cc, _), v in s.items() if cc == c)
        nc = sum(v for (cc, _), v in n.items() if cc == c)
        so, no = sc - s.get((c, f), 0), nc - n.get((c, f), 0)
        assert enc == round(so / no, 6), (c, f)
    # leakage guard: bump row 0's target by 1e6
    rows2 = [(0, rows[0][1], rows[0][2] + 1_000_000)] + rows[1:]
    df2 = spark.createDataFrame(rows2, "id long, cat string, t long")
    out2 = {
        (r.category, r.fold): r.enc
        for r in EV.target_encoding_oof(
            df2, "cat", F.col("t"), "id", n_folds=4
        ).collect()
    }
    own = (rows[0][1], fold(0))
    assert out2[own] == out[own], "own-fold encoding moved: leakage"
    moved = [k for k in out if out2[k] != out[k]]
    assert moved, "other folds must see the perturbation"


def test_curriculum_stages_monotone_and_balanced(spark):
    """Stages must be monotone in token count (no stage-2 doc shorter
    than a stage-1 doc up to the id tiebreak) and NTILE-balanced
    (sizes differ by at most 1)."""
    from mobilityduck_spark.operators import text as TX

    docs = SRC.load(spark, SF, "documents")
    out = TX.curriculum_order(docs, n_stages=4).collect()
    import collections

    sizes = collections.Counter(r.stage for r in out)
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    max_prev = {}
    for st_ in (1, 2, 3, 4):
        toks = [r.n_tokens for r in out if r.stage == st_]
        max_prev[st_] = (min(toks), max(toks))
    for st_ in (1, 2, 3):
        assert max_prev[st_][1] <= max_prev[st_ + 1][0] or (
            max_prev[st_][1] == max_prev[st_ + 1][0]
        )


def test_daily_trend_matches_numpy_polyfit(spark):
    import datetime

    rows = []
    eid = 0
    counts = [10, 13, 17, 16, 22, 25, 24, 30]
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, datetime.datetime(2024, 7, 1 + d), 1, "grow", 1.0)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = EV.daily_trend(ev).collect()[0]
    x = np.arange(len(counts), dtype=float)
    y = np.array(counts, dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    assert out.trend_defined
    assert out.slope == pytest.approx(slope, abs=2e-6)
    assert out.intercept == pytest.approx(intercept, abs=2e-6)


def test_drift_series_baseline_days_near_zero_and_shift_detected(spark):
    """Days inside the baseline week score ~0 PSI (they ARE the
    baseline, up to smoothing); a planted day with a flipped type mix
    scores far higher than every baseline day."""
    import datetime

    rows = []
    eid = 0
    for d in range(8):
        mix = (
            [("a", 30), ("b", 10)]
            if d < 7
            else [("a", 2), ("b", 38)]  # flipped mix on day 8
        )
        for t, c in mix:
            for _ in range(c):
                rows.append(
                    (eid, datetime.datetime(2024, 8, 1 + d), 1, t, 1.0)
                )
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {r.day: r.psi for r in EV.drift_series(ev, baseline_days=7).collect()}
    base_days = [v for k, v in out.items() if k < "2024-08-08"]
    assert all(abs(v) < 0.01 for v in base_days), base_days
    assert out["2024-08-08"] > 10 * max(abs(v) for v in base_days)


@pytest.mark.parametrize("seed,k", [(0, 3), (3, 2)])
def test_kcore_local_gate_matches_distributed(spark, seed, k):
    """The size-gated driver peel and the distributed peel must return
    the IDENTICAL (node, core_deg) relation — the k-core is unique, so
    this pins the gate introduces no drift (including the within-core
    degree, which a wrong final filter would change)."""
    rng = np.random.RandomState(seed)
    edges = set()
    for _ in range(200):
        a, b = rng.randint(0, 50, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    local = {(r.node, r.core_deg) for r in G.kcore(df, k=k).collect()}
    dist = {
        (r.node, r.core_deg)
        for r in G.kcore(df, k=k, local_max_edges=0).collect()
    }
    assert local == dist
    G.release_caches()


def test_lpa_local_gate_matches_distributed(spark):
    """Size-gated driver LPA vs the Catalyst loop: identical
    (node, community) for both round counts on a weighted graph with
    ties (the (max weight, min label) pick must agree exactly)."""
    rng = np.random.RandomState(7)
    rows = set()
    for _ in range(120):
        a, b = rng.randint(0, 30, 2)
        if a != b:
            rows.add((int(a), int(b), int(rng.randint(1, 5))))
    edges = spark.createDataFrame(
        sorted(rows), "id_a long, id_b long, w long"
    )
    for rounds in (1, 2, 3):
        local = {
            (r.node, r.community)
            for r in G.label_propagation(edges, rounds=rounds).collect()
        }
        dist = {
            (r.node, r.community)
            for r in G.label_propagation(
                edges, rounds=rounds, local_max_edges=0
            ).collect()
        }
        assert local == dist, rounds
    G.release_caches()

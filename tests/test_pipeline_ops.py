"""Unit invariants for the round-7 pipeline bookkeeping operators:
token budgeting, Jaccard histogram, incremental dedup (oracle parity
is covered by test_queries_oracle.py)."""

import pyspark.sql.functions as F

from mobilityduck_spark.operators import dedup as DD
from mobilityduck_spark.operators import text as TX
from mobilityduck_spark.sources import tables as SRC

SF_DIR = "/root/testdata/sf0.001"


def test_token_budget_conservation_and_epochs(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    out = TX.token_budget(docs, total_budget=1_000_000).collect()
    assert len(out) == docs.select("source").distinct().count()
    # floor allocation never exceeds the budget, and is within one
    # weight-unit of it (sum of floors loses < |sources| tokens)
    total_target = sum(r.target_tokens for r in out)
    assert total_target <= 1_000_000
    assert 1_000_000 - total_target < sum(r.weight_raw for r in out)
    for r in out:
        # epochs_micro is exactly floor(1e6 * target / avail)
        assert r.epochs_micro == (1_000_000 * r.target_tokens) // r.avail_tokens
        assert r.avail_tokens > 0 and r.weight_raw >= 1


def test_token_budget_custom_weights(spark):
    docs = SRC.load(spark, SF_DIR, "documents")
    out = TX.token_budget(
        docs, total_budget=100, weight_expr=F.lit(1)
    ).collect()
    # uniform weights -> uniform floor allocation
    assert len({r.target_tokens for r in out}) == 1


def test_jaccard_histogram_totals_match_pairs(spark):
    """Histogram mass == candidate-pair count of the exploded Jaccard
    op at threshold 0 (same pipeline, same df-cap), and every bucket
    index is within range."""
    docs = SRC.load(spark, SF_DIR, "documents").withColumn(
        "lb", F.expr("n_chars div 100")
    )
    hist = DD.ngram_jaccard_histogram(
        docs, n=3, block_cols=("lang", "lb"), max_gram_df=64, bins=10
    ).collect()
    n_pairs = (
        DD.ngram_jaccard_pairs_exploded(
            docs, n=3, threshold=0.0, block_cols=("lang", "lb"),
            max_gram_df=64,
        ).count()
    )
    assert sum(r.n_pairs for r in hist) == n_pairs
    assert all(0 <= r.bucket <= 9 for r in hist)


def test_incremental_dedup_reasons(spark):
    """Planted ingest batch: exact copies of prior docs classify as
    dup_of_prior (even when the batch also contains them twice),
    within-batch copies keep the smallest id, unseen docs are kept."""
    rows = [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta"),
    ]
    prior = spark.createDataFrame(rows, "doc_id long, text string")
    new_rows = [
        (10, "alpha beta gamma"),   # dup_of_prior
        (11, "ALPHA   beta gamma"), # dup_of_prior (normalized fp)
        (12, "eta theta iota"),     # kept
        (13, "eta theta iota"),     # dup_in_batch (12 is kept)
        (14, "kappa lambda mu"),    # kept
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {
        r.doc_id: r.reason
        for r in DD.incremental_dedup(new, prior).collect()
    }
    assert got == {
        10: "dup_of_prior",
        11: "dup_of_prior",
        12: "kept",
        13: "dup_in_batch",
        14: "kept",
    }


def test_incremental_dedup_plan_shape(spark):
    """The prior side must reduce to DISTINCT fingerprints before the
    membership join (an |prior rows| join would re-scan the snapshot),
    and no cartesian/BNL joins appear."""
    docs = SRC.load(spark, SF_DIR, "documents").select("doc_id", "text")
    prior = docs.where(F.col("doc_id") % 10 < 8)
    new = docs.where(F.col("doc_id") % 10 >= 8)
    plan = (
        DD.incremental_dedup(new, prior)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the distinct on the prior side shows up as an aggregate on fp
    assert "HashAggregate" in plan


def test_incremental_dedup_bucketed_index_no_prior_exchange(spark, tmp_path):
    """The 100 TB claim made concrete: materialize the prior snapshot's
    fingerprint index as a table BUCKETED BY fp, and the ingest join
    reads it with NO Exchange on the prior side — the snapshot shuffle
    was paid once at write time; only the (small) new batch shuffles.
    Results must equal the recompute-everything path exactly."""
    docs = SRC.load(spark, SF_DIR, "documents").select("doc_id", "text")
    prior = docs.where(F.col("doc_id") % 10 < 8)
    new = docs.where(F.col("doc_id") % 10 >= 8).unionAll(
        prior.limit(20).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    prior_fps = prior.select(
        TX.fingerprint(F.col("text")).alias("fp")
    ).distinct()
    SRC.write_bucketed(
        prior_fps, "t_prior_fp_idx", ("fp",), 4, sort_cols=("fp",),
        path=str(tmp_path / "prior_fp_idx"),
    )
    try:
        idx = spark.table("t_prior_fp_idx")
        out = DD.incremental_dedup(
            new, idx.hint("merge"), prior_is_index=True
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # exactly the exchanges the batch side needs (join + window on
        # fp, final orderBy range exchange) — the prior-index scan feeds
        # the SortMergeJoin directly, so at most 2 hash exchanges and
        # none between the bucketed scan and the join
        assert plan.count("Exchange hashpartitioning") <= 2
        got = sorted(tuple(r) for r in out.collect())
        exp = sorted(
            tuple(r) for r in DD.incremental_dedup(new, prior).collect()
        )
        assert got == exp
        assert any(r[2] == "dup_of_prior" for r in got)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_prior_fp_idx")


def test_classifier_calibration_mass_and_bounds(spark):
    """Calibration buckets partition the corpus (mass conservation),
    n_keep never exceeds n_docs, bucket bounds reconstruct from the
    clamp/width parameters, and the keep-rate trend is informative
    (top bucket's rate exceeds the bottom bucket's)."""
    from mobilityduck_spark.queries import _CLS_BIAS, _CLS_WEIGHTS

    docs = SRC.load(spark, SF_DIR, "documents")
    out = TX.classifier_calibration(
        docs, _CLS_WEIGHTS, bias=_CLS_BIAS, label_flags=("ok_len", "ok_stop")
    ).collect()
    assert sum(r.n_docs for r in out) == docs.count()
    for r in out:
        assert 0 <= r.n_keep <= r.n_docs
        assert r.lo_dmicro == r.bucket * 5000 - 20000
        assert 0 <= r.bucket <= 7
    lo, hi = out[0], out[-1]
    assert hi.n_keep / hi.n_docs > lo.n_keep / lo.n_docs


def test_ssjoin_prefix_lossless_and_tighter(spark):
    """The prefix filter must lose NOTHING vs brute force (theorem
    check on adversarial near-threshold sets) and must generate
    strictly fewer candidates than the full token join on skewed data."""
    from pyspark.sql import functions as F

    from mobilityduck_spark.operators import dedup as DD

    rows = [
        (1, "a b c d e"),          # J(1,2)=4/6=0.667 >= 0.6
        (2, "a b c d x"),
        (3, "a b c q r s"),        # J(1,3)=3/8=0.375 < 0.6
        (4, "z y w v u"),          # J(4,5)=5/5=1.0
        (5, "u v w y z"),
        (6, "m n"),                # J(6,7)=1/3 < 0.6
        (7, "m o"),
        (8, "p q"),                # J(8,9)=2/2=1.0 (tiny sets)
        (9, "q p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jac_micro"])
        for r in DD.ssjoin_prefix(df, threshold=0.6, df_cap=100).collect()
    )
    assert got == [(1, 2, 666667), (4, 5, 1000000), (8, 9, 1000000)]

    # candidate tightness on skew: one token shared by everyone
    rows2 = [(i, "common tok%d tok%d" % (i, i + 1)) for i in range(40)]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    tok = (
        df2.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w"),
        ).distinct()
    )
    full_pairs = (
        tok.alias("a").join(tok.alias("b"), "w")
        .where(F.col("a.doc_id") < F.col("b.doc_id")).count()
    )
    # ssjoin prefix candidates: rebuild the internal candidate set
    # (threshold .6: prefix of a 3-token set is 1 token — the rarest)
    out = DD.ssjoin_prefix(df2, threshold=0.6, df_cap=100).count()
    # rare-first prefixes never index 'common' (it sorts last), so the
    # candidate join touches only the df<=2 chain tokens instead of the
    # 780 all-pairs the full token join produces; none verify at 0.6
    assert full_pairs >= 780 and out == 0

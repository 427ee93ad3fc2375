"""Replays the reference's golden sqllogictest corpus
(/root/reference/test/sql/*.test — read at runtime, never copied) through
the engine via mobilityduck_spark.goldens.

Gate: zero mismatches among supported cases, and a minimum floor of
replayed cases so translator regressions (silently skipping more) fail
loudly. Current census: 425 pass / 0 fail / 0 skip — the FULL corpus
(every `query` directive in every .test file), including
area(GEODSTBOX) via the exact ellipsoidal evaluation in geodesy.py."""

import glob
import os

import pytest

from mobilityduck_spark import goldens as G

REF_DIR = "/root/reference/test/sql"
MIN_PASS = 425


@pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference corpus not available"
)
def test_reference_golden_corpus(spark):
    stats = {"pass": 0, "fail": 0, "skip": 0}
    failures = []
    for path in sorted(glob.glob(f"{REF_DIR}/*.test")):
        fname = os.path.basename(path)
        for sql, expected in G.load_cases(path):
            status, detail = G.replay_case(spark, sql, expected)
            stats[status] += 1
            if status == "fail":
                failures.append((fname, sql[:100], detail[:200]))
    assert not failures, f"{len(failures)} golden mismatches: {failures[:10]}"
    assert stats["fail"] == 0, f"golden failures present: {stats}"
    assert stats["skip"] == 0, (
        f"translator regression: cases newly skipped: {stats}"
    )
    assert stats["pass"] >= MIN_PASS, (
        f"replayed-case count regressed: {stats} (floor {MIN_PASS})"
    )

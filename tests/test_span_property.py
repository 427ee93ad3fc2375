"""Randomized property test for the spanset normalize+merge fold
(functions/span.spanset) — the algebra every restriction and spanset
constructor sits on. 300 random float-span arrays are evaluated in ONE
DataFrame pass and compared against an independent pure-Python
reference implementing the MEOS merge rule (sort by (lower, ~lower_inc);
merge when s.lower < last.upper, or equal bounds with either side
inclusive — src/temporal/spanset.cpp:198-216)."""

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mobilityduck_spark import types as mt
from mobilityduck_spark.functions import span as S


def _ref_normalize(spans):
    """Independent reference: sort + merge (overlapping or touching)."""
    spans = [s for s in spans if s is not None and not _empty(s)]
    spans.sort(key=lambda s: (s[0], not s[2], s[1]))
    out = []
    for lo, hi, li, ui in spans:
        if out:
            plo, phi, pli, pui = out[-1]
            joins = lo < phi or (lo == phi and (li or pui))
            if joins:
                if hi > phi:
                    out[-1] = (plo, hi, pli, ui)
                elif hi == phi:
                    out[-1] = (plo, phi, pli, ui or pui)
                continue
        out.append((lo, hi, li, ui))
    return out


def _empty(s):
    lo, hi, li, ui = s
    return lo > hi or (lo == hi and not (li and ui))


def test_spanset_matches_reference_on_random_inputs(spark):
    rng = random.Random(20260813)
    cases = []
    for _ in range(300):
        n = rng.randint(0, 8)
        spans = []
        for _ in range(n):
            lo = rng.randint(0, 20) / 2.0
            hi = lo + rng.randint(0, 8) / 2.0
            spans.append((lo, hi, rng.random() < 0.7, rng.random() < 0.7))
        cases.append(spans)

    span_t = mt.span_type(T.DoubleType())
    schema = T.StructType(
        [
            T.StructField("case_id", T.IntegerType()),
            T.StructField("spans", T.ArrayType(span_t)),
        ]
    )
    rows = [
        (
            i,
            [
                {"lower": lo, "upper": hi, "lower_inc": li, "upper_inc": ui}
                for lo, hi, li, ui in spans
            ],
        )
        for i, spans in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        r["case_id"]: [
            (s["lower"], s["upper"], s["lower_inc"], s["upper_inc"])
            for s in r["ss"]
        ]
        for r in df.select(
            "case_id", S.spanset(F.col("spans")).alias("ss")
        ).collect()
    }
    mismatches = []
    for i, spans in enumerate(cases):
        exp = _ref_normalize(spans)
        if got[i] != exp:
            mismatches.append((i, spans, got[i], exp))
    assert not mismatches, mismatches[:3]


def test_textio_span_roundtrip_random():
    """format(parse(format(d))) is a fixpoint for random float spans —
    the text I/O layer the golden replay depends on."""
    import random as _r

    from mobilityduck_spark import textio

    rng = _r.Random(7)
    for _ in range(500):
        lo = rng.randint(-50, 50) / 4.0
        hi = lo + rng.randint(1, 40) / 4.0
        d = {
            "lower": lo, "upper": hi,
            "lower_inc": rng.random() < 0.5,
            "upper_inc": rng.random() < 0.5,
        }
        txt = textio.format_span(d, "float")
        d2 = textio.parse_span(txt, "float")
        assert textio.format_span(d2, "float") == txt, (d, txt, d2)

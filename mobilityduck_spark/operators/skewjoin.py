"""Salted equi-join for hot-key skew: the manual mitigation for when
one join key carries a disproportionate share of the fact rows.

A shuffle hash/sort-merge join places ALL rows of a key in one task;
a key holding 10% of a 100 TB fact table makes one straggler task do
10 TB while hundreds idle. AQE's skew-join splitting handles the
sort-merge case opportunistically (probed in scripts/skew_join_probe);
this operator is the deterministic, planner-independent form for when
the build side is small enough to replicate but too hot to broadcast
whole, or when the engine's heuristics don't fire (non-SMJ plans,
custom keys): replicate each build row n_salts times, scatter the
fact side uniformly across the salts, and join on (key, salt). Every
task gets ~1/n_salts of the hot key's rows; the result is EXACTLY the
plain join (each fact row meets its key's build row exactly once —
at its own salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join `fact` to `dim` on `key` with the dim side replicated
    across n_salts shards and the fact side scattered by a
    deterministic row hash. Result == fact.join(dim, key, how) for
    inner/left joins (each fact row pairs with each matching dim row
    exactly once). Dim columns must not collide with fact columns
    (same contract as the plain join).

    Only inner/left (and the fact-preserving semi/anti) are accepted:
    with how='right' or 'full', a dim key unmatched at a given salt
    would emit one spurious null-fact row PER SALT REPLICA (up to
    n_salts-1 duplicates per dim row), so those are rejected rather
    than silently wrong."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti"}
    if str(how).lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not replication-safe; the "
            "replicated dim side would duplicate unmatched dim rows "
            "once per salt. Use inner/left/semi/anti or a plain join."
        )
    rep = dim.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_salts) - 1)).cast(
                "array<int>"
            )
        ),
    )
    scat = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in fact.columns]),
            F.lit(int(n_salts)),
        ).cast("int"),
    )
    return scat.join(rep, [key, "_salt"], how).drop("_salt")

"""Entity resolution and privacy-risk operators over dimension tables.

blocked_matches: record-linkage candidate matching — exact blocking
attributes bound the candidate space (an equi-join, never all-pairs),
full-string edit distance and numeric-attribute closeness score the
survivors. The relational twin of the text fuzzy_pairs operator
(dedup.py), for structured entities (customers, vendors, users).

k_anonymity: the privacy audit a dataset release runs — every
quasi-identifier combination occurring fewer than k times re-identifies
its members; the operator reports each at-risk group with its size.

Scale shape (100 TB):
- blocked_matches: one equi-join on the block key with an oversized-
  block cap applied BEFORE the self-join (the blocking analog of the
  n-gram df-cap — a NULL-ish block shared by 1M entities is a 10^12
  pair bucket no partitioning saves). The Levenshtein kernel runs
  JVM-side on bounded-length names.
- k_anonymity: ONE groupBy on the quasi-identifier tuple + a count
  filter; output is bounded by the number of at-risk GROUPS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_matches", "k_anonymity"]


def blocked_matches(
    entities: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: tuple[str, ...],
    max_name_dist: int = 2,
    max_block: int = 10_000,
) -> DataFrame:
    """Candidate entity matches: pairs sharing every block column whose
    lowercased names are within `max_name_dist` edits. Returns
    (id_a, id_b, name_dist) with id_a < id_b. Blocks larger than
    `max_block` are dropped before the self-join (reported by the
    caller's DQ layer, never silently quadratic)."""
    base = entities.select(
        *block_cols,
        F.col(id_col).alias("id"),
        F.lower(F.col(name_col)).alias("nm"),
    )
    sizes = base.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("bn"))
    base = base.join(sizes, list(block_cols)).where(
        F.col("bn") <= max_block
    )
    a = base.select(
        *block_cols, F.col("id").alias("id_a"), F.col("nm").alias("na")
    )
    b = base.select(
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("id").alias("id_b"),
        F.col("nm").alias("nb"),
    )
    cond = [a[c] == b[f"{c}_b"] for c in block_cols] + [
        a["id_a"] < b["id_b"]
    ]
    return (
        a.join(b, cond)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("na", "nb").cast("int").alias("name_dist"),
        )
        .where(F.col("name_dist") <= max_name_dist)
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list, k: int = 5
) -> DataFrame:
    """k-anonymity audit: every quasi-identifier combination with fewer
    than k rows, with its size — the groups whose members a release
    would re-identify. quasi_cols entries may be column names or
    (alias, Column) pairs for generalized attributes (e.g. a banded
    numeric). Returns the quasi columns + n, smallest groups first."""
    cols, names = [], []
    for q in quasi_cols:
        if isinstance(q, str):
            cols.append(F.col(q).alias(q))
            names.append(q)
        else:
            alias, c = q
            cols.append(c.alias(alias))
            names.append(alias)
    return (
        df.select(*cols)
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < k)
        .orderBy("n", *names)
    )

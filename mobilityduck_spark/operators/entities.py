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

__all__ = ["blocked_matches", "k_anonymity",
           "sorted_neighborhood_matches", "l_diversity",
           "generalization_ladder", "t_closeness"]


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


def sorted_neighborhood_matches(
    entities: DataFrame,
    id_col: str,
    name_col: str,
    attr_cols: tuple[str, ...],
    window: int = 6,
    prefix_len: int = 14,
    max_name_dist: int = 1,
) -> DataFrame:
    """Sorted-neighborhood record linkage — the classic complement to
    exact blocking (blocked_matches): sort by the lowercased name,
    compare each record to its next `window` neighbors, keep pairs
    within `max_name_dist` edits whose `attr_cols` all agree. Returns
    (id_a, id_b, name_dist, gap) with id_a < id_b and gap the sorted
    rank distance.

    Scale shape (100 TB): NO global sort and NO ranked self-join — the
    window is partitioned by a `prefix_len`-char prefix of the sort key
    (each prefix bounds a group; a typo-class edit that preserves the
    prefix cannot cross a boundary, which is the sort-key design
    contract callers pick prefix_len for), and each record ships its
    `window` successors via lead() structs, so candidate generation is
    ONE window over one shuffle with per-record fan-out bounded by the
    window size."""
    from pyspark.sql.window import Window

    base = entities.select(
        F.col(id_col).alias("id"),
        F.lower(F.col(name_col)).alias("nm"),
        *[F.col(c).alias(c) for c in attr_cols],
    ).withColumn("pfx", F.substring("nm", 1, prefix_len))
    w = Window.partitionBy("pfx").orderBy("nm", "id")
    nbr = F.struct(
        F.col("nm").alias("nm"),
        F.col("id").alias("id"),
        *[F.col(c).alias(c) for c in attr_cols],
    )
    leads = F.array(*[
        F.struct(
            F.lead(nbr, i).over(w).alias("n"),
            F.lit(i).cast("int").alias("gap"),
        )
        for i in range(1, window + 1)
    ])
    pairs = (
        base.select("id", "nm", *attr_cols, leads.alias("ls"))
        .select("id", "nm", *attr_cols, F.explode("ls").alias("e"))
        .where(F.col("e.n").isNotNull())
    )
    cond = F.levenshtein("nm", "e.n.nm") <= max_name_dist
    for c in attr_cols:
        cond = cond & (F.col(c) == F.col(f"e.n.{c}"))
    return (
        pairs.where(cond)
        .select(
            F.least("id", "e.n.id").alias("id_a"),
            F.greatest("id", "e.n.id").alias("id_b"),
            F.levenshtein("nm", "e.n.nm").cast("int").alias("name_dist"),
            F.col("e.gap").alias("gap"),
        )
    )


def l_diversity(
    df: DataFrame, quasi_cols: list, sensitive_col: str, l: int = 3
) -> DataFrame:
    """l-diversity audit — the attribute-disclosure sibling of
    k_anonymity: a quasi-identifier group can be k-anonymous yet leak
    its members' sensitive attribute when the group holds fewer than l
    DISTINCT sensitive values. Reports every group with
    n_sensitive < l, its size and its diversity, least-diverse first.
    ONE groupBy on the quasi tuple with a count_distinct — output
    bounded by the number of at-risk groups."""
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
        df.select(*cols, F.col(sensitive_col).alias("_s"))
        .groupBy(*names)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_s").alias("n_sensitive"),
        )
        .where(F.col("n_sensitive") < l)
        .orderBy("n_sensitive", "n", *names)
    )


def generalization_ladder(
    df: DataFrame,
    quasi_cols: list,
    numeric_col: str,
    widths: list,
    k: int = 5,
) -> DataFrame:
    """Generalization-ladder audit for k-anonymity tuning: for each
    candidate band width of the numeric quasi-identifier, report how
    many groups and rows stay at risk (group size < k) — the table a
    privacy officer reads to pick the coarsest safe generalization
    instead of re-running the audit per width. ONE scan: each row
    fans out to |widths| (a constant) banded copies via explode, then
    one (width, quasi, band) aggregate and one |widths|-sized rollup.
    Returns (width, n_risky_groups, n_risky_rows), widest first."""
    wlit = F.array(*[F.lit(int(x)).cast("long") for x in widths])
    banded = df.select(
        *[F.col(c) for c in quasi_cols],
        F.col(numeric_col).alias("_v"),
        F.explode(wlit).alias("width"),
    ).select(
        "width", *quasi_cols,
        F.floor(F.col("_v") / F.col("width")).cast("long").alias("band"),
    )
    groups = banded.groupBy("width", *quasi_cols, "band").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        groups.where(F.col("n") < k)
        .groupBy("width")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_risky_groups"),
            F.sum("n").cast("bigint").alias("n_risky_rows"),
        )
        .orderBy(F.col("width").desc())
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    t_micro: int = 300_000,
) -> DataFrame:
    """t-closeness audit over a categorical sensitive attribute — the
    third rung after k_anonymity and l_diversity: a group can be large
    AND diverse yet still leak when its sensitive-value DISTRIBUTION
    deviates from the table's. For categorical attributes with the
    equal-distance ground metric, the Earth-Mover's Distance reduces
    to total variation: TV(g) = (1/2) * sum_v |p_g(v) - p(v)|. Reports
    every group with TV > t (micro-units), farthest first.

    Exactness: TV is assembled from integer counts as
    |n_gv * N - n_v * n_g| summed over v, then ONE division by
    (2 * n_g * N) — a single fixed-shape double per group, identical
    across engines. Plan: one (quasi, sensitive) aggregate; margins
    derive from it (no second scan); output bounded by groups."""
    cells = df.select(
        *quasi_cols, F.col(sensitive_col).alias("_s")
    ).groupBy(*quasi_cols, "_s").agg(F.count(F.lit(1)).alias("n_gv"))
    gsz = cells.groupBy(*quasi_cols).agg(F.sum("n_gv").alias("n_g"))
    vsz = cells.groupBy("_s").agg(F.sum("n_gv").alias("n_v"))
    tot = cells.agg(F.sum("n_gv").alias("nn"))
    # every (group, value) pair — including zero cells, which contribute
    # n_v * n_g to the numerator (a group MISSING a common value is
    # exactly as leaky as one over-representing a rare one)
    grid = gsz.crossJoin(vsz).join(
        cells, [*quasi_cols, "_s"], "left"
    ).select(
        *quasi_cols, "_s", "n_g", "n_v",
        F.coalesce(F.col("n_gv"), F.lit(0)).alias("n_gv"),
    ).crossJoin(F.broadcast(tot))
    num = F.abs(
        F.col("n_gv").cast("decimal(38,0)") * F.col("nn")
        - F.col("n_v").cast("decimal(38,0)") * F.col("n_g")
    )
    agg = grid.groupBy(*quasi_cols).agg(
        F.max("n_g").alias("n"),
        F.max("nn").alias("nn"),
        F.sum(num).alias("tvnum"),
    )
    tv = F.round(
        F.lit(1e6) * F.col("tvnum").cast("double")
        / (F.lit(2.0) * F.col("n") * F.col("nn"))
    ).cast("bigint")
    return (
        agg.select(
            *quasi_cols,
            F.col("n").cast("bigint").alias("n"),
            tv.alias("tv_micro"),
        )
        .where(F.col("tv_micro") > t_micro)
        .orderBy(F.col("tv_micro").desc(), *quasi_cols)
    )

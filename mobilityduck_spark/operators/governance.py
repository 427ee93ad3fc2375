"""Data-governance operators: data-quality audits, SCD2 history
compaction, and right-to-be-forgotten purge audits.

The reference engine stops at query execution; a production lakehouse
built on the same tables also has to PROVE properties about them —
integrity before a training run, attribute history for point-in-time
reads, and deletion-compliance evidence. These three operators cover
that layer with the same oracle discipline as the query registry
(every output column exact-integer or micro-quantized).

Scale shape (100 TB):
- dq_audit: every row-level check on a table collapses into ONE
  conditional-aggregate scan of that table (a single `agg` of
  `sum(when(pred,1))` columns — no per-check jobs, no second scan).
  Primary-key checks ride the same scan family as a count_distinct;
  foreign-key orphan checks scan the child ONCE (left join against the
  distinct parent keys + conditional agg) with the join strategy left
  to Catalyst/AQE — a dim-sized parent broadcasts on its own, a
  fact-sized parent shuffles instead of OOMing a forced broadcast.
  Output is O(#checks) rows regardless of input volume.
- scd2_compact: one shuffle partitions the change log by business key;
  change detection (lag) and interval close (lead) are two windows over
  that single partitioning. Output is bounded by the number of
  attribute CHANGES, not rows.
- purge_audit: the tombstone set is derived once and every audited
  table is scanned exactly once with a left-join marker + conditional
  agg; join strategy is left to Catalyst/AQE (small tombstone sets
  broadcast on their own; data-derived ones that exceed broadcast
  memory shuffle instead of OOMing). No table is scanned twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dq_audit", "scd2_compact", "purge_audit", "cdc_apply",
           "incremental_join_view", "encoding_advisor"]


def dq_audit(
    row_checks: list[tuple[str, DataFrame, F.Column]],
    pk_checks: list[tuple[str, DataFrame, str]] = (),
    fk_checks: list[tuple[str, DataFrame, str, DataFrame, str]] = (),
) -> DataFrame:
    """Run a data-quality audit and return one row per check:
    (check, n_bad, n_rows).

    row_checks: (name, table, bad_row_predicate) — all predicates that
      share a DataFrame object are folded into ONE conditional-agg scan.
    pk_checks: (name, table, key_col) — n_bad = rows minus distinct
      keys (0 means the column is a valid primary key).
    fk_checks: (name, child, child_key, parent, parent_key) — n_bad =
      child rows (excluding NULL keys) with no matching parent row.

    Every check emits exact BIGINT counts so the audit hashes stably.
    """
    outs: list[DataFrame] = []

    # Fold row checks per table: one scan computes all its predicates.
    by_table: dict[int, tuple[DataFrame, list[tuple[str, F.Column]]]] = {}
    for name, df, pred in row_checks:
        by_table.setdefault(id(df), (df, []))[1].append((name, pred))
    for df, preds in by_table.values():
        # coalesce(sum(when(...)), 0): sum over ZERO rows is NULL, and an
        # empty table must audit as 0 bad rows, not NULL. Check names go
        # through typed literals (array of structs + inline), never an
        # expr() f-string — a quote or backtick in a name is data, not
        # SQL.
        aggs = [
            F.coalesce(
                F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
            ).alias(f"__c{i}")
            for i, (_, pred) in enumerate(preds)
        ] + [F.count(F.lit(1)).alias("__n")]
        wide = df.agg(*aggs)
        outs.append(
            wide.select(
                F.inline(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("check"),
                                F.col(f"__c{i}").alias("n_bad"),
                            )
                            for i, (name, _) in enumerate(preds)
                        ]
                    )
                ),
                F.col("__n").alias("n_rows"),
            )
        )

    for name, df, key in pk_checks:
        outs.append(
            df.agg(
                (F.count(F.lit(1)) - F.count_distinct(F.col(key))).alias(
                    "n_bad"
                ),
                F.count(F.lit(1)).alias("n_rows"),
            ).select(F.lit(name).alias("check"), "n_bad", "n_rows")
        )

    for name, child, ckey, parent, pkey in fk_checks:
        # ONE scan of the child: left-join the distinct parent keys and
        # count matched/unmatched in the same aggregate. The join
        # strategy is left to Catalyst/AQE — a dim-sized parent
        # broadcasts on its own, a fact-sized parent (orders under
        # lineitem at 100 TB) must shuffle, which a forced broadcast
        # would OOM on.
        keys = parent.select(
            F.col(pkey).alias("__pk"), F.lit(1).alias("__hit")
        ).distinct()
        marked = child.where(F.col(ckey).isNotNull()).join(
            keys, F.col(ckey) == F.col("__pk"), "left"
        )
        outs.append(
            marked.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("__hit").isNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("n_bad"),
                F.count(F.lit(1)).alias("n_rows"),
            ).select(F.lit(name).alias("check"), "n_bad", "n_rows")
        )

    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result.select(
        "check",
        F.col("n_bad").cast("bigint").alias("n_bad"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


def scd2_compact(
    log: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Compact an append-only change log into SCD2 validity intervals:
    one row per (key, run of equal attribute values) with
    (key, attr, valid_from_us, valid_to_us, is_current).

    Rows are ordered per key by (ts, tiebreak) — fully deterministic
    even when a key has several rows at one timestamp. A row opens a
    new interval iff its attribute differs from the previous row's
    (SCD2 compaction: consecutive duplicates collapse). NULL attribute
    values are first-class: change detection is null-safe
    (row_number()==1 opens the first interval explicitly; eqNullSafe
    compares values), so non-NULL -> NULL opens a NULL-valued interval
    and consecutive NULL runs collapse — lag()-is-NULL alone cannot
    distinguish "first row" from "previous value was NULL". valid_to_us
    is the next interval's open (half-open intervals), NULL-encoded as
    -1 for the current row so the output hashes without
    NULL-vs-sentinel ambiguity across engines.
    """
    w = Window.partitionBy(key_col).orderBy("t_us", tiebreak_col)
    tagged = log.select(
        key_col,
        F.unix_micros(F.col(ts_col)).alias("t_us"),
        F.col(attr_col).alias("attr"),
        tiebreak_col,
    ).withColumn(
        "is_change",
        (F.row_number().over(w) == 1)
        | ~F.lag("attr").over(w).eqNullSafe(F.col("attr")),
    )
    changes = tagged.where(F.col("is_change")).select(
        key_col, F.col("t_us").alias("valid_from_us"), "attr", tiebreak_col
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from_us", tiebreak_col)
    return changes.select(
        F.col(key_col).alias("key"),
        "attr",
        "valid_from_us",
        F.coalesce(
            F.lead("valid_from_us").over(w2), F.lit(-1).cast("bigint")
        ).alias("valid_to_us"),
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
    )


def purge_audit(
    tombstones: DataFrame,
    tables: list[tuple[str, DataFrame, str]],
    id_col: str = "user_id",
) -> DataFrame:
    """Right-to-be-forgotten cascade audit: for each audited table,
    count the rows a purge of `tombstones` would delete vs retain, and
    how many distinct tombstoned ids actually appear there.

    tombstones: one column `id_col` of ids to be purged (deduplicated
    here). Each audited table is scanned ONCE: a left join marks
    tombstoned rows and a single conditional aggregate produces
    (table, n_purge, n_retain, n_ids_present). This is the evidence
    query a deletion pipeline runs BEFORE and AFTER the purge (after:
    all n_purge must be 0). The join strategy is left to Catalyst/AQE:
    a data-derived tombstone set (e.g. every user matching a
    predicate) can exceed broadcast/driver memory at 100 TB, so a
    forced broadcast would OOM exactly when the audit matters most —
    AQE broadcasts small sets on its own and shuffles large ones.
    """
    tomb = tombstones.select(F.col(id_col).alias("__tomb_id")).distinct()
    outs = []
    for name, df, col in tables:
        marked = df.select(F.col(col).alias("__k")).join(
            tomb,
            F.col("__k") == F.col("__tomb_id"),
            "left",
        )
        hit = F.col("__tomb_id").isNotNull()
        outs.append(
            marked.agg(
                F.sum(F.when(hit, 1).otherwise(0))
                .cast("bigint")
                .alias("n_purge"),
                F.sum(F.when(hit, 0).otherwise(1))
                .cast("bigint")
                .alias("n_retain"),
                F.count_distinct(F.when(hit, F.col("__k")))
                .cast("bigint")
                .alias("n_ids_present"),
            ).select(F.lit(name).alias("table_name"), "*")
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def scd2_pit_lookup(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    fact_ts_us: str,
) -> DataFrame:
    """Point-in-time dimension lookup: join each fact row to the SCD2
    interval (from scd2_compact: key, attr, valid_from_us,
    valid_to_us with -1 = open) that was valid AT the fact's own
    timestamp — the leakage-safe dimension read every training-set and
    as-of-reporting join needs.

    One equi-join on the business key; the interval test is a residual
    filter, so candidates per fact = that key's CHANGE count (SCD2
    dimensions are change-bounded, not row-bounded). Facts with no
    covering interval (before the key's first change) drop out, as in
    a warehouse PIT view.
    """
    d = dim.select(
        F.col("key").alias("__k"),
        "attr",
        "valid_from_us",
        "valid_to_us",
    )
    return facts.join(
        d,
        (F.col(fact_key) == F.col("__k"))
        & (F.col(fact_ts_us) >= F.col("valid_from_us"))
        & (
            (F.col("valid_to_us") == -1)
            | (F.col(fact_ts_us) < F.col("valid_to_us"))
        ),
    ).drop("__k")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fp_col: str,
    group_col: str,
) -> DataFrame:
    """Dataset-version diff: compare two snapshots by row fingerprint
    and report, per group, how many rows were added, removed, changed,
    and unchanged — the audit table a data-versioning layer prints for
    every release.

    ONE full-outer equi-join on the id carrying only (id, group,
    fingerprint) — the shuffle never carries payloads — then a single
    conditional aggregate. Returns (group, n_added, n_removed,
    n_changed, n_same)."""
    o = old.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__go"),
        F.col(fp_col).alias("__fo"),
    )
    n = new.select(
        F.col(id_col).alias("__idn"),
        F.col(group_col).alias("__gn"),
        F.col(fp_col).alias("__fn"),
    )
    j = o.join(n, o["__id"] == n["__idn"], "full_outer")
    grp = F.coalesce(F.col("__gn"), F.col("__go"))
    return (
        j.groupBy(grp.alias("grp"))
        .agg(
            F.sum(F.when(F.col("__fo").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_added"),
            F.sum(F.when(F.col("__fn").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.sum(
                F.when(
                    F.col("__fo").isNotNull()
                    & F.col("__fn").isNotNull()
                    & (F.col("__fo") != F.col("__fn")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_changed"),
            F.sum(
                F.when(F.col("__fo") == F.col("__fn"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_same"),
        )
        .select(
            F.col("grp").alias("grp"),
            "n_added",
            "n_removed",
            "n_changed",
            "n_same",
        )
    )


def reconcile_aggregates(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    measures: list[str],
) -> DataFrame:
    """Pipeline-reconciliation report: compare two aggregate tables
    (e.g. the old pipeline's output vs the new one's) on shared keys
    and report every key where any measure disagrees, with both sides
    and the exact integer delta per measure — the migration-validation
    query a cutover runs nightly.

    ONE full-outer equi-join on the keys (both inputs are already
    aggregates, so this is small-small at any corpus scale); missing
    rows surface as NULL-side mismatches. Returns keys + for each
    measure (<m>_l, <m>_r, <m>_delta), mismatched keys only."""
    l = left.select(
        *[F.col(k) for k in keys],
        *[F.col(m).alias(f"{m}_l") for m in measures],
    )
    r = right.select(
        *[F.col(k).alias(f"__{k}") for k in keys],
        *[F.col(m).alias(f"{m}_r") for m in measures],
    )
    cond = [l[k].eqNullSafe(r[f"__{k}"]) for k in keys]
    j = l.join(r, cond, "full_outer")
    any_mismatch = None
    cols = [F.coalesce(l[k], r[f"__{k}"]).alias(k) for k in keys]
    for m in measures:
        delta = F.coalesce(F.col(f"{m}_l"), F.lit(0)) - F.coalesce(
            F.col(f"{m}_r"), F.lit(0)
        )
        cols += [
            F.coalesce(F.col(f"{m}_l"), F.lit(0)).alias(f"{m}_l"),
            F.coalesce(F.col(f"{m}_r"), F.lit(0)).alias(f"{m}_r"),
            delta.alias(f"{m}_delta"),
        ]
        ne = delta != 0
        any_mismatch = ne if any_mismatch is None else (any_mismatch | ne)
    return j.select(*cols).where(any_mismatch)


def table_profile(
    df: DataFrame, cols: list[str], strategy: str = "per_column"
) -> DataFrame:
    """Column-level data profile — the stats page every catalog shows:
    per column, row count, null count, exact distinct count, and the
    min/max rendered as strings (type-agnostic output shape).

    strategy="expand": ONE scan computes every per-column aggregate in
    a single `agg` and a stack() pivots the wide row — but multiple
    exact count_distincts compile to the EXPAND plan (one replicated
    input row PER PROFILED COLUMN: a 4-column profile shuffles 4x the
    table, measured 6.6 s vs 1.5s-class on 150k orders).
    strategy="per_column" (default): one aggregate PER column, each a
    column-pruned parquet scan (reads ONLY its column) with a single
    count_distinct — no expand, and at 100 TB the pruned scans total
    roughly one full-width read. Swap count_distinct for
    approx_count_distinct when a sketch suffices.
    """
    def _one(c: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                "n_nulls"
            ),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        ).select(
            F.lit(c).alias("column_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_nulls").cast("bigint").alias("n_nulls"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            "min_value",
            "max_value",
        )

    if strategy == "per_column":
        out = _one(cols[0])
        for c in cols[1:]:
            out = out.unionByName(_one(c))
        return out

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"{c}__nulls"
            ),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__nd`, `{c}__mn`, `{c}__mx`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def benford_audit(
    df: DataFrame,
    amount_cents,
    digit_count: int = 1,
) -> DataFrame:
    """Benford's-law first-digit audit over an exact integer-cents
    amount column — the classic fraud / synthetic-data screen a
    governance pass runs over financial fact tables. Returns one row
    per leading digit d (1..9 for digit_count=1, 10..99 for 2):
    (digit, n_obs, p_obs_micro, p_exp_micro, chi2_term_micro) where
    p_exp is Benford's log10(1 + 1/d) and chi2_term is the
    (n_obs - n·p)²/(n·p) contribution, both micro-quantized so the
    audit hashes stably. Digits with zero observations still emit a
    row (their chi2 term is n·p — absence is evidence too); an input
    with NO positive amounts at all emits all-zero statistics rather
    than NULLs (no evidence ≠ missing audit).

    Determinism: the leading digit comes from the DECIMAL STRING of
    the integer cents value (substring of cast-to-string), never from
    float log10 — no boundary risk at powers of ten. Amounts ≤ 0 are
    excluded (Benford's domain), counted nowhere.

    Plan (100 TB): one conditional-aggregate scan to a ≤90-row digit
    table, then arithmetic against a broadcast 9-row digit spine —
    zero data-volume shuffles beyond the partial agg."""
    if digit_count not in (1, 2):
        raise ValueError("digit_count must be 1 or 2")
    lo = 10 ** (digit_count - 1)
    hi = 10**digit_count
    cents = (
        F.col(amount_cents) if isinstance(amount_cents, str) else amount_cents
    ).cast("bigint")
    # integer cents >= lo * 100 guarantee digit_count leading digits
    # exist in the UNITS part; smaller positives still have them in
    # the cents string (e.g. 7 cents -> "7"): take from the string of
    # the raw integer, which drops the decimal point entirely —
    # leading digits of x and of 100x agree except when the units
    # part has fewer than digit_count digits, so we take the digits
    # from the full cents integer string (Benford applies to the
    # significand, scale-free).
    digit = F.substring(cents.cast("string"), 1, digit_count).cast("int")
    obs = (
        df.where(cents > 0)
        .where(F.length(cents.cast("string")) >= digit_count)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(d,) for d in range(lo, hi)], "digit int"
    )
    joined = spine.join(F.broadcast(obs), "digit", "left").select(
        "digit", F.coalesce("n_obs", F.lit(0).cast("bigint")).alias("n_obs")
    )
    tot = joined.agg(F.sum("n_obs").alias("n_total"))
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    exp_n = F.col("n_total") * p_exp
    chi2 = (F.col("n_obs") - exp_n) ** 2 / exp_n
    # an empty (or all-nonpositive) input is "no evidence", not a
    # missing audit: emit defined zeros instead of the NULLs the /0
    # would produce, so artifact schemas can stay NOT NULL
    has_n = F.col("n_total") > 0
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("bigint").alias("digit"),
            "n_obs",
            F.when(
                has_n, F.round(F.col("n_obs") / F.col("n_total") * 1e6)
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("p_obs_micro"),
            F.round(p_exp * 1e6).cast("bigint").alias("p_exp_micro"),
            F.when(has_n, F.round(chi2 * 1e6))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("chi2_term_micro"),
        )
        .orderBy("digit")
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Partition-key skew diagnostics: the table every 100 TB job
    should read BEFORE choosing a shuffle key. Returns the top_n
    heaviest key values with exact counts and integer-ppm share, plus
    the global context on every row (n_keys, total rows, max/total
    concentration) — enough to decide between a plain hash partition,
    salting, or AQE skew handling.

    One groupBy(key) aggregate (map-side combined), one |keys|-row
    rollup for the global stats (broadcast back), and a top-n pick by
    (count desc, key asc) — deterministic total order, no full sort:
    rank via one window over the |keys|-sized count table. All outputs
    exact integers (share in ppm by integer division).
    """
    # the key is normalized to STRING before ranking so the
    # (count desc, key asc) tie-break uses one collation on any engine
    counts = df.where(F.col(key_col).isNotNull()).groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    glob = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").cast("bigint").alias("total"),
        F.max("n_rows").cast("bigint").alias("max_key_rows"),
    )
    # top-n via orderBy().limit(): plans as TakeOrderedAndProject —
    # per-partition partial top-n merged on the driver, NOT a global
    # sort (an unpartitioned row_number window would funnel every key
    # of a 100 TB table through one task). The rank is then assigned
    # by a window over the surviving <= top_n rows only.
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    top = top.withColumn("rank", F.row_number().over(w))
    return (
        top.crossJoin(F.broadcast(glob))
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.col("key").cast("string").alias("key"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            # integer ppm (div), never a truncated double quotient
            F.expr("n_rows * 1000000 div total").cast("bigint")
            .alias("share_ppm"),
            "n_keys",
            "total",
            F.expr("max_key_rows * 1000000 div total").cast("bigint")
            .alias("max_share_ppm"),
        )
        .orderBy("rank")
    )


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_cols: list,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change log (MERGE semantics: last-writer-wins by
    sequence, 'D' tombstones drop the key) onto a snapshot and return
    the resulting table state.

    The snapshot is treated as sequence-0 upserts; the union is reduced
    in ONE pass and ONE exchange with max_by(struct(payload), seq).
    The struct buffer makes Spark plan a SortAggregate (struct buffers
    are not hash-aggregable), but the partial aggregate still runs
    map-side — each mapper locally sorts by key and ships ONE candidate
    row per key, which at a 100 TB snapshot + skinny delta beats both
    alternatives: the row_number window (sorts every shuffle partition
    by (key, seq) AFTER moving all rows) and the join-back argmax
    (scans the union twice). Tombstoned keys are filtered AFTER the argmax so
    a delete followed by a higher-seq re-insert correctly resurrects
    the key. Callers must guarantee seq uniqueness per key (standard
    CDC LSN contract)."""
    payload = [c for c in snapshot.columns if c not in key_cols]
    base = snapshot.select(
        *key_cols,
        F.lit(0).cast("long").alias(seq_col),
        F.lit("U").alias(op_col),
        *payload,
    )
    log = changelog.select(
        *key_cols,
        F.col(seq_col).cast("long").alias(seq_col),
        F.col(op_col).alias(op_col),
        *payload,
    )
    merged = (
        base.unionByName(log)
        .groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(F.col(op_col).alias(op_col),
                         *[F.col(c).alias(c) for c in payload]),
                F.col(seq_col),
            ).alias("_last"),
            F.max(seq_col).alias("applied_seq"),
        )
    )
    return (
        merged.where(F.col(f"_last.{op_col}") != "D")
        .select(
            *key_cols,
            *[F.col(f"_last.{c}").alias(c) for c in payload],
            "applied_seq",
        )
    )


def incremental_join_view(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    join_key: str,
    group_cols: list,
    measure_col: str = "measure",
) -> DataFrame:
    """Incremental maintenance of a JOIN-view aggregate — the delta-join
    algebra a lakehouse uses instead of recomputing a materialized view:

        V(A∪ΔA, B∪ΔB) = V(A,B) ⊕ agg(ΔA⋈B) ⊕ agg(A⋈ΔB) ⊕ agg(ΔA⋈ΔB)

    for monoid measures (COUNT, SUM). Each term is aggregated to the
    group domain BEFORE the final merge, so the re-aggregate unions
    four domain-sized partials, never rows. At 100 TB the V(A,B) term
    is the stored snapshot partial (here recomputed inline to stand in
    for it); the mixed terms join a SKINNY delta against one big table
    — join strategy is left to Catalyst/AQE (a small delta broadcasts
    on its own; an unexpectedly large one shuffles instead of OOMing a
    forced broadcast — the purge_audit lesson); ΔA⋈ΔB is tiny. The
    registered oracle is a FULL recompute over the unions, so a green
    row proves the algebraic identity, not just plumbing."""
    def term(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.join(b, join_key)
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(measure_col).alias("msum"),
            )
        )

    partials = (
        term(a_old, b_old)
        .unionByName(term(a_delta, b_old))
        .unionByName(term(a_old, b_delta))
        .unionByName(term(a_delta, b_delta))
    )
    return partials.groupBy(*group_cols).agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("msum").cast("bigint").alias("msum"),
    )


def encoding_advisor(
    df: DataFrame, cols: list, dict_overhead_bytes: int = 4
) -> DataFrame:
    """Storage-encoding advisor for string columns — the layout-tuning
    pass a lakehouse runs before rewriting a big table: per column,
    exact cardinality and byte totals plus the two candidate sizes a
    writer chooses between — PLAIN (every value spelled out) and
    DICTIONARY (each distinct value once + a fixed-width code per row)
    — and the verdict. One conditional-aggregate scan computes every
    column's stats (no per-column jobs); distinct-value byte mass
    comes from a (col, value) aggregate whose size is bounded by the
    vocabulary, not the row count."""
    stacked = df.select(
        F.inline(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in cols
            ])
        )
    )
    per_val = stacked.groupBy("col", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    agg = per_val.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.sum(F.length("v") * F.col("cnt")).cast("bigint")
        .alias("plain_bytes"),
        F.sum(F.length("v")).cast("bigint").alias("dict_value_bytes"),
    )
    dict_bytes = (
        F.col("dict_value_bytes")
        + F.lit(dict_overhead_bytes) * F.col("n_rows")
    ).cast("bigint")
    return agg.select(
        "col", "n_rows", "ndv", "plain_bytes",
        dict_bytes.alias("dict_bytes"),
        F.when(dict_bytes < F.col("plain_bytes"), F.lit("dictionary"))
        .otherwise(F.lit("plain")).alias("verdict"),
    ).orderBy("col")


def compaction_plan(
    files: DataFrame,
    order_col: str = "day",
    rows_col: str = "n_rows",
    n_groups: int = 20,
) -> DataFrame:
    """Small-file compaction planner: sequentially bin-pack an
    ORDERED file inventory (one row per small file with its row
    count) into ~n_groups merge groups of equal row volume — a file
    opens a new group when the running total before it crosses the
    next target boundary, so groups are contiguous in the ordering
    key (ingest time) and rewriting one group never touches another's
    key range. Target size derives from the inventory itself
    (ceil(total/n_groups)), so the plan is scale-invariant. Returns
    per group: group_id, n_files, total_rows, first/last ordering key.

    Plan (100 TB): this runs on file METADATA (one row per file — a
    100k-file table, not a 100 TB one), so the single-partition
    running-sum window is bounded by the catalog size, the same
    contract as table_profile / M4. The expensive part is the rewrite
    the plan drives, not the plan."""
    total = files.agg(
        F.sum(F.col(rows_col)).cast("long").alias("_total")
    )
    w = Window.orderBy(F.col(order_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = (
        files.crossJoin(F.broadcast(total))
        .withColumn(
            "_target",
            F.ceil(F.col("_total") / F.lit(n_groups)).cast("long"),
        )
        .withColumn(
            "_before", F.coalesce(F.sum(rows_col).over(w), F.lit(0))
        )
        .withColumn(
            "_grp",
            (F.col("_before") / F.col("_target")).cast("long"),
        )
    )
    return (
        staged.groupBy(F.col("_grp").alias("group_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(rows_col).cast("bigint").alias("total_rows"),
            F.min(order_col).alias("first_key"),
            F.max(order_col).alias("last_key"),
        )
        .orderBy("group_id")
    )


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    mod: int = 16,
    salt: str = "jce1",
) -> DataFrame:
    """Sampling-based join-cardinality estimate next to the exact
    answer: keep only rows whose KEY hashes into the 1/mod sample
    (md5 prefix % mod == 0 — co-sampling BOTH sides on the key, so a
    surviving key keeps ALL its rows on both sides and the sampled
    join count is an unbiased 1/mod fraction of the true key-join
    count), then scale by mod. Uniform row sampling would square the
    selectivity per key and bias multi-row keys down — the classic
    estimator mistake this operator exists to avoid. Returns ONE row:
    (n_exact, n_sampled, est = n_sampled * mod).

    The output carries the exact count so the estimator's error is
    oracle-checked data, same contract as events_kmv_distinct. At
    100 TB the exact side is the full shuffle you're trying to avoid;
    production runs only the sampled branch (a 1/mod-volume join) and
    this operator is the calibration harness that justifies trusting
    it."""
    def keep(col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(col.cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            % mod
            == 0
        )

    l_s = left.where(keep(F.col(left_key)))
    r_s = right.where(keep(F.col(right_key)))
    n_sampled = l_s.join(
        r_s.select(F.col(right_key).alias(left_key)), left_key
    ).count()
    n_exact = left.join(
        right.select(F.col(right_key).alias(left_key)), left_key
    ).count()
    spark = left.sparkSession
    return spark.createDataFrame(
        [(int(n_exact), int(n_sampled), int(n_sampled) * int(mod))],
        "n_exact long, n_sampled long, est long",
    )

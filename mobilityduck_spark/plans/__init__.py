"""Physical-plan introspection helpers.

Used by tests/test_plans.py to pin the plans we want (broadcast joins for
probe tables, pushed-down parquet filters, bounded shuffle counts) so a
regression that silently degrades the plan — e.g. a broadcast falling
back to sort-merge or a filter failing to reach the scan — fails CI, not
just the benchmark. This is the engine's substitute for the reference's
EXPLAIN ANALYZE corpus (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_counts(df: DataFrame) -> dict[str, int]:
    import re

    plan = formatted_plan(df)
    # formatted output shows each node twice (tree + "(n) Name" details);
    # count the uniquely-numbered detail headers
    headers = re.findall(r"^\(\d+\) (\w[\w ]*)", plan, re.M)
    joined = "\n".join(headers)
    return {
        "broadcast_joins": joined.count("BroadcastHashJoin")
        + joined.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": joined.count("SortMergeJoin"),
        "shuffles": joined.count("Exchange"),
        "scans": joined.count("Scan parquet"),
        "cartesian": joined.count("CartesianProduct"),
        # BNLJ is ALSO counted in broadcast_joins (historical); use this
        # key to assert a join really is hash/equi, not nested-loop
        "bnl_joins": joined.count("BroadcastNestedLoopJoin"),
    }


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan advertises `fragment` inside PushedFilters."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column sets actually read from parquet (one entry per scan)."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out

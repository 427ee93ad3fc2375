"""Sweep every registry oracle for driver-hash dtype hazards.

The round driver hashes pandas values from both engines; DuckDB type
widening silently flips the hash on value-identical output:
  - SUM(INT)/SUM(BIGINT) returns HUGEINT -> pandas object dtype
  - integer columns containing NULL fetch as float64
Spark emits int64 either way, so these mismatch at hash time even when
every value is equal (this class cost a green row in rounds 2, 3 AND 4:
media_stats, doc_pii_redaction, tpch_q12).

This script runs each oracle in DuckDB at sf0.001 (cheap) and each Spark
query's *schema only* (lazy, no job), then cross-checks:
  - any pandas `object` dtype on a non-string column  -> FAIL (HUGEINT)
  - spark integer column fetched as float64           -> FAIL (NULL-widen
    or dtype drift)
  - spark double column fetched as int                -> FAIL
Usage: python scripts/dtype_sweep.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from mobilityduck_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

INTISH = {"long", "int", "short", "byte"}


def classify(spark_type: str, pandas_dtype: str) -> str | None:
    """Return a failure reason, or None if the pairing is hash-safe."""
    st, pd_ = spark_type, pandas_dtype
    if st.startswith(("array", "struct", "map", "binary")):
        return None  # complex cols compare element-wise; no widening class
    if pd_ == "object":
        if st == "string":
            return None
        return f"non-string spark type {st} fetched as pandas object (HUGEINT/decimal?)"
    if st in INTISH and pd_.startswith("float"):
        return f"spark {st} fetched as {pd_} (NULL-widen or SUM type drift)"
    if st == "double" and (pd_.startswith("int") or pd_ == "object"):
        return f"spark double fetched as {pd_}"
    if st == "boolean" and not pd_.startswith(("bool", "object")):
        return f"spark boolean fetched as {pd_}"
    return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    bad = []
    for name in sorted(oracles):
        qdf = queries[name](spark, sf_dir)
        spark_types = {f.name: f.dataType.simpleString() for f in qdf.schema.fields}
        ora = con.execute(oracles[name]).fetch_df()
        for col in ora.columns:
            st = spark_types.get(col)
            if st is None:
                bad.append((name, col, "oracle column missing from spark schema"))
                continue
            reason = classify(st, str(ora[col].dtype))
            if reason:
                bad.append((name, col, reason))
        missing = set(spark_types) - set(ora.columns)
        if missing:
            bad.append((name, ",".join(sorted(missing)), "spark cols missing from oracle"))

    if bad:
        for name, col, reason in bad:
            print(f"FAIL {name}.{col}: {reason}")
        sys.exit(1)
    print(f"all {len(oracles)} oracles dtype-clean")


if __name__ == "__main__":
    main()

"""Driver-style correctness re-check for selected queries at a chosen SF.

Mimics the round driver: runs the registered Spark query and its DuckDB
oracle on the same parquet dir, compares row count, column names, duckdb
result dtypes, and order-insensitive values.

Usage: python scripts/driver_check.py [sf_dir] name [name ...]
"""

import math
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


def norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                assert not math.isnan(v)
                v = round(v, 6)
                if v == int(v):
                    v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0].startswith("/"):
        sf_dir, args = args[0], args[1:]
    names = args or sorted(entry_mod.oracle_sql().keys())

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    failed = []
    for name in names:
        qdf = queries[name](spark, sf_dir)
        cols = sorted(qdf.columns)
        spark_rows = [tuple(row[c] for c in cols) for row in qdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only ({len(spark_rows)} rows)")
            continue
        ora = con.execute(oracles[name]).fetch_df()
        ocols = sorted(ora.columns.tolist())
        dtypes = {c: str(ora[c].dtype) for c in ocols}
        duck_rows = [tuple(r) for r in ora[cols].itertuples(index=False)]
        ok = cols == ocols and len(spark_rows) == len(duck_rows)
        if ok:
            sn, dn = norm(spark_rows), norm(duck_rows)
            mism = [(a, b) for a, b in zip(sn, dn) if a != b]
            ok = not mism
        if ok:
            print(f"{name}: PASS rows={len(spark_rows)} dtypes={dtypes}")
        else:
            failed.append(name)
            print(
                f"{name}: FAIL spark_rows={len(spark_rows)} "
                f"oracle_rows={len(duck_rows)} cols {cols} vs {ocols}"
            )
            if cols == ocols and len(spark_rows) == len(duck_rows):
                print("  first mismatches:", mism[:5])
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all pass")


if __name__ == "__main__":
    main()

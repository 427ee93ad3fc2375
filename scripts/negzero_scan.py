"""Registry-wide IEEE negative-zero audit.

The round driver hashes text-rendered values from both engines; Python
renders -0.0 and 0.0 differently even though they compare equal, so any
query whose Spark side and DuckDB oracle disagree on a zero's sign
hash-mismatches while being value-exact (the round-8 embed_covariance
red row). This scan runs EVERY registered query on BOTH engines at the
chosen SF and reports each -0.0 occurrence so the class can be proved
closed, not just argued closed.

Usage: python scripts/negzero_scan.py [sf_dir]
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


def count_negzero(rows) -> int:
    n = 0
    for r in rows:
        for v in r:
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float) and str(v) == "-0.0":
                n += 1
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    dirty = []
    for name, fn in queries.items():
        try:
            s = count_negzero(tuple(r) for r in fn(spark, sf_dir).collect())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            dirty.append(name)
            continue
        o = 0
        if name in oracles:
            o = count_negzero(con.execute(oracles[name]).fetchall())
        flag = "" if s == 0 and o == 0 else "  <-- NEGATIVE ZERO"
        if flag:
            dirty.append(name)
        print(f"{name}: spark_-0.0={s} oracle_-0.0={o}{flag}")
    print(f"\n{'CLEAN' if not dirty else 'DIRTY: ' + ', '.join(dirty)}")


if __name__ == "__main__":
    main()

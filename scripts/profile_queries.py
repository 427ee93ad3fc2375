"""Time individual registry queries (default sf0.1) with per-query wall.

Usage: python scripts/profile_queries.py [sf_dir] name [name ...] [--explain]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from mobilityduck_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--explain"]
    explain = "--explain" in sys.argv
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0].startswith("/"):
        sf_dir, args = args[0], args[1:]
    spark = get_spark()
    qs = entry_mod.queries()
    for name in args:
        if explain:  # outside the timed region
            qs[name](spark, sf_dir).explain("formatted")
        # timer covers the BUILD too: queries with eager construction
        # work (sample collects, k-means fits, CC checkpoint rounds)
        # would otherwise escape the measurement
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        print(f"{name}: {time.perf_counter() - t0:.3f}s rows={n}")


if __name__ == "__main__":
    main()

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
        # would otherwise escape the measurement. Force with the noop
        # SINK, matching bench.py — count() lets Catalyst ELIMINATE
        # left joins against unique-key aggregates, so count-timings
        # of such plans (e.g. doc_dup_spans) are fiction.
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.3f}s rows={df.count()}")


if __name__ == "__main__":
    main()

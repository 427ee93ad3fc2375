"""A/B timing harness for optimization work: time registry queries with
N reps in ONE session and report min/median, so host-noise (this box's
page-cache reclaim daemon) doesn't masquerade as a plan change.

Usage: python scripts/ab_time.py [sf_dir] [--reps N] name [name ...]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from mobilityduck_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0].startswith("/"):
        sf_dir, args = args[0], args[1:]
    spark = get_spark()
    qs = entry_mod.queries()
    for name in args:
        ts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s "
            f"all={[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()

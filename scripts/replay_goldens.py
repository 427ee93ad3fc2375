"""Dev helper: replay reference goldens for selected .test files and print
failures/skips. Usage: python scripts/replay_goldens.py [file1.test ...]"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mobilityduck_spark import goldens as G
from mobilityduck_spark.session import get_spark

REF_DIR = "/root/reference/test/sql"


def main():
    names = sys.argv[1:]
    paths = (
        [os.path.join(REF_DIR, n) for n in names]
        if names
        else sorted(glob.glob(f"{REF_DIR}/*.test"))
    )
    spark = get_spark()
    stats = {"pass": 0, "fail": 0, "skip": 0}
    for path in paths:
        fname = os.path.basename(path)
        for sql, expected in G.load_cases(path):
            status, detail = G.replay_case(spark, sql, expected)
            stats[status] += 1
            if status == "fail":
                print(f"FAIL {fname}: {sql[:110]}\n  {detail[:240]}")
            elif status == "skip" and "-v" in sys.argv:
                print(f"SKIP {fname}: {sql[:110]}\n  {detail[:160]}")
    print(stats)


if __name__ == "__main__":
    main()

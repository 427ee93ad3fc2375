"""AQE skew-join probe (PERF.md evidence): a large-large sort-merge
join with a planted 30% hot key, measured with AQE skew-join splitting
ON vs OFF.

The window/aggregate operators survive power-law keys because per-key
work is linear (scripts/skew_probe_r8.py); JOINS are the class where a
hot key genuinely quadratic-concentrates one task. The production
lever is AQE's skewedJoin (runtime re-split of oversized partitions) —
this probe verifies it ACTIVATES on our session config and measures
the straggler contrast. Thresholds are scaled to the sf1 dataset
(default 256 MB skew threshold never fires on a 30 MB test table —
at 100 TB the defaults fire as-is).

Usage: python scripts/skew_join_probe.py [sf1_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mobilityduck_spark.session import get_spark  # noqa: E402
from skew_probe import completed_stage_ids, worst_stages  # noqa: E402

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"


def run(spark, label, df):
    before = completed_stage_ids(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"{label}: wall={wall:.2f}s")
    return worst_stages(spark, before, label)


def main() -> None:
    spark = get_spark(
        "skew_join_probe",
        extra_conf={
            # scale AQE's skew thresholds to the test data volume; the
            # 100 TB deployment uses the defaults (256 MB / 64 MB)
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # at test-data sizes the partition coalescer merges the
            # small partitions FIRST and the post-coalesce median no
            # longer flags the hot one; at 100 TB (hot partition in GBs
            # vs 64 MB advisory) the two rules compose. Disable
            # coalescing here so the demo isolates the skew splitter.
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    # 30% of the left lands on one hot key; right is large-large (no
    # broadcast) with 60 rows per key
    left = spark.range(2_000_000).select(
        F.when(F.col("id") % 10 < 3, F.lit(42))
        .otherwise(F.col("id") % 3000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(3000 * 60).select(
        (F.col("id") % 3000).alias("k"), (F.col("id") % 97).alias("w")
    )
    joined = left.join(right, "k").select(
        F.sum("w").alias("s"), F.count(F.lit(1)).alias("n")
    )

    joined.write.format("noop").mode("overwrite").save()  # warm

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run(spark, "skewed-join[AQE-split OFF]", joined)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    run(spark, "skewed-join[AQE-split ON]", joined)

    # activation proof on an EXECUTED QueryExecution (a fresh plan
    # object before execution shows only the initial, pre-AQE tree)
    rows = joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    print("skew-split active:", "skew=true" in plan)
    spark.stop()


if __name__ == "__main__":
    main()

"""Manual salted-join probe (PERF.md evidence): plain shuffle join vs
operators/skewjoin.salted_join on a planted 30%-hot key, with AQE's
skew splitter OFF — the regime the manual mitigation exists for
(non-SMJ plans, or engines/configs where the runtime splitter can't
fire). Complements scripts/skew_join_probe.py, which proves the AQE
path; together they cover both levers.

Usage: python scripts/salted_join_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mobilityduck_spark.operators.skewjoin import salted_join  # noqa: E402
from mobilityduck_spark.session import get_spark  # noqa: E402
from skew_probe import completed_stage_ids, worst_stages  # noqa: E402


def run(spark, label, df):
    before = completed_stage_ids(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"{label}: wall={wall:.2f}s")
    return worst_stages(spark, before, label)


def main() -> None:
    spark = get_spark(
        "salted_join_probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "false",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    # 30% of the fact lands on one hot key; dim has one row per key
    fact = spark.range(4_000_000).select(
        F.when(F.col("id") % 10 < 3, F.lit(42))
        .otherwise(F.col("id") % 3000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )
    plain = fact.join(dim, "k").agg(
        F.sum(F.col("w") * F.col("payload")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    salted = salted_join(fact, dim, "k", n_salts=16).agg(
        F.sum(F.col("w") * F.col("payload")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    # result parity first — salting must be invisible
    assert plain.collect() == salted.collect(), "salted join result drift"
    plain.write.format("noop").mode("overwrite").save()  # warm
    run(spark, "hot-key join [plain, AQE-split OFF]", plain)
    run(spark, "hot-key join [salted x16, AQE-split OFF]", salted)
    spark.stop()


if __name__ == "__main__":
    main()

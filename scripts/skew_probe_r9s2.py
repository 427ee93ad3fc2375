"""Round-9 second-session skew probe (PERF.md evidence): the new
user-keyed operators under the same planted power-law key as the r7/r8
probes (3% of all sf1 events reassigned to one user).

- multi_touch_attribution: the user-keyed conversions x touches join
  quadratic-concentrates the hot user's pairs, and the per-conversion
  windows key by conv_id (pair volume lands on the hot user's tasks).
- cuped_readout / woe_iv / survival_curve / kmv_distinct: |users|-sized
  aggregates — per-key work is linear, the class r7/r8 proved safe;
  included to keep the bar measured, not assumed.

Acceptance bar (PERF.md): no task >4x its stage median on the
production paths.

Usage: python scripts/skew_probe_r9s2.py [sf1_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mobilityduck_spark.session import get_spark  # noqa: E402
from skew_probe import SKEW_DIR, run  # noqa: E402

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"


def main() -> None:
    spark = get_spark(
        "skew_probe_r9s2", extra_conf={"spark.ui.enabled": "true"}
    )
    if not os.path.exists(f"{SKEW_DIR}/events.parquet"):
        os.makedirs(SKEW_DIR, exist_ok=True)
        ev0 = spark.read.parquet(f"{SF1}/events.parquet")
        ev0.withColumn(
            "user_id",
            F.when(F.col("event_id") % 33 == 0, F.lit(42)).otherwise(
                F.col("user_id")
            ),
        ).write.mode("overwrite").parquet(f"{SKEW_DIR}/events.parquet")
    ev = spark.read.parquet(f"{SKEW_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    n = ev.count()
    top = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    print(f"events={n} top_user={top['user_id']} share={top['count']/n:.3f}")

    from mobilityduck_spark.operators import events as EV

    run(spark, "multi_touch[skew]", EV.multi_touch_attribution(ev))
    run(spark, "cuped[skew]", EV.cuped_readout(ev))
    run(spark, "woe_iv[skew]", EV.woe_iv(ev))
    run(spark, "survival[skew]", EV.survival_curve(ev))
    run(spark, "kmv[skew]", EV.kmv_distinct(ev))
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-8 skew probe (PERF.md evidence): the new user-keyed window
operators (attribution, RFM) and the business-key-keyed SCD2 compaction
under a planted power-law key, measured with the same Spark-UI
task-summary machinery as scripts/skew_probe.py.

- events: 3% of ALL sf1 events reassigned to one user (as in the r7
  probe) — attribution's last-touch window and the RFM per-user
  aggregate both key by user_id.
- orders: 3% of all sf1 orders reassigned to one customer — the SCD2
  lag/lead windows key by o_custkey, so the planted customer's change
  log lands in one task.

Acceptance bar (PERF.md): no task >4x its stage median on the
production paths.

Usage: python scripts/skew_probe_r8.py [sf1_dir]
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
        "skew_probe_r8", extra_conf={"spark.ui.enabled": "true"}
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

    run(spark, "attribution[skew]", EV.attribution(ev))
    run(spark, "rfm_scores[skew]", EV.rfm_scores(ev))
    run(spark, "psi_drift[skew]", EV.psi_drift(ev))

    # ---- orders: one customer owns 3% of the change log
    if not os.path.exists(f"{SKEW_DIR}/orders.parquet"):
        od0 = spark.read.parquet(f"{SF1}/orders.parquet")
        od0.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 33 == 0, F.lit(77)).otherwise(
                F.col("o_custkey")
            ),
        ).write.mode("overwrite").parquet(f"{SKEW_DIR}/orders.parquet")
    od = spark.read.parquet(f"{SKEW_DIR}/orders.parquet").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    topc = od.groupBy("o_custkey").count().orderBy(F.desc("count")).first()
    print(f"orders top_cust={topc['o_custkey']} share={topc['count']/od.count():.3f}")

    from mobilityduck_spark.operators import governance as GV

    run(
        spark,
        "scd2_compact[skew]",
        GV.scd2_compact(
            od, "o_custkey", "o_orderdate", "o_orderpriority", "o_orderkey"
        ),
    )

    spark.stop()


if __name__ == "__main__":
    main()

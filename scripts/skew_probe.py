"""Skew-resilience probe (PERF.md evidence): plant a power-law user in
the events table and a celebrity hub in an edge graph, then measure
per-task duration distributions of the window/join stages through the
Spark UI REST API (max vs median task — the straggler ratio).

- events: 3% of ALL sf1 events reassigned to one user (power-law head).
  sessionize / rolling_stats / markov_transitions partition windows by
  user_id, so the planted user concentrates into one task's partition.
- graph: background Erdos-Renyi-ish graph (100k nodes, deg~10) plus one
  hub wired to `hub_deg` nodes. triangle_stats' wedge join is deg²-
  skewed by construction; the max_degree cap drops the hub BEFORE the
  self-join. Measured both capped and uncapped for the contrast.

Usage: python scripts/skew_probe.py [sf1_dir]
Prints one line per (probe, stage): n_tasks, median task ms, max task
ms, ratio. The acceptance bar in PERF.md: no task >4x the median of
its stage on the capped/production paths.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mobilityduck_spark.session import get_spark  # noqa: E402

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
SKEW_DIR = "/root/repo/.benchdata/sf1skew"


def api(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def completed_stage_ids(spark):
    return {s["stageId"] for s in api(spark, "/stages?status=complete")}


def worst_stages(spark, before, label, top=3):
    """For stages completed since `before`, print the ones with the
    highest max-task duration: tasks, median, max, straggler ratio."""
    rows = []
    for s in api(spark, "/stages?status=complete"):
        if s["stageId"] in before or s["numCompleteTasks"] < 2:
            continue
        try:
            q = api(
                spark,
                f"/stages/{s['stageId']}/0/taskSummary"
                "?quantiles=0.0,0.5,1.0",
            )
        except Exception:
            continue
        lo, med, mx = q["duration"]
        rows.append((mx, med, s["numCompleteTasks"], s["stageId"]))
    rows.sort(reverse=True)
    for mx, med, n, sid in rows[:top]:
        ratio = mx / med if med > 0 else float("inf")
        print(
            f"{label} stage {sid}: tasks={n} median={med:.0f}ms "
            f"max={mx:.0f}ms straggler={ratio:.1f}x"
        )
    return rows


def run(spark, label, df):
    before = completed_stage_ids(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"{label}: wall={wall:.2f}s")
    return worst_stages(spark, before, label)


def main() -> None:
    spark = get_spark(
        "skew_probe", extra_conf={"spark.ui.enabled": "true"}
    )

    # ---- plant the power-law user: 3% of all events -> user 42
    if not os.path.exists(f"{SKEW_DIR}/events.parquet"):
        os.makedirs(SKEW_DIR, exist_ok=True)
        ev = spark.read.parquet(f"{SF1}/events.parquet")
        ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % 33 == 0, F.lit(42)).otherwise(
                F.col("user_id")
            ),
        ).write.mode("overwrite").parquet(f"{SKEW_DIR}/events.parquet")
    # raw sf1 parquet reads ts as TIMESTAMP_NTZ; normalize like
    # sources.tables.load does (session tz is pinned UTC)
    ev = spark.read.parquet(f"{SKEW_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    n = ev.count()
    top = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    print(f"events={n} top_user={top['user_id']} share={top['count']/n:.3f}")

    from mobilityduck_spark.operators import events as EV

    run(spark, "sessionize[skew]", EV.sessionize(ev))
    run(spark, "rolling_stats[skew]", EV.rolling_stats(ev))
    run(spark, "markov[skew]", EV.markov_transitions(ev))

    # ---- hub graph: background deg~10 + one hub of degree hub_deg
    from mobilityduck_spark.operators import graph as G

    # hub id sits MID-RANGE: the ordered wedge join (a<b<c, keyed on the
    # middle id b) only quadratic-blows on a hub whose id falls between
    # its neighbors' — a max-id hub would dodge the join entirely
    n_nodes, n_bg, hub_deg, hub_id = 100_000, 500_000, 20_000, 50_000
    bg = spark.range(n_bg).select(
        (F.xxhash64("id", F.lit(1)) % n_nodes).alias("src"),
        (F.xxhash64("id", F.lit(2)) % n_nodes).alias("dst"),
    ).where((F.col("src") != F.col("dst")) & (F.col("src") != hub_id)
            & (F.col("dst") != hub_id))
    hub = spark.range(n_nodes).where(F.col("id") != hub_id).select(
        F.lit(hub_id).alias("src"), F.col("id").alias("dst")
    ).where(F.xxhash64("dst", F.lit(3)) % (n_nodes // hub_deg) == 0)
    edges = bg.unionAll(hub).persist()
    n_edges = edges.count()
    n_hub = edges.where(
        (F.col("src") == hub_id) | (F.col("dst") == hub_id)
    ).count()
    print(f"edges={n_edges} (hub {hub_id} degree ~{n_hub})")

    run(spark, "triangles[hub,uncapped]", G.triangle_stats(edges))
    run(spark, "triangles[hub,capped]",
        G.triangle_stats(edges, max_degree=256))

    spark.stop()


if __name__ == "__main__":
    main()

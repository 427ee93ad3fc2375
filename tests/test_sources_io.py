"""CSV source + table sink round-trips (sources/tables.py): the
reference ingests via COPY FROM CSV (benchmark/BerlinMOD/sql/load);
the temporal assembly must produce identical results from either
format."""

from pyspark.sql import functions as F

from mobilityduck_spark.functions import temporal as TT
from mobilityduck_spark.sources import tables as SRC

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_matches_parquet(spark, tmp_path):
    ev = SRC.load(spark, SF, "events").select("event_id", "ts", "user_id", "value")
    csv_dir = str(tmp_path / "events_csv")
    ev.withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    ).write.mode("overwrite").option("header", "true").csv(csv_dir)
    back = SRC.load_csv(
        spark, csv_dir,
        schema="event_id bigint, ts string, user_id bigint, value double",
        ts_cols=("ts",),
    )
    assert back.schema["ts"].dataType.typeName() == "timestamp"
    assert back.count() == ev.count()
    # temporal assembly gives identical per-user sequences either way
    def agg(df):
        return df.groupBy("user_id").agg(
            TT.tsequence(
                F.collect_list(
                    F.struct(F.col("ts").alias("t"), F.col("value").alias("v"))
                )
            ).alias("tf")
        )
    a = {r["user_id"]: r["tf"] for r in agg(ev).collect()}
    b = {r["user_id"]: r["tf"] for r in agg(back).collect()}
    assert a == b


def test_write_table_partitioned_prunes(spark, tmp_path):
    ev = SRC.load(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "ev_part")
    SRC.write_table(ev, out, partition_by=("day",), sort_by=("ts",))
    rd = spark.read.parquet(out)
    assert rd.count() == ev.count()
    # partition pruning: a day filter reads a subset of files
    one = rd.filter(F.col("day") == "2024-01-05")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() < rd.count()

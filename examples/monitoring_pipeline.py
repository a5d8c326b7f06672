"""The dashboard serving path, end to end — how panels get answered at
100 TB without rescanning events:

  events stream ──foreachBatch──▶ continuous rollup (scalar partials)
                                  + histogram rollup (bin counts)
  panels read ONLY the rollups:
    • hourly timeline, gap-filled + LOCF        (timeseries.gapfill/locf)
    • p95 per event type                        (rollup.histogram_quantile)
  and the raw counter surface:
    • checkpoints/hour from a cumulative counter (timeseries.counter_rate)

Run: ``python examples/monitoring_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from garmadon_spark.operators import timeseries
from garmadon_spark.session import get_spark, load_table
from garmadon_spark.sinks import rollup


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = tempfile.mkdtemp(prefix="garmadon_monitoring_")
    spark = get_spark("monitoring-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    src = f"{work}/src"
    ev.write.mode("overwrite").parquet(src)

    # 1. the stream feeds BOTH materialized rollups via foreachBatch
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 8).parquet(src)
    )
    q = rollup.rollup_query(stream, f"{work}/rollup", f"{work}/ckpt")
    q.awaitTermination()
    rollup.maintain_histogram_rollup(
        spark, spark.read.parquet(src), f"{work}/hist"
    )
    n_rollup = spark.read.parquet(f"{work}/rollup").count()
    n_events = ev.count()
    print(f"rollup: {n_rollup} partial rows serve {n_events} events "
          f"({n_events // max(n_rollup, 1)}x read reduction)")

    # 2. timeline panel: read the ROLLUP, densify, carry forward
    view = rollup.read_rollup(spark, f"{work}/rollup")
    series = view.select(
        "event_type", "bucket", "avg_value"
    )
    dense = timeseries.gapfill(series, group_cols=("event_type",))
    timeline = timeseries.locf(
        dense, "avg_value", group_cols=("event_type",)
    )
    gaps = timeline.filter(F.col("is_gap")).count()
    print(f"timeline: {timeline.count()} dense cells, "
          f"{gaps} gaps filled by LOCF — zero event reads")

    # 3. p95 panel straight from bin counts
    hist = spark.read.parquet(f"{work}/hist")
    p95 = rollup.histogram_quantile(hist, 0.95, per_bucket=False)
    for r in p95.orderBy("event_type").collect():
        print(f"p95[{r.event_type}] ≈ {r.p95_est} (from bins, ±10)")

    # 4. Prometheus increase() over a cumulative counter with resets
    counter = ev.select(
        "user_id",
        (F.unix_timestamp("ts") * 1000).alias("timestamp"),
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts")
        ).alias("n_events_seen"),
    )
    rate = timeseries.counter_rate(
        counter, "n_events_seen", group_cols=("user_id",)
    )
    top = rate.orderBy(F.desc("increase")).first()
    print(f"busiest hour: user {top.user_id} bucket {top.bucket} "
          f"(+{top.increase} events)")

    # 5. heavy hitters over the SAME stream with O(k) state: the
    # Misra-Gries summary maintained per micro-batch — which value
    # ranges dominate, without a per-key streaming groupBy
    from garmadon_spark.streaming import sketch as ssk

    buckets = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 8).parquet(src)
        .select(F.floor(F.col("value") / 50).cast("int").alias("item"))
    )
    ssk.maintain_freq_items_stream(
        buckets, f"{work}/freq", f"{work}/ckpt_freq", k=4
    ).start().awaitTermination()
    summary, n_seen = ssk.load_freq_summary(spark, f"{work}/freq")
    hh = sorted(summary.items(), key=lambda kv: -kv[1])
    print(f"heavy value buckets over {n_seen} events "
          f"(>= count {n_seen // 5} guaranteed present): {hh}")


if __name__ == "__main__":
    main()

"""SparkSession factory tuned for the engine.

Defaults target the test harness (local[N], 128 GiB single JVM) but every
knob is chosen to also be the right default on a 1000-executor cluster:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy demotion are exactly what a 100 TB run needs.
- ``spark.sql.shuffle.partitions`` stays modest locally (32) but is only a
  pre-AQE hint; at cluster scale AQE re-coalesces from
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
- Arrow enabled: every pandas UDF in this engine moves batches, not rows.
- Session timezone pinned to UTC: the reference buckets days/hours in UTC
  (PartitionedWriter.java:103); correctness against the DuckDB oracle
  (naive timestamps) also requires it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # runtime bloom-filter pushed to the probe side of shuffle joins —
    # at 100 TB this prunes fact-table rows before the exchange
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # local-mode JVM heap defaults to 1g — far under the harness's
    # memory; wide aggs (64-column minhash) GC-thrash there.  Only
    # applies at JVM launch (getOrCreate of the first session).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.sql.shuffle.partitions": "32",
    # Structured Streaming: bounded state cleanup by default.
    "spark.sql.streaming.stateStore.compression.codec": "lz4",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "garmadon-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` sets local parallelism (driver contract);
    ``master`` overrides entirely (e.g. yarn / k8s in production).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one fixture table. Plain parquet scan → Catalyst gets full
    predicate pushdown + column pruning on whatever the caller selects.

    Works against any caller-supplied SparkSession (the driver builds its
    own), so the two correctness-critical confs are (re)applied here:
    UTC session time (the oracle compares naive wall-clock timestamps) and
    nanos-as-long (older fixtures store TIMESTAMP(NANOS), which the
    vectorized reader otherwise rejects); nanos are floor-divided to
    micros, matching DuckDB's ns→us truncation.

    ``events.ts`` is normalized to a session-TZ TIMESTAMP whatever the
    fixture's physical type: TIMESTAMP(NANOS) → bigint (nanosAsLong) →
    floor-div to micros; TIMESTAMP(MICROS, isAdjustedToUTC=false) →
    TIMESTAMP_NTZ → cast (wall-clock preserving under the UTC session
    TZ); already-LTZ stays as-is.  Downstream numeric casts
    (``ts.cast('long')`` in sessionization) require LTZ.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=TPCH_TABLES):
    return {n: load_table(spark, sf_dir, n) for n in names}

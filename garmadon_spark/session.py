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
    # Partition discovery over the engine's prefix-partitioned index
    # trees (bands: 32x256 leaf dirs, simhash chunks: 16x256): Spark's
    # default kicks off a distributed listing JOB above 32 paths with
    # one task per directory — ~8,200 tiny tasks of pure scheduling
    # overhead (measured 26 s to merely CONSTRUCT the bands scan
    # locally).  On a local master the filesystem is local and
    # driver-side listing is ~20x faster (1.1 s), so force it there;
    # on a cluster master remote listStatus round trips dominate and
    # the distributed listing is kept, just with sane task sizing
    # (64 tasks listing ~hundreds of dirs each beats 10,000
    # single-dir tasks there too).  Both env-overridable.
    if master.startswith("local"):
        conf.setdefault(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_THRESHOLD", "100000"))
    conf.setdefault(
        "spark.sql.sources.parallelPartitionDiscovery.parallelism",
        os.environ.get("SPARK_GRAFT_LIST_PARALLELISM", "64"))
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


# ---------------------------------------------------------------------------
# Plan-level scan memo (r14, guide §1.2): every declared query used to pay
# ~85-105 ms of pure driver time PER TABLE just constructing the parquet
# scan (py4j round trip + file listing + footer/schema read) — per call,
# even warm, times 199 queries times 3 bench passes.  A parquet-scan
# DataFrame is an immutable logical plan; reusing the object is NOT result
# caching (no .cache(), no CacheManager entry — every action still reads
# the parquet files from disk).  The memo key carries a stat-derived
# version token so a rewritten/regenerated input invalidates the entry;
# it is scoped to the read-only base/fixture tables (load_table /
# engine._corpus_tables) — mutable index trees keep fresh reads.
_SCAN_MEMO: dict = {}


def _path_version(path: str):
    """Change token: a full recursive stat-walk (names, mtimes, sizes).
    Any file added, removed or rewritten ANYWHERE under the path —
    including appends two partition levels deep in the prefix-
    partitioned index trees — moves the token.  Cost is ~10 ms per
    1,000 files on a local fs, an order of magnitude cheaper than
    Spark re-listing the tree through the JVM.

    Raises OSError for paths this process cannot ``os.stat`` (remote
    storage: ``hdfs://``, ``s3a://``); callers fall back to a plain
    unmemoized ``spark.read.parquet`` there — the memo is a local-mode
    driver-latency optimization, never a correctness dependency."""
    st = os.stat(path)
    ver = [st.st_mtime_ns, st.st_size]
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for f in sorted(files):
                try:
                    fs = os.stat(os.path.join(root, f))
                except OSError:
                    continue
                ver.append(f)
                ver.append(fs.st_mtime_ns)
                ver.append(fs.st_size)
    return tuple(ver)


def scan_parquet(spark: SparkSession, path: str, schema: str | None = None,
                 options: dict | None = None):
    """Memoized parquet scan: returns the same (immutable) DataFrame for
    an unchanged path within one Spark application.  Plan reuse only —
    execution always re-reads the files.  ``schema``/``options`` become
    part of the memo key (the partitioned index trees pass an explicit
    schema + basePath; re-listing their thousands of leaf dirs per
    construction was the dominant cost)."""
    key = (spark.sparkContext.applicationId, path, schema,
           tuple(sorted(options.items())) if options else None)
    try:
        ver = _path_version(path)
    except OSError:
        ver = None  # remote storage: no stat token → no memo entry
    if ver is not None:
        hit = _SCAN_MEMO.get(key)
        if hit is not None and hit[0] == ver:
            return hit[1]
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    df = reader.parquet(path)
    if ver is not None:
        _SCAN_MEMO[key] = (ver, df)
    return df


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
        # memoize the POST-normalization frame: the ts probe (a py4j
        # schema fetch) and the withColumn are part of the per-call cost
        key = (spark.sparkContext.applicationId, path, "events-norm")
        try:
            ver = _path_version(path)
        except OSError:
            ver = None  # remote storage: no stat token → no memo entry
        if ver is not None:
            hit = _SCAN_MEMO.get(key)
            if hit is not None and hit[0] == ver:
                return hit[1]
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if ver is not None:
            _SCAN_MEMO[key] = (ver, df)
        return df
    return scan_parquet(spark, path)


def load_tables(spark: SparkSession, sf_dir: str, names=TPCH_TABLES):
    return {n: load_table(spark, sf_dir, n) for n in names}

"""Garmadon-native dashboard panels over the typed event tables.

The §2.7 read-side surface expressed on the REAL event families (the
ev_* set in dashboard.py exercises the same agg shapes on the driver's
generic `events` table; these run on the garmadon fixture tables and are
DuckDB-verified in tests/test_panels_oracle.py):

- "FS actions over time"        (garmadon-hdfs dashboard; the SURVEY §7
                                 minimum end-to-end slice)
- "FS failure rate per URI"     (lucene `status:FAILURE` filter panels)
- "Heap used per app over time" (garmadon-jvm dashboards, E4 explode)
- "GC pause percentiles"        (percentiles metric agg)
- "Container memory headroom"   (CONTAINER_MONITORING value vs limit)
- "Top apps by shuffle volume"  (terms size=k over SPARK_TASK metrics)

Time bucketing is integer epoch-millis arithmetic (`timestamp div
bucket_ms`; `div`, not `/`+cast — Spark's `/` on longs goes through
double and can truncate across a bucket boundary) — identical semantics
in Spark and DuckDB, timezone-free,
and at scale it folds into the scan projection (no casts, prunes on the
day-partitioned archive).

Every panel is a single shuffle: scan → map-side partial agg → final
agg (+ a k-row limit for top-k).  Filters sit before the agg so they
reach the Parquet scan (PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from garmadon_spark.operators.jvmstats import explode_heap

MINUTE_MS = 60_000
HOUR_MS = 3_600_000


def fs_actions_per_minute(fs_events: DataFrame) -> DataFrame:
    """FS actions over time — count per (1-minute bucket, action)."""
    return (
        fs_events.groupBy(
            F.expr(f"timestamp div {MINUTE_MS}").alias("minute_bucket"),
            "action",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


FS_ACTIONS_PER_MINUTE_SQL = """
SELECT CAST(timestamp // 60000 AS BIGINT) AS minute_bucket,
       action, COUNT(*) AS cnt
FROM fs_event GROUP BY 1, 2
"""


def fs_failure_rate_by_uri(fs_events: DataFrame) -> DataFrame:
    """Failure ratio per nameservice URI (status enum, conditional count
    inside one aggregate)."""
    fail = F.when(F.col("status") == "FAILURE", F.lit(1)).otherwise(F.lit(0))
    return (
        fs_events.groupBy("uri")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(fail).alias("failures"),
            F.round(F.sum(fail) / F.count(F.lit(1)), 4).alias("failure_ratio"),
        )
    )


FS_FAILURE_RATE_BY_URI_SQL = """
SELECT uri, COUNT(*) AS total,
       CAST(SUM(CASE WHEN status = 'FAILURE' THEN 1 ELSE 0 END) AS BIGINT) AS failures,
       ROUND(SUM(CASE WHEN status = 'FAILURE' THEN 1 ELSE 0 END)
             / COUNT(*), 4) AS failure_ratio
FROM fs_event GROUP BY uri
"""


def heap_used_hourly(jvmstats: DataFrame) -> DataFrame:
    """Avg/max heap used per (app, hour) — the E4 typed heap extract
    feeding a date_histogram+avg panel."""
    heap = explode_heap(jvmstats)
    return (
        heap.groupBy(
            "application_id",
            F.expr(f"timestamp div {HOUR_MS}").alias("hour_bucket"),
        )
        .agg(
            F.round(F.avg("heap_used"), 4).alias("avg_heap_used"),
            F.max("heap_used").alias("max_heap_used"),
            F.max("heap_max").alias("heap_max"),
        )
    )


HEAP_USED_HOURLY_SQL = """
SELECT application_id,
       CAST(timestamp // 3600000 AS BIGINT) AS hour_bucket,
       ROUND(AVG(heap_used), 4) AS avg_heap_used,
       MAX(heap_used) AS max_heap_used,
       MAX(heap_max) AS heap_max
FROM jvmstats_heap GROUP BY 1, 2
"""


def fs_path_prefix_stats(fs_events: DataFrame,
                         prefix: str = "/var") -> DataFrame:
    """The lucene `dst_path:"/tmp"` path_hierarchy-tokenizer filter
    (ElasticSearchReader.java:180-182) → `startswith` on the
    URI-stripped path (E5 normalization), then action counts.  The
    startswith predicate compiles to a scan-level StringStartsWith
    pushed filter."""
    from garmadon_spark.operators.normalize import strip_uri_prefix

    stripped = strip_uri_prefix(F.col("dst_path"), F.col("uri"))
    return (
        fs_events.withColumn("path", stripped)
        .filter(F.col("path").startswith(prefix))
        .groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("method_duration_millis"), 4).alias("avg_ms"),
        )
    )


FS_PATH_PREFIX_STATS_SQL = """
SELECT action, COUNT(*) AS cnt,
       ROUND(AVG(method_duration_millis), 4) AS avg_ms
FROM (SELECT action, method_duration_millis,
             replace(dst_path, uri, '') AS path
      FROM fs_event)
WHERE path LIKE '/var%'
GROUP BY action
"""


def flink_checkpoint_panel(flink_job_events: DataFrame) -> DataFrame:
    """The garmadon-flink dashboard's checkpoint panels (the read-side
    of heuristic A9, FlinkCheckpointDuration.java:40-99): per (app,
    job) worst checkpoint duration/size and the failed-checkpoint
    ratio."""
    return (
        flink_job_events.groupBy("application_id", "job_id", "job_name")
        .agg(
            F.max("last_checkpoint_duration").alias("max_checkpoint_ms"),
            F.max("last_checkpoint_size").alias("max_checkpoint_bytes"),
            F.max("number_of_completed_checkpoints").alias("completed"),
            F.max("number_of_failed_checkpoints").alias("failed"),
            F.round(
                F.max("number_of_failed_checkpoints")
                / F.greatest(
                    F.max("number_of_completed_checkpoints")
                    + F.max("number_of_failed_checkpoints"),
                    F.lit(1),
                ),
                4,
            ).alias("failure_ratio"),
        )
    )


FLINK_CHECKPOINT_PANEL_SQL = """
SELECT application_id, job_id, job_name,
       MAX(last_checkpoint_duration) AS max_checkpoint_ms,
       MAX(last_checkpoint_size) AS max_checkpoint_bytes,
       MAX(number_of_completed_checkpoints) AS completed,
       MAX(number_of_failed_checkpoints) AS failed,
       ROUND(MAX(number_of_failed_checkpoints) /
             GREATEST(MAX(number_of_completed_checkpoints)
                      + MAX(number_of_failed_checkpoints), 1), 4)
           AS failure_ratio
FROM flink_job_event
GROUP BY application_id, job_id, job_name
"""


def flink_checkpoint_rate(flink_job_events: DataFrame) -> DataFrame:
    """Checkpoints completed per hour per job, derived from the
    CUMULATIVE counter the reporter exports
    (total_number_of_checkpoints, flink_event.proto:26) — the
    Prometheus increase() panel, counter resets (job restarts) handled
    by operators/timeseries.py::counter_rate.  Integer arithmetic end
    to end."""
    from garmadon_spark.operators.timeseries import counter_rate

    return counter_rate(
        flink_job_events,
        "total_number_of_checkpoints",
        ts_col="timestamp",
        group_cols=("job_id",),
        bucket_ms=HOUR_MS,
        out_col="checkpoints_completed",
    ).withColumnRenamed("bucket", "hour_bucket")


FLINK_CHECKPOINT_RATE_SQL = """
WITH d AS (
  SELECT job_id,
         CAST(timestamp // 3600000 AS BIGINT) AS hour_bucket,
         total_number_of_checkpoints AS v,
         lag(total_number_of_checkpoints) OVER (
           PARTITION BY job_id
           ORDER BY timestamp, total_number_of_checkpoints) AS pv
  FROM flink_job_event
)
SELECT hour_bucket, job_id,
       CAST(SUM(CASE WHEN pv IS NULL THEN 0
                     WHEN v >= pv THEN v - pv
                     ELSE v END) AS BIGINT) AS checkpoints_completed
FROM d GROUP BY 1, 2
"""


def spark_task_locality_spill(spark_tasks: DataFrame) -> DataFrame:
    """Spark-task dashboard shape: per (locality, status) task counts,
    spill volume (disk + memory), and mean run time — the terms-bucket
    × sum/avg metric panels over the 32 task-metric columns."""
    return (
        spark_tasks.groupBy("locality", "status")
        .agg(
            F.count(F.lit(1)).alias("n_tasks"),
            F.sum(
                F.col("disk_bytes_spilled") + F.col("memory_bytes_spilled")
            ).alias("spilled_bytes"),
            F.round(F.avg("executor_run_time"), 4).alias("avg_run_ms"),
            F.sum("shuffle_read_records").alias("shuffle_read_records"),
        )
    )


SPARK_TASK_LOCALITY_SPILL_SQL = """
SELECT locality, status, COUNT(*) AS n_tasks,
       CAST(SUM(disk_bytes_spilled + memory_bytes_spilled) AS BIGINT) AS spilled_bytes,
       ROUND(AVG(executor_run_time), 4) AS avg_run_ms,
       CAST(SUM(shuffle_read_records) AS BIGINT) AS shuffle_read_records
FROM spark_task_event
GROUP BY locality, status
"""


def gc_pause_percentiles(gc_events: DataFrame) -> DataFrame:
    """GC pause p50/p95 + worst 1-min pause ratio per collector."""
    return (
        gc_events.groupBy("collector_name")
        .agg(
            F.count(F.lit(1)).alias("n_collections"),
            F.round(F.expr("percentile(pause_time, 0.5)"), 4).alias("p50_pause"),
            F.round(F.expr("percentile(pause_time, 0.95)"), 4).alias("p95_pause"),
            F.round(F.max("gc_pause_ratio_1_min"), 4).alias("max_pause_ratio"),
        )
    )


GC_PAUSE_PERCENTILES_SQL = """
SELECT collector_name,
       COUNT(*) AS n_collections,
       ROUND(quantile_cont(pause_time, 0.5), 4) AS p50_pause,
       ROUND(quantile_cont(pause_time, 0.95), 4) AS p95_pause,
       ROUND(MAX(gc_pause_ratio_1_min), 4) AS max_pause_ratio
FROM gc_event GROUP BY collector_name
"""


def container_memory_headroom(container_monitoring: DataFrame) -> DataFrame:
    """Peak memory vs limit per container (MEMORY rows only — the filter
    reaches the scan)."""
    # float32 gauge → double BEFORE arithmetic: float math rounds
    # differently per engine (DuckDB keeps FLOAT ops in float32)
    val = F.col("value").cast("double")
    return (
        container_monitoring.filter(F.col("type") == "MEMORY")
        .groupBy("application_id", "container_id")
        .agg(
            F.round(F.max(val), 4).alias("peak_memory"),
            F.max("limit").alias("memory_limit"),
            F.round(
                (F.max("limit") - F.max(val)) * 100.0 / F.max("limit"), 4
            ).alias("headroom_pct"),
        )
    )


CONTAINER_MEMORY_HEADROOM_SQL = """
SELECT application_id, container_id,
       ROUND(MAX(CAST(value AS DOUBLE)), 4) AS peak_memory,
       MAX("limit") AS memory_limit,
       ROUND((MAX("limit") - MAX(CAST(value AS DOUBLE))) * 100.0
             / MAX("limit"), 4) AS headroom_pct
FROM container_monitoring_event
WHERE type = 'MEMORY'
GROUP BY 1, 2
"""


def top_shuffle_apps(spark_task_events: DataFrame, k: int = 5) -> DataFrame:
    """Top-k applications by total shuffle volume (terms size=k panel
    over SPARK_TASK metric sums)."""
    counts = (
        spark_task_events.groupBy("application_id")
        .agg(
            F.sum(
                F.col("shuffle_read_total_bytes")
                + F.col("shuffle_write_shuffle_bytes")
            ).alias("shuffle_bytes"),
            F.sum("input_bytes").alias("input_bytes"),
            F.sum("output_bytes").alias("output_bytes"),
        )
    )
    return counts.orderBy(
        F.desc("shuffle_bytes"), F.asc("application_id")
    ).limit(k)


TOP_SHUFFLE_APPS_SQL = """
SELECT application_id,
       CAST(SUM(shuffle_read_total_bytes + shuffle_write_shuffle_bytes)
           AS BIGINT) AS shuffle_bytes,
       CAST(SUM(input_bytes) AS BIGINT) AS input_bytes,
       CAST(SUM(output_bytes) AS BIGINT) AS output_bytes
FROM spark_task_event
GROUP BY application_id
ORDER BY shuffle_bytes DESC, application_id ASC
LIMIT 5
"""


def fs_compound_dashboard(fs_events: DataFrame,
                          prefix: str = "/user") -> DataFrame:
    """The garmadon-hdfs dashboard's widest lucene conjunction
    (`event_type:FS_EVENT AND uri:$uri AND action:$action AND
    dst_path:$path AND NOT framework:""`, grafana/garmadon-hdfs.json):
    path-hierarchy prefix ⊕ NOT-empty-field ⊕ tag membership, grouped
    by the two dashboard template variables (uri, action).  All
    conjuncts sit ahead of the agg so the equality/NOT-empty legs reach
    the Parquet scan as pushed filters; the tag test is an
    array_contains on the scan output."""
    from garmadon_spark.operators.normalize import strip_uri_prefix

    stripped = strip_uri_prefix(F.col("dst_path"), F.col("uri"))
    return (
        fs_events.withColumn("path", stripped)
        .filter(
            F.col("path").startswith(prefix)
            & (F.col("framework") != "")
            & F.array_contains("tags", "YARN_APPLICATION")
        )
        .groupBy("uri", "action")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("method_duration_millis"), 4).alias("avg_ms"),
            F.max("method_duration_millis").alias("max_ms"),
        )
    )


FS_COMPOUND_DASHBOARD_SQL = """
SELECT uri, action, COUNT(*) AS cnt,
       ROUND(AVG(method_duration_millis), 4) AS avg_ms,
       MAX(method_duration_millis) AS max_ms
FROM (SELECT uri, action, method_duration_millis, framework, tags,
             replace(dst_path, uri, '') AS path
      FROM fs_event)
WHERE path LIKE '/user%' AND framework <> ''
  AND list_contains(tags, 'YARN_APPLICATION')
GROUP BY uri, action
"""


def spark_executor_churn(executor_state_events: DataFrame) -> DataFrame:
    """The garmadon-spark-job executor panels: per (app, attempt) counts
    of `state:ADDED`, `state:REMOVED`, and the dashboard's double
    negation `NOT state:REMOVED AND NOT state:ADDED` residual
    (blacklisting etc.), plus the worst task_failures gauge
    (grafana/garmadon-spark-job.json).  Four panel filters share one
    scan + one shuffle as conditional counts."""
    return (
        executor_state_events.groupBy("application_id", "attempt_id")
        .agg(
            F.count(F.when(F.col("state") == "ADDED", 1)).alias("added"),
            F.count(F.when(F.col("state") == "REMOVED", 1)).alias(
                "removed"
            ),
            F.count(
                F.when(~F.col("state").isin("ADDED", "REMOVED"), 1)
            ).alias("other_state_events"),
            F.max("task_failures").alias("max_task_failures"),
        )
    )


SPARK_EXECUTOR_CHURN_SQL = """
SELECT application_id, attempt_id,
       COUNT(*) FILTER (WHERE state = 'ADDED') AS added,
       COUNT(*) FILTER (WHERE state = 'REMOVED') AS removed,
       COUNT(*) FILTER (WHERE state NOT IN ('ADDED', 'REMOVED'))
           AS other_state_events,
       MAX(task_failures) AS max_task_failures
FROM spark_executor_state_event
GROUP BY 1, 2
"""


def container_vcore_usage(container_monitoring: DataFrame) -> DataFrame:
    """The garmadon-yarn-application monitoring panels' compound filter
    (`event_type:CONTAINER_MONITORING_EVENT AND type:VCORE AND tags:...
    AND hostname:$hostname AND component:$component AND
    username:$username`, grafana/garmadon-yarn-application.json): mean
    and peak vcore usage vs limit per (hostname, component, username) —
    the three remaining template variables become the group key."""
    # float32 gauge → double BEFORE arithmetic (same rule as
    # container_memory_headroom: float32 division rounds differently
    # per engine)
    val = F.col("value").cast("double")
    return (
        container_monitoring.filter(
            (F.col("type") == "VCORE")
            & F.array_contains("tags", "YARN_APPLICATION")
        )
        .groupBy("hostname", "component", "username")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg(val / F.col("limit")), 4).alias(
                "avg_usage_ratio"
            ),
            F.round(F.max(val), 4).alias("peak_value"),
        )
    )


CONTAINER_VCORE_USAGE_SQL = """
SELECT hostname, component, username, COUNT(*) AS cnt,
       ROUND(AVG(CAST(value AS DOUBLE) / "limit"), 4) AS avg_usage_ratio,
       ROUND(MAX(CAST(value AS DOUBLE)), 4) AS peak_value
FROM container_monitoring_event
WHERE type = 'VCORE' AND list_contains(tags, 'YARN_APPLICATION')
GROUP BY 1, 2, 3
"""


def compute_node_capacity(container_monitoring: DataFrame) -> DataFrame:
    """The garmadon-compute dashboard's node-overview stack
    ('Applications/Containers runnning' + 'YARN Memory Used/Reserved',
    grafana/garmadon-compute.json): `event_type:CONTAINER_MONITORING_
    EVENT AND type:MEMORY AND tags:... AND hostname:$hostname` with TWO
    cardinality metrics and TWO sum metrics over one date_histogram —
    per (hostname, hour) running containers/apps and used/reserved
    memory.  (The dashboard's `tags:NODEMANAGER` conjunct is bound to
    the fixture corpus's tag vocabulary, `YARN_APPLICATION`; the filter
    shape is identical.)  Four metrics share one scan + one shuffle;
    the distinct-counts are per-group hash sets over bounded
    container/app ids."""
    val = F.col("value").cast("double")
    return (
        container_monitoring.filter(
            (F.col("type") == "MEMORY")
            & F.array_contains("tags", "YARN_APPLICATION")
        )
        .groupBy(
            "hostname",
            F.expr(f"timestamp div {HOUR_MS}").alias("hour_bucket"),
        )
        .agg(
            F.count_distinct("container_id").alias("n_containers"),
            F.count_distinct("application_id").alias("n_apps"),
            F.round(F.sum(val), 4).alias("memory_used"),
            F.sum("limit").alias("memory_reserved"),
        )
    )


COMPUTE_NODE_CAPACITY_SQL = """
SELECT hostname,
       CAST(timestamp // 3600000 AS BIGINT) AS hour_bucket,
       COUNT(DISTINCT container_id) AS n_containers,
       COUNT(DISTINCT application_id) AS n_apps,
       ROUND(SUM(CAST(value AS DOUBLE)), 4) AS memory_used,
       CAST(SUM("limit") AS BIGINT) AS memory_reserved
FROM container_monitoring_event
WHERE type = 'MEMORY' AND list_contains(tags, 'YARN_APPLICATION')
GROUP BY 1, 2
"""


def compute_top_app_reserved(container_monitoring: DataFrame,
                             k: int = 5) -> DataFrame:
    """'Top app reserved memory' / 'Top app running container'
    (grafana/garmadon-compute.json): terms(application_id) size=k
    ordered by the sum metric — reservation-weighted top applications
    with their live-container cardinality.  Distributed agg then
    TakeOrdered(k); only k rows reach the driver."""
    counts = (
        container_monitoring.filter(F.col("type") == "MEMORY")
        .groupBy("application_id")
        .agg(
            F.sum("limit").alias("reserved_memory"),
            F.count_distinct("container_id").alias("n_containers"),
        )
    )
    return counts.orderBy(
        F.desc("reserved_memory"), F.asc("application_id")
    ).limit(k)


COMPUTE_TOP_APP_RESERVED_SQL = """
SELECT application_id,
       CAST(SUM("limit") AS BIGINT) AS reserved_memory,
       COUNT(DISTINCT container_id) AS n_containers
FROM container_monitoring_event
WHERE type = 'MEMORY'
GROUP BY application_id
ORDER BY reserved_memory DESC, application_id ASC
LIMIT 5
"""


def compute_user_framework_usage(jvmstats: DataFrame) -> DataFrame:
    """'#Applications Per User' / '#Container Per Framework/Component'
    (grafana/garmadon-compute.json): the dashboard's DOUBLE terms stack
    — terms(framework) × terms(component) under the per-user filter —
    with cardinality metrics: distinct apps and containers per
    (username, framework, component) over `event_type:JVMSTATS_EVENT
    AND tags:YARN_APPLICATION`."""
    return (
        jvmstats.filter(F.array_contains("tags", "YARN_APPLICATION"))
        .groupBy("username", "framework", "component")
        .agg(
            F.count_distinct("application_id").alias("n_apps"),
            F.count_distinct("container_id").alias("n_containers"),
        )
    )


COMPUTE_USER_FRAMEWORK_USAGE_SQL = """
SELECT username, framework, component,
       COUNT(DISTINCT application_id) AS n_apps,
       COUNT(DISTINCT container_id) AS n_containers
FROM jvmstats_event
WHERE list_contains(tags, 'YARN_APPLICATION')
GROUP BY 1, 2, 3
"""


def executor_task_runtime(spark_tasks: DataFrame) -> DataFrame:
    """The garmadon-spark-job-executors 'Task runtime' / 'Number of
    Tasks/Status/ExecutorId' panels: `event_type:SPARK_TASK_EVENT AND
    application_id:$application_id AND ... AND executor_hostname:
    $executor_hostname` → per (application_id, executor_hostname) task
    counts by status plus run-time percentiles (the dashboard's
    percentile metric agg over executor_run_time)."""
    return (
        spark_tasks.groupBy("application_id", "executor_hostname")
        .agg(
            F.count(F.lit(1)).alias("n_tasks"),
            F.count(F.when(F.col("status") == "failed", 1)).alias(
                "n_failed"
            ),
            F.round(F.expr("percentile(executor_run_time, 0.5)"), 4)
            .alias("p50_run_ms"),
            F.round(F.expr("percentile(executor_run_time, 0.95)"), 4)
            .alias("p95_run_ms"),
            F.max("jvm_gc_time").alias("max_gc_ms"),
        )
    )


EXECUTOR_TASK_RUNTIME_SQL = """
SELECT application_id, executor_hostname,
       COUNT(*) AS n_tasks,
       COUNT(*) FILTER (WHERE status = 'failed') AS n_failed,
       ROUND(quantile_cont(executor_run_time, 0.5), 4) AS p50_run_ms,
       ROUND(quantile_cont(executor_run_time, 0.95), 4) AS p95_run_ms,
       MAX(jvm_gc_time) AS max_gc_ms
FROM spark_task_event
GROUP BY 1, 2
"""


def stage_shuffle_timeline(spark_tasks: DataFrame) -> DataFrame:
    """The garmadon-spark-job-stages dashboard condensed: its 'Number of
    Tasks/Status' triple stack (terms(stage) × terms(status) ×
    date_histogram) carrying the CPU/shuffle sum metrics of the
    stage-timeline panels (run time, GC, remote-fetch wait, shuffle
    write time, bytes fetched/written) — per (stage_id, status, hour)
    in ONE scan + ONE shuffle instead of the dashboard's 14 separate
    targets."""
    return (
        spark_tasks.groupBy(
            "stage_id",
            "status",
            F.expr(f"timestamp div {HOUR_MS}").alias("hour_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_tasks"),
            F.sum("executor_run_time").alias("run_ms"),
            F.sum("jvm_gc_time").alias("gc_ms"),
            F.sum("shuffle_read_fetch_wait_time").alias("fetch_wait_ms"),
            F.sum("shuffle_write_shuffle_time").alias("write_ms"),
            F.sum("shuffle_read_total_bytes").alias("bytes_fetched"),
            F.sum("shuffle_write_shuffle_bytes").alias("bytes_written"),
        )
    )


STAGE_SHUFFLE_TIMELINE_SQL = """
SELECT stage_id, status,
       CAST(timestamp // 3600000 AS BIGINT) AS hour_bucket,
       COUNT(*) AS n_tasks,
       CAST(SUM(executor_run_time) AS BIGINT) AS run_ms,
       CAST(SUM(jvm_gc_time) AS BIGINT) AS gc_ms,
       CAST(SUM(shuffle_read_fetch_wait_time) AS BIGINT) AS fetch_wait_ms,
       CAST(SUM(shuffle_write_shuffle_time) AS BIGINT) AS write_ms,
       CAST(SUM(shuffle_read_total_bytes) AS BIGINT) AS bytes_fetched,
       CAST(SUM(shuffle_write_shuffle_bytes) AS BIGINT) AS bytes_written
FROM spark_task_event
GROUP BY 1, 2, 3
"""


def flink_task_throughput(flink_tasks: DataFrame) -> DataFrame:
    """The garmadon-flink-job-tasks dashboard condensed: per (job,
    task) record/byte throughput, network-buffer backpressure gauges
    (pool usage, queue lengths — the dashboard's 'estimate of the
    output/input buffers usage'), and late-record drops.  Fourteen
    sum/max targets over one scan + one shuffle."""
    return (
        flink_tasks.groupBy("job_name", "task_name")
        .agg(
            F.sum("num_records_in").alias("records_in"),
            F.sum("num_records_out").alias("records_out"),
            F.sum(
                F.col("num_bytes_in_local") + F.col("num_bytes_in_remote")
            ).alias("bytes_in"),
            F.sum("num_bytes_out").alias("bytes_out"),
            F.round(F.max("buffers_in_pool_usage").cast("double"), 4)
            .alias("max_in_pool_usage"),
            F.round(F.max("buffers_out_pool_usage").cast("double"), 4)
            .alias("max_out_pool_usage"),
            F.max("buffers_input_queue_length").alias("max_in_queue"),
            F.sum("num_late_records_dropped").alias("late_dropped"),
        )
    )


FLINK_TASK_THROUGHPUT_SQL = """
SELECT job_name, task_name,
       CAST(SUM(num_records_in) AS BIGINT) AS records_in,
       CAST(SUM(num_records_out) AS BIGINT) AS records_out,
       CAST(SUM(num_bytes_in_local + num_bytes_in_remote) AS BIGINT)
           AS bytes_in,
       CAST(SUM(num_bytes_out) AS BIGINT) AS bytes_out,
       ROUND(CAST(MAX(buffers_in_pool_usage) AS DOUBLE), 4)
           AS max_in_pool_usage,
       ROUND(CAST(MAX(buffers_out_pool_usage) AS DOUBLE), 4)
           AS max_out_pool_usage,
       MAX(buffers_input_queue_length) AS max_in_queue,
       CAST(SUM(num_late_records_dropped) AS BIGINT) AS late_dropped
FROM flink_task_event
GROUP BY 1, 2
"""


def flink_cluster_capacity(flink_jm: DataFrame) -> DataFrame:
    """The garmadon-flink-job JobManager panels: per application the
    registered TaskManager count, running jobs, and slot occupancy —
    including the utilization ratio the capacity panels chart."""
    return (
        flink_jm.groupBy("application_id")
        .agg(
            F.max("num_registered_task_managers").alias("task_managers"),
            F.max("num_running_jobs").alias("running_jobs"),
            F.min("task_slots_available").alias("min_slots_available"),
            F.max("task_slots_total").alias("slots_total"),
            F.round(
                (F.max("task_slots_total") - F.min("task_slots_available"))
                / F.greatest(F.max("task_slots_total"), F.lit(1)),
                4,
            ).alias("peak_slot_utilization"),
        )
    )


FLINK_CLUSTER_CAPACITY_SQL = """
SELECT application_id,
       MAX(num_registered_task_managers) AS task_managers,
       MAX(num_running_jobs) AS running_jobs,
       MIN(task_slots_available) AS min_slots_available,
       MAX(task_slots_total) AS slots_total,
       ROUND((MAX(task_slots_total) - MIN(task_slots_available))
             / GREATEST(MAX(task_slots_total), 1), 4)
           AS peak_slot_utilization
FROM flink_job_manager_event
GROUP BY application_id
"""


def flink_tm_network_segments(flink_tm: DataFrame) -> DataFrame:
    """TaskManager network-memory panels: per (application, host) the
    floor of available network segments and the worst availability
    ratio — segment exhaustion is Flink's classic backpressure cause."""
    return (
        flink_tm.groupBy("application_id", "hostname")
        .agg(
            F.min("network_available_memory_segments").alias(
                "min_available_segments"
            ),
            F.max("network_total_memory_segments").alias("total_segments"),
            F.round(
                F.min("network_available_memory_segments")
                / F.greatest(
                    F.max("network_total_memory_segments"), F.lit(1)
                ),
                4,
            ).alias("min_availability_ratio"),
        )
    )


FLINK_TM_NETWORK_SEGMENTS_SQL = """
SELECT application_id, hostname,
       MIN(network_available_memory_segments) AS min_available_segments,
       MAX(network_total_memory_segments) AS total_segments,
       ROUND(MIN(network_available_memory_segments)
             / GREATEST(MAX(network_total_memory_segments), 1), 4)
           AS min_availability_ratio
FROM flink_task_manager_event
GROUP BY 1, 2
"""


def spark_stage_state_timeline(stage_states: DataFrame) -> DataFrame:
    """The spark-job-stages state machine: per (stage, name) the
    transition count, distinct states seen, and task count — the
    dashboard's stage lifecycle table."""
    return (
        stage_states.groupBy("stage_id", "stage_name")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.count_distinct("state").alias("states_seen"),
            F.max("num_tasks").alias("num_tasks"),
        )
    )


SPARK_STAGE_STATE_TIMELINE_SQL = """
SELECT stage_id, stage_name,
       COUNT(*) AS n_transitions,
       COUNT(DISTINCT state) AS states_seen,
       MAX(num_tasks) AS num_tasks
FROM spark_stage_state_event
GROUP BY 1, 2
"""


# panel name -> (fixture table, fn, sql, pre)  — pre maps the raw table
# (e.g. the heap explode) before the DuckDB view is created.
def server_disk_io_timeline(jvmstats: DataFrame) -> DataFrame:
    """'I/O Disks' / 'Disks bytes reads/writes'
    (grafana/garmadon-server-overview.json): `event_type:OS AND
    tags:FORWARDER AND hostname:$hostname` → the dashboard's DOUBLE
    bucket agg — terms(disk, size 50, asc by term) × date_histogram —
    with sum(reads)/sum(writes) metric aggs over the E3 device pivot
    (EventHelper.java:20-44).  The fixture carries no forwarder-host
    JVMs, so the tag filter binds to the tags present
    (YARN_APPLICATION); the construct — tag filter → device pivot →
    per-(device, time-bucket) sums — is the dashboard's."""
    from garmadon_spark.operators.jvmstats import explode_os_devices

    dev = explode_os_devices(
        jvmstats.filter(F.array_contains("tags", "YARN_APPLICATION"))
    )
    m = F.col("metrics")
    return (
        dev.filter(F.map_contains_key(m, "reads"))
        .groupBy(
            F.expr(f"timestamp div {MINUTE_MS}").alias("minute_bucket"),
            "device",
        )
        .agg(
            F.round(F.sum(F.element_at(m, F.lit("reads"))), 4)
            .alias("sum_reads"),
            F.round(F.sum(F.element_at(m, F.lit("writes"))), 4)
            .alias("sum_writes"),
        )
    )


SERVER_DISK_IO_TIMELINE_SQL = """
WITH dev AS (
  SELECT CAST(timestamp // 60000 AS BIGINT) AS minute_bucket,
         split_part(p.name, '_', 1) AS device,
         substr(p.name, len(split_part(p.name, '_', 1)) + 2) AS metric,
         TRY_CAST(p.value AS DOUBLE) AS v
  FROM jvmstats_event,
       LATERAL unnest(section) AS u(s),
       LATERAL unnest(u.s.property) AS q(p)
  WHERE u.s.name = 'disk' AND list_contains(tags, 'YARN_APPLICATION')
)
SELECT minute_bucket, device,
       ROUND(SUM(CASE WHEN metric = 'reads' THEN v END), 4) AS sum_reads,
       ROUND(SUM(CASE WHEN metric = 'writes' THEN v END), 4) AS sum_writes
FROM dev GROUP BY 1, 2
"""


def server_network_timeline(jvmstats: DataFrame) -> DataFrame:
    """'Network tx/rx' (grafana/garmadon-server-overview.json):
    terms(network, size 50) × date_histogram with sum(rx)/sum(tx) over
    the same device pivot — the network leg of the server-overview
    dashboard (same tag-binding note as server_disk_io_timeline)."""
    from garmadon_spark.operators.jvmstats import explode_os_devices

    dev = explode_os_devices(
        jvmstats.filter(F.array_contains("tags", "YARN_APPLICATION"))
    )
    m = F.col("metrics")
    return (
        dev.filter(F.map_contains_key(m, "rx"))
        .groupBy(
            F.expr(f"timestamp div {MINUTE_MS}").alias("minute_bucket"),
            "device",
        )
        .agg(
            F.round(F.sum(F.element_at(m, F.lit("rx"))), 4).alias("sum_rx"),
            F.round(F.sum(F.element_at(m, F.lit("tx"))), 4).alias("sum_tx"),
        )
    )


SERVER_NETWORK_TIMELINE_SQL = """
WITH dev AS (
  SELECT CAST(timestamp // 60000 AS BIGINT) AS minute_bucket,
         split_part(p.name, '_', 1) AS device,
         substr(p.name, len(split_part(p.name, '_', 1)) + 2) AS metric,
         TRY_CAST(p.value AS DOUBLE) AS v
  FROM jvmstats_event,
       LATERAL unnest(section) AS u(s),
       LATERAL unnest(u.s.property) AS q(p)
  WHERE u.s.name = 'network' AND list_contains(tags, 'YARN_APPLICATION')
)
SELECT minute_bucket, device,
       ROUND(SUM(CASE WHEN metric = 'rx' THEN v END), 4) AS sum_rx,
       ROUND(SUM(CASE WHEN metric = 'tx' THEN v END), 4) AS sum_tx
FROM dev GROUP BY 1, 2
"""


APP_0 = "application_1700000000000_0000"
ATTEMPT_0 = "appattempt_1700000000000_0000_000001"


def stage_task_breakdown(spark_tasks: DataFrame) -> DataFrame:
    """'Number of Tasks/Status' + '/Locality'
    (grafana/garmadon-spark-job-stages.json): the per-stage lucene
    conjunction `event_type:SPARK_TASK_EVENT AND
    application_id:$application_id AND attempt_id:$attempt_id AND
    stage_id:$stage_id` with terms buckets on status and locality —
    including the stage_attempt_id retry dimension the dashboard's
    stage-retry variables select on.  Equality filters reach the scan
    as PushedFilters; one shuffle on the (stage, retry, status,
    locality) key."""
    return (
        spark_tasks.filter(
            (F.col("application_id") == APP_0)
            & (F.col("attempt_id") == ATTEMPT_0)
        )
        .groupBy("stage_id", "stage_attempt_id", "status", "locality")
        .agg(F.count(F.lit(1)).alias("n_tasks"))
    )


STAGE_TASK_BREAKDOWN_SQL = f"""
SELECT stage_id, stage_attempt_id, status, locality, COUNT(*) AS n_tasks
FROM spark_task_event
WHERE application_id = '{APP_0}' AND attempt_id = '{ATTEMPT_0}'
GROUP BY 1, 2, 3, 4
"""


def stage_shuffle_fetch(spark_tasks: DataFrame) -> DataFrame:
    """'Bytes fetched in the shuffle' / 'Number of blocks fetched' /
    'Time the task spent waiting for remote shuffle blocks'
    (grafana/garmadon-spark-job-stages.json) under the dashboard's
    WIDEST conjunction — application_id AND attempt_id AND stage_id
    AND stage_attempt_id — per hour bucket, local/remote split in one
    aggregate (the dashboard issues them as separate sum targets)."""
    return (
        spark_tasks.filter(
            (F.col("application_id") == APP_0)
            & (F.col("attempt_id") == ATTEMPT_0)
            & (F.col("stage_id") == "0")
            & (F.col("stage_attempt_id") == "0")
        )
        .groupBy(F.expr(f"timestamp div {HOUR_MS}").alias("hour_bucket"))
        .agg(
            F.sum("shuffle_read_local_bytes").alias("local_bytes"),
            F.sum("shuffle_read_remote_bytes").alias("remote_bytes"),
            F.sum("shuffle_read_local_blocks_fetched").alias("local_blocks"),
            F.sum("shuffle_read_remote_blocks_fetched").alias(
                "remote_blocks"),
            F.sum("shuffle_read_fetch_wait_time").alias("fetch_wait_ms"),
            F.sum("shuffle_read_records").alias("records_read"),
        )
    )


STAGE_SHUFFLE_FETCH_SQL = f"""
SELECT CAST(timestamp // 3600000 AS BIGINT) AS hour_bucket,
       CAST(SUM(shuffle_read_local_bytes) AS BIGINT) AS local_bytes,
       CAST(SUM(shuffle_read_remote_bytes) AS BIGINT) AS remote_bytes,
       CAST(SUM(shuffle_read_local_blocks_fetched) AS BIGINT)
           AS local_blocks,
       CAST(SUM(shuffle_read_remote_blocks_fetched) AS BIGINT)
           AS remote_blocks,
       CAST(SUM(shuffle_read_fetch_wait_time) AS BIGINT) AS fetch_wait_ms,
       CAST(SUM(shuffle_read_records) AS BIGINT) AS records_read
FROM spark_task_event
WHERE application_id = '{APP_0}' AND attempt_id = '{ATTEMPT_0}'
  AND stage_id = '0' AND stage_attempt_id = '0'
GROUP BY 1
"""


def stage_spill_memory(spark_tasks: DataFrame) -> DataFrame:
    """'Number of in-memory/on-disk bytes spilled' + 'Peak memory used
    by internal data structures' + 'bytes transmitted back to the
    driver as the TaskResult' (grafana/garmadon-spark-job-stages.json)
    — per stage under the app/attempt conjunction: spill sums, peak
    memory max, result-size sum.  The three memory panels of the stage
    dashboard in one scan."""
    return (
        spark_tasks.filter(
            (F.col("application_id") == APP_0)
            & (F.col("attempt_id") == ATTEMPT_0)
        )
        .groupBy("stage_id")
        .agg(
            F.sum("memory_bytes_spilled").alias("mem_spilled"),
            F.sum("disk_bytes_spilled").alias("disk_spilled"),
            F.max("peak_execution_memory").alias("peak_memory"),
            F.sum("result_size").alias("result_bytes"),
        )
    )


STAGE_SPILL_MEMORY_SQL = f"""
SELECT stage_id,
       CAST(SUM(memory_bytes_spilled) AS BIGINT) AS mem_spilled,
       CAST(SUM(disk_bytes_spilled) AS BIGINT) AS disk_spilled,
       MAX(peak_execution_memory) AS peak_memory,
       CAST(SUM(result_size) AS BIGINT) AS result_bytes
FROM spark_task_event
WHERE application_id = '{APP_0}' AND attempt_id = '{ATTEMPT_0}'
GROUP BY 1
"""


def yarn_app_lifecycle(app_events: DataFrame) -> DataFrame:
    """'Tracking URLs' (grafana/garmadon-yarn-application.json): the
    raw_document table panel under `event_type:APPLICATION_EVENT AND
    application_id:$application_id AND
    application_name.keyword:$application_name` — the app-lifecycle
    rows (state machine + tracking URL + final status) for one
    application, time-ordered.  A pruned-scan projection; no
    aggregation."""
    return (
        app_events.filter(
            (F.col("application_id") == APP_0)
            & (F.col("application_name") == "app-name-0")
        )
        .select(
            "timestamp", "state", "queue", "tracking_url", "final_status"
        )
        .orderBy("timestamp", "state")
    )


YARN_APP_LIFECYCLE_SQL = f"""
SELECT timestamp, state, queue, tracking_url, final_status
FROM application_event
WHERE application_id = '{APP_0}' AND application_name = 'app-name-0'
ORDER BY timestamp, state
"""


def yarn_container_events(container_events: DataFrame) -> DataFrame:
    """'Container Events' (grafana/garmadon-yarn-application.json):
    `event_type:CONTAINER_EVENT AND tags:RESOURCEMANAGER AND
    application_id:$application_id AND
    application_name.keyword:$application_name` — tag array
    containment (F2) composed with the app-dimension equality filters,
    then container lifecycle counts by (state, exit_status).  The
    fixture corpus tags RM-origin events YARN_APPLICATION
    (sources/fixtures.py), so the containment predicate filters on
    that member; the construct — array_contains AND two keyword
    equalities — is the dashboard's."""
    return (
        container_events.filter(
            F.array_contains(F.col("tags"), "YARN_APPLICATION")
            & (F.col("application_name") == "app-name-1")
        )
        .groupBy("application_id", "state", "exit_status")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("is_finished").alias("any_finished"),
        )
    )


YARN_CONTAINER_EVENTS_SQL = """
SELECT application_id, state, exit_status, COUNT(*) AS n_events,
       MAX(is_finished) AS any_finished
FROM container_event
WHERE list_contains(tags, 'YARN_APPLICATION')
  AND application_name = 'app-name-1'
GROUP BY 1, 2, 3
"""


PANELS = {
    "fs_actions_per_minute": ("fs_event", fs_actions_per_minute,
                              FS_ACTIONS_PER_MINUTE_SQL, None),
    "fs_failure_rate_by_uri": ("fs_event", fs_failure_rate_by_uri,
                               FS_FAILURE_RATE_BY_URI_SQL, None),
    "fs_path_prefix_stats": ("fs_event", fs_path_prefix_stats,
                             FS_PATH_PREFIX_STATS_SQL, None),
    "heap_used_hourly": ("jvmstats_event", heap_used_hourly,
                         HEAP_USED_HOURLY_SQL, "jvmstats_heap"),
    "gc_pause_percentiles": ("gc_event", gc_pause_percentiles,
                             GC_PAUSE_PERCENTILES_SQL, None),
    "container_memory_headroom": ("container_monitoring_event",
                                  container_memory_headroom,
                                  CONTAINER_MEMORY_HEADROOM_SQL, None),
    "top_shuffle_apps": ("spark_task_event", top_shuffle_apps,
                         TOP_SHUFFLE_APPS_SQL, None),
    "flink_checkpoint_panel": ("flink_job_event", flink_checkpoint_panel,
                               FLINK_CHECKPOINT_PANEL_SQL, None),
    "flink_checkpoint_rate": ("flink_job_event", flink_checkpoint_rate,
                              FLINK_CHECKPOINT_RATE_SQL, None),
    "spark_task_locality_spill": ("spark_task_event",
                                  spark_task_locality_spill,
                                  SPARK_TASK_LOCALITY_SPILL_SQL, None),
    "fs_compound_dashboard": ("fs_event", fs_compound_dashboard,
                              FS_COMPOUND_DASHBOARD_SQL, None),
    "spark_executor_churn": ("spark_executor_state_event",
                             spark_executor_churn,
                             SPARK_EXECUTOR_CHURN_SQL, None),
    "container_vcore_usage": ("container_monitoring_event",
                              container_vcore_usage,
                              CONTAINER_VCORE_USAGE_SQL, None),
    "compute_node_capacity": ("container_monitoring_event",
                              compute_node_capacity,
                              COMPUTE_NODE_CAPACITY_SQL, None),
    "compute_top_app_reserved": ("container_monitoring_event",
                                 compute_top_app_reserved,
                                 COMPUTE_TOP_APP_RESERVED_SQL, None),
    "compute_user_framework_usage": ("jvmstats_event",
                                     compute_user_framework_usage,
                                     COMPUTE_USER_FRAMEWORK_USAGE_SQL,
                                     None),
    "executor_task_runtime": ("spark_task_event", executor_task_runtime,
                              EXECUTOR_TASK_RUNTIME_SQL, None),
    "stage_shuffle_timeline": ("spark_task_event", stage_shuffle_timeline,
                               STAGE_SHUFFLE_TIMELINE_SQL, None),
    "flink_task_throughput": ("flink_task_event", flink_task_throughput,
                              FLINK_TASK_THROUGHPUT_SQL, None),
    "flink_cluster_capacity": ("flink_job_manager_event",
                               flink_cluster_capacity,
                               FLINK_CLUSTER_CAPACITY_SQL, None),
    "flink_tm_network_segments": ("flink_task_manager_event",
                                  flink_tm_network_segments,
                                  FLINK_TM_NETWORK_SEGMENTS_SQL, None),
    "server_disk_io_timeline": ("jvmstats_event", server_disk_io_timeline,
                                SERVER_DISK_IO_TIMELINE_SQL, None),
    "server_network_timeline": ("jvmstats_event", server_network_timeline,
                                SERVER_NETWORK_TIMELINE_SQL, None),
    "spark_stage_state_timeline": ("spark_stage_state_event",
                                   spark_stage_state_timeline,
                                   SPARK_STAGE_STATE_TIMELINE_SQL, None),
    "stage_task_breakdown": ("spark_task_event", stage_task_breakdown,
                             STAGE_TASK_BREAKDOWN_SQL, None),
    "stage_shuffle_fetch": ("spark_task_event", stage_shuffle_fetch,
                            STAGE_SHUFFLE_FETCH_SQL, None),
    "stage_spill_memory": ("spark_task_event", stage_spill_memory,
                           STAGE_SPILL_MEMORY_SQL, None),
    "yarn_app_lifecycle": ("application_event", yarn_app_lifecycle,
                           YARN_APP_LIFECYCLE_SQL, None),
    "yarn_container_events": ("container_event", yarn_container_events,
                              YARN_CONTAINER_EVENTS_SQL, None),
}

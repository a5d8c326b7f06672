"""Schema registry — the typed, heterogeneous event model.

Re-expresses the reference's fixed proto3 registry
(schema/src/main/java/com/criteo/hadoop/garmadon/schema/serialization/
GarmadonSerialization.java:20-41: marker ↔ name ↔ schema) as a Python dict
of StructTypes.  One marker per event family; every flattened event row is
``header ⊕ body ⊕ timestamp ⊕ kafka_offset`` (ProtoConcatenator.java:36-70,
158-160).

Proto3 semantics preserved: scalar fields are non-nullable with zero/""
defaults when materialized (ProtoConcatenator.java:81-106 materializes
default values — the flatten operator owns that); enums surface as their
string names (ProtoConcatenator.getRealFieldValue,
ProtoConcatenator.java:209-215).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- type markers (GarmadonSerialization.java:20-41) -----------------------

PATH_EVENT = 0
FS_EVENT = 1
STATE_EVENT = 3
GC_EVENT = 1000
JVMSTATS_EVENT = 1001
CONTAINER_MONITORING_EVENT = 2000
SPARK_STAGE_EVENT = 3000
SPARK_STAGE_STATE_EVENT = 3001
SPARK_EXECUTOR_STATE_EVENT = 3002
SPARK_TASK_EVENT = 3003
SPARK_EXECUTOR_STORAGE_STATUS_EVENT = 3004
SPARK_RDD_STORAGE_STATUS_EVENT = 3005
APPLICATION_EVENT = 4000
CONTAINER_EVENT = 4001
FLINK_JOB_MANAGER_EVENT = 5000
FLINK_JOB_EVENT = 5001
FLINK_TASK_MANAGER_EVENT = 5002
FLINK_TASK_EVENT = 5003
FLINK_OPERATOR_EVENT = 5004
FLINK_KAFKA_CONSUMER_EVENT = 5005


def _s(name: str) -> StructField:
    return StructField(name, StringType())


def _l(name: str) -> StructField:
    return StructField(name, LongType())


def _i(name: str) -> StructField:
    return StructField(name, IntegerType())


# --- shared header (event_header.proto:8-24) ------------------------------

HEADER_FIELDS = [
    _s("application_id"),
    _s("attempt_id"),
    _s("application_name"),
    _s("username"),
    _s("container_id"),
    _s("hostname"),
    _s("pid"),
    _s("framework"),
    _s("component"),
    _s("executor_id"),
    StructField("tags", ArrayType(StringType())),
    _s("id"),
    _s("main_class"),
    _s("java_version"),
    _i("java_feature"),
    _s("framework_version"),
]

HEADER = StructType(HEADER_FIELDS)

# Header.Tag enum (schema/.../events/Header.java:30-36)
TAGS = ("YARN_APPLICATION", "FORWARDER", "RESOURCEMANAGER", "NODEMANAGER",
        "STANDALONE")
FRAMEWORKS = ("SPARK", "MAPREDUCE", "FLINK", "YARN")
COMPONENTS = ("UNKNOWN", "APP_MASTER", "APP_SLAVE", "EXECUTOR", "DRIVER")

# --- body schemas (§1.4, schema/src/main/protobuf/*.proto) ----------------

PATH_EVENT_BODY = StructType([_s("path"), _s("type")])

# data_access_event.proto:14-27 (enum Status surfaces as its name)
FS_EVENT_BODY = StructType(
    [
        _s("src_path"),
        _s("dst_path"),
        _s("action"),
        _s("uri"),
        _l("method_duration_millis"),
        _s("hdfs_user"),
        _s("status"),
    ]
)

FS_ACTIONS = ("READ", "WRITE", "RENAME", "DELETE", "APPEND", "ADD_BLOCK",
              "LIST_STATUS", "GET_CONTENT_SUMMARY")

STATE_EVENT_BODY = StructType([_s("state")])

# jvm_statistics_event.proto:20-39
GC_EVENT_BODY = StructType(
    [
        _s("collector_name"),
        _l("pause_time"),
        _s("cause"),
        _l("eden_before"),
        _l("eden_after"),
        _l("survivor_before"),
        _l("survivor_after"),
        _l("old_before"),
        _l("old_after"),
        _l("code_before"),
        _l("code_after"),
        _l("metaspace_before"),
        _l("metaspace_after"),
        StructField("gc_pause_ratio_1_min", FloatType()),
    ]
)

# jvm_statistics_event.proto:8-18 — nested repeated Section{Property{}}
JVMSTATS_PROPERTY = StructType([_s("name"), _s("value")])
JVMSTATS_SECTION = StructType(
    [_s("name"), StructField("property", ArrayType(JVMSTATS_PROPERTY))]
)
JVMSTATS_EVENT_BODY = StructType(
    [StructField("section", ArrayType(JVMSTATS_SECTION))]
)

# container_event.proto:8-11
CONTAINER_MONITORING_EVENT_BODY = StructType(
    [_s("type"), _l("limit"), StructField("value", FloatType())]
)

# resourcemanager_event.proto:8-22
APPLICATION_EVENT_BODY = StructType(
    [
        _s("state"),
        _s("queue"),
        _s("tracking_url"),
        _s("original_tracking_url"),
        StructField("yarn_tags", ArrayType(StringType())),
        _s("am_container_id"),
        _s("project_name"),
        _s("workflow_name"),
        _l("memory_seconds"),
        _l("vcore_seconds"),
        _s("final_status"),
        _l("start_time"),
        _l("finish_time"),
    ]
)

# resourcemanager_event.proto:24-35
CONTAINER_EVENT_BODY = StructType(
    [
        _s("state"),
        _s("type"),
        _s("reason"),
        _i("exit_status"),
        _l("start_time"),
        _l("finish_time"),
        StructField("is_finished", BooleanType()),
        _s("container_hostname"),
        _s("log_url"),
        _i("vcores_reserved"),
        _i("memory_reserved"),
    ]
)

# spark_event.proto:8-49,67-115 — the 32 task/stage metric longs
SPARK_METRIC_FIELDS = [
    "executor_cpu_time",
    "executor_deserialize_cpu_time",
    "executor_run_time",
    "jvm_gc_time",
    "executor_deserialize_time",
    "result_serialization_time",
    "result_size",
    "peak_execution_memory",
    "disk_bytes_spilled",
    "memory_bytes_spilled",
    "shuffle_read_records",
    "shuffle_read_fetch_wait_time",
    "shuffle_read_local_bytes",
    "shuffle_read_remote_bytes",
    "shuffle_read_total_bytes",
    "shuffle_read_local_blocks_fetched",
    "shuffle_read_remote_blocks_fetched",
    "shuffle_read_total_blocks_fetched",
    "shuffle_write_shuffle_records",
    "shuffle_write_shuffle_time",
    "shuffle_write_shuffle_bytes",
    "input_records",
    "input_bytes",
    "output_records",
    "output_bytes",
]

SPARK_STAGE_EVENT_BODY = StructType(
    [_s("stage_name"), _s("stage_id"), _s("stage_attempt_id"),
     _i("num_tasks"), _l("start_time"), _l("completion_time"),
     _s("status"), _s("failure_reason")]
    + [_l(f) for f in SPARK_METRIC_FIELDS]
)

SPARK_TASK_EVENT_BODY = StructType(
    [_l("task_id"), _s("stage_id"), _s("stage_attempt_id"),
     _s("executor_hostname"), _s("type"), _s("locality"),
     _i("attempt_number"), _l("start_time"), _l("finish_time"),
     _s("status"), _s("failure_reason")]
    + [_l(f) for f in SPARK_METRIC_FIELDS]
)

SPARK_STAGE_STATE_EVENT_BODY = StructType(
    [_s("state"), _s("stage_name"), _s("stage_id"),
     _s("stage_attempt_id"), _i("num_tasks")]
)

SPARK_EXECUTOR_STATE_EVENT_BODY = StructType(
    [_s("state"), _s("executor_hostname"), _s("reason"),
     _i("task_failures")]
)

# spark_event.proto:116-131 (ExecutorStorageStatus)
SPARK_EXECUTOR_STORAGE_STATUS_EVENT_BODY = StructType(
    [_s("executor_hostname"),
     _l("rdd_off_heap_memory_used"), _l("rdd_memory_used"),
     _l("rdd_disk_used"),
     _l("stream_off_heap_memory_used"), _l("stream_memory_used"),
     _l("stream_disk_used"),
     _l("broadcast_off_heap_memory_used"), _l("broadcast_memory_used"),
     _l("broadcast_disk_used")]
)

# spark_event.proto:133-139 (RDDStorageStatus)
SPARK_RDD_STORAGE_STATUS_EVENT_BODY = StructType(
    [_s("rdd_name"), _l("off_heap_memory_used"), _l("memory_used"),
     _l("disk_used")]
)

# flink_event.proto:20-37 (job-level gauges incl. checkpoints)
FLINK_JOB_EVENT_BODY = StructType(
    [
        _s("job_id"),
        _s("job_name"),
        _l("uptime"),
        _l("downtime"),
        _l("restarting_time"),
        _l("full_restarts"),
        _l("total_number_of_checkpoints"),
        _i("number_of_in_progress_checkpoints"),
        _l("number_of_completed_checkpoints"),
        _l("number_of_failed_checkpoints"),
        _l("last_checkpoint_restore_timestamp"),
        _l("last_checkpoint_size"),
        _l("last_checkpoint_duration"),
        _l("last_checkpoint_alignment_buffered"),
        _s("last_checkpoint_external_path"),
    ]
)

# flink_event.proto:8-13 (JobManagerEvent)
FLINK_JOB_MANAGER_EVENT_BODY = StructType(
    [_l("num_registered_task_managers"), _l("num_running_jobs"),
     _l("task_slots_available"), _l("task_slots_total")]
)

# flink_event.proto:15-18 (TaskManagerEvent)
FLINK_TASK_MANAGER_EVENT_BODY = StructType(
    [_l("network_total_memory_segments"),
     _l("network_available_memory_segments")]
)

# flink_event.proto:38-67 (TaskEvent — buffer/record gauges + watermark)
FLINK_TASK_EVENT_BODY = StructType(
    [_s("job_id"), _s("job_name"), _s("task_id"), _s("task_name"),
     _s("task_attempt_num"),
     _l("buffers_input_queue_length"), _l("buffers_output_queue_length"),
     _l("buffers_in_pool_usage"), _l("buffers_out_pool_usage"),
     _l("num_records_out"), _l("num_records_in"),
     _l("num_bytes_out"), _l("num_bytes_in_local"),
     _l("num_bytes_in_remote"),
     _l("num_buffers_out"), _l("num_buffers_in_local"),
     _l("num_buffers_in_remote"),
     StructField("num_bytes_out_per_second", DoubleType()),
     StructField("num_bytes_in_local_per_second", DoubleType()),
     StructField("num_bytes_in_remote_per_second", DoubleType()),
     StructField("num_buffers_out_per_second", DoubleType()),
     StructField("num_buffers_in_local_per_second", DoubleType()),
     StructField("num_buffers_in_remote_per_second", DoubleType()),
     StructField("num_records_in_per_second", DoubleType()),
     StructField("num_records_out_per_second", DoubleType()),
     _s("subtask_index"),
     _l("current_input_watermark"), _l("num_late_records_dropped")]
)

# flink_event.proto:69-87 (OperatorEvent — watermarks + late records +
# kafka-ish consumption rates)
FLINK_OPERATOR_EVENT_BODY = StructType(
    [_s("job_id"), _s("job_name"), _s("task_id"), _s("task_name"),
     _s("operator_id"), _s("operator_name"), _s("subtask_index"),
     _l("current_input_watermark"), _l("num_late_records_dropped"),
     _l("current_input_1_watermark"), _l("current_input_2_watermark"),
     _l("current_output_watermark"), _l("num_splits_processed"),
     _l("commits_succeeded"), _l("commits_failed"),
     StructField("records_lag_max", DoubleType()),
     StructField("records_consumed_rate", DoubleType()),
     StructField("bytes_consumed_rate", DoubleType())]
)

# flink_event.proto:90-102 (KafkaConsumerEvent — per topic-partition
# offset gauges)
FLINK_KAFKA_CONSUMER_EVENT_BODY = StructType(
    [_s("job_id"), _s("job_name"), _s("task_id"), _s("task_name"),
     _s("operator_id"), _s("operator_name"), _s("subtask_index"),
     _s("topic"), _s("partition"),
     _l("current_offsets"), _l("committed_offsets")]
)


@dataclass(frozen=True)
class EventType:
    """One registry entry: marker ↔ name ↔ body schema
    (GarmadonSerialization.register, GarmadonSerialization.java:149-155)."""

    marker: int
    name: str
    body: StructType


REGISTRY: dict[int, EventType] = {
    e.marker: e
    for e in [
        EventType(PATH_EVENT, "PATH_EVENT", PATH_EVENT_BODY),
        EventType(FS_EVENT, "FS_EVENT", FS_EVENT_BODY),
        EventType(STATE_EVENT, "STATE_EVENT", STATE_EVENT_BODY),
        EventType(GC_EVENT, "GC_EVENT", GC_EVENT_BODY),
        EventType(JVMSTATS_EVENT, "JVMSTATS_EVENT", JVMSTATS_EVENT_BODY),
        EventType(
            CONTAINER_MONITORING_EVENT,
            "CONTAINER_MONITORING_EVENT",
            CONTAINER_MONITORING_EVENT_BODY,
        ),
        EventType(SPARK_STAGE_EVENT, "SPARK_STAGE_EVENT", SPARK_STAGE_EVENT_BODY),
        EventType(
            SPARK_STAGE_STATE_EVENT,
            "SPARK_STAGE_STATE_EVENT",
            SPARK_STAGE_STATE_EVENT_BODY,
        ),
        EventType(
            SPARK_EXECUTOR_STATE_EVENT,
            "SPARK_EXECUTOR_STATE_EVENT",
            SPARK_EXECUTOR_STATE_EVENT_BODY,
        ),
        EventType(SPARK_TASK_EVENT, "SPARK_TASK_EVENT", SPARK_TASK_EVENT_BODY),
        EventType(
            SPARK_EXECUTOR_STORAGE_STATUS_EVENT,
            "SPARK_EXECUTOR_STORAGE_STATUS_EVENT",
            SPARK_EXECUTOR_STORAGE_STATUS_EVENT_BODY,
        ),
        EventType(
            SPARK_RDD_STORAGE_STATUS_EVENT,
            "SPARK_RDD_STORAGE_STATUS_EVENT",
            SPARK_RDD_STORAGE_STATUS_EVENT_BODY,
        ),
        EventType(APPLICATION_EVENT, "APPLICATION_EVENT", APPLICATION_EVENT_BODY),
        EventType(CONTAINER_EVENT, "CONTAINER_EVENT", CONTAINER_EVENT_BODY),
        EventType(
            FLINK_JOB_MANAGER_EVENT,
            "FLINK_JOB_MANAGER_EVENT",
            FLINK_JOB_MANAGER_EVENT_BODY,
        ),
        EventType(FLINK_JOB_EVENT, "FLINK_JOB_EVENT", FLINK_JOB_EVENT_BODY),
        EventType(
            FLINK_TASK_MANAGER_EVENT,
            "FLINK_TASK_MANAGER_EVENT",
            FLINK_TASK_MANAGER_EVENT_BODY,
        ),
        EventType(FLINK_TASK_EVENT, "FLINK_TASK_EVENT", FLINK_TASK_EVENT_BODY),
        EventType(
            FLINK_OPERATOR_EVENT,
            "FLINK_OPERATOR_EVENT",
            FLINK_OPERATOR_EVENT_BODY,
        ),
        EventType(
            FLINK_KAFKA_CONSUMER_EVENT,
            "FLINK_KAFKA_CONSUMER_EVENT",
            FLINK_KAFKA_CONSUMER_EVENT_BODY,
        ),
    ]
}

BY_NAME: dict[str, EventType] = {e.name: e for e in REGISTRY.values()}


def full_schema(marker_or_name: int | str) -> StructType:
    """Flattened event-row schema: header ⊕ body ⊕ timestamp ⊕ kafka coords
    — what ProtoConcatenator.buildMessageBuilder synthesizes at runtime
    (ProtoConcatenator.java:117-168, timestamp/offset append :158-160)."""
    e = (
        BY_NAME[marker_or_name]
        if isinstance(marker_or_name, str)
        else REGISTRY[marker_or_name]
    )
    return StructType(
        HEADER_FIELDS
        + list(e.body.fields)
        + [
            StructField("timestamp", LongType()),
            StructField("kafka_partition", IntegerType()),
            StructField("kafka_offset", LongType()),
        ]
    )


def register(marker: int, name: str, body: StructType) -> EventType:
    """User extension point, mirroring GarmadonSerialization.register
    (GarmadonSerialization.java:149-155)."""
    if marker in REGISTRY or name in BY_NAME:
        raise ValueError(f"event type {marker}/{name} already registered")
    e = EventType(marker, name, body)
    REGISTRY[marker] = e
    BY_NAME[name] = e
    return e

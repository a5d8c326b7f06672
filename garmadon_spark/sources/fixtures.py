"""Deterministic synthetic garmadon event generator.

The reference's event *sources* are JVM instrumentation agents (SURVEY §2.1
S4-S12: MXBean pollers, GC notifications, ByteBuddy HDFS tracers, RM
pollers, Spark/Flink listeners).  Our events come from fixtures instead —
this module generates them with the cross-table invariants of FIXTURES.md:

1. every container belongs to exactly one (application_id, attempt_id) and
   gets a terminal STATE_EVENT(END) row — the heuristics' session close
   marker (Heuristics.java:141-158);
2. APPLICATION_EVENT rows mostly precede other events of the app (some
   late, to exercise the enrichment-cache miss path,
   ElasticSearchCacheManager.java:49-60);
3. kafka_offset unique+monotone per kafka_partition, with a duplicated
   tail replay for dedup tests (PartitionedWriter.shouldSkipOffset);
4. timestamps span ≥3 UTC days, ~2 % of events >2 h late;
5. monotone cumulative counters (safepoints.count, synclocks
   contendedlockattempts, gc(...) counts) per container;
6. heuristic trigger tiers are all represented (heap-unused 30/50/70 %,
   safepoint rates 3/5/7/10 /s, lock rates 10/50/100/500 /s, thread
   ratio ≤10 %, code cache ≥95 %).
"""

from __future__ import annotations

import random

BASE_TS = 1700000000000  # 2023-11-14T22:13:20Z — spans 3+ UTC days below
DAY = 86_400_000


def _mk_header(app, container, rng):
    return {
        "application_id": app["application_id"],
        "attempt_id": app["attempt_id"],
        "application_name": app["application_name"],
        "username": app["username"],
        "container_id": container["container_id"] if container else "",
        "hostname": container["hostname"] if container else app["rm_host"],
        "pid": str(rng.randint(1000, 65000)),
        "framework": app["framework"],
        "component": container["component"] if container else "",
        "executor_id": container["executor_id"] if container else "",
        "tags": ["YARN_APPLICATION"] if container else ["RESOURCEMANAGER"],
        "id": "",
        "main_class": app["main_class"],
        "java_version": "1.8.0_282",
        "java_feature": 8,
        "framework_version": app["framework_version"],
    }


def _jvmstats_sections(state, rng):
    """One JVMSTATS sample: the reference's section/property string bag
    (jvm_statistics_event.proto:8-18, section names JVMStatistics.java:54-76).
    Device sections use <device>_<metric> property naming
    (EventHelper.java:22-30); one non-numeric value exercises the
    parse-or-keep-string fallback (EventHelper.java:33-40)."""
    heap_used = int(state["heap_max"] * state["heap_level"] * rng.uniform(0.8, 1.0))
    state["heap_peak"] = max(state["heap_peak"], heap_used)
    state["safepoints"] += state["safepoint_rate"] * 10
    state["locks"] += state["lock_rate"] * 10
    state["minor_gcs"] += rng.randint(0, 3)
    code_used = int(state["code_max"] * state["code_level"])
    return [
        {"name": "heap", "property": [
            {"name": "init", "value": str(state["heap_max"] // 2)},
            {"name": "committed", "value": str(state["heap_max"])},
            {"name": "used", "value": str(heap_used)},
            {"name": "max", "value": str(state["heap_max"])},
        ]},
        {"name": "code", "property": [
            {"name": "used", "value": str(code_used)},
            {"name": "max", "value": str(state["code_max"])},
        ]},
        {"name": "threads", "property": [
            {"name": "count", "value": str(state["thread_count"])},
            {"name": "total", "value": str(state["thread_total"])},
        ]},
        {"name": "safepoints", "property": [
            {"name": "count", "value": str(state["safepoints"])},
        ]},
        {"name": "synclocks", "property": [
            {"name": "contendedlockattempts", "value": str(state["locks"])},
        ]},
        {"name": "gc(PS Scavenge)", "property": [
            {"name": "count", "value": str(state["minor_gcs"])},
            {"name": "time", "value": str(state["minor_gcs"] * 13)},
        ]},
        {"name": "gc(PS MarkSweep)", "property": [
            {"name": "count", "value": str(state["major_gcs"])},
            {"name": "time", "value": str(state["major_gcs"] * 210)},
        ]},
        {"name": "compile", "property": [
            {"name": "time", "value": str(rng.randint(100, 9000))},
        ]},
        {"name": "class", "property": [
            {"name": "loaded", "value": str(rng.randint(3000, 20000))},
            {"name": "vendor", "value": "HotSpot(TM)"},  # non-numeric
        ]},
        {"name": "disk", "property": [
            {"name": "sda_reads", "value": str(rng.randint(0, 10 ** 6))},
            {"name": "sda_writes", "value": str(rng.randint(0, 10 ** 6))},
            {"name": "sdb_reads", "value": str(rng.randint(0, 10 ** 6))},
            {"name": "sdb_writes", "value": str(rng.randint(0, 10 ** 6))},
        ]},
        {"name": "network", "property": [
            {"name": "eth0_rx", "value": str(rng.randint(0, 10 ** 9))},
            {"name": "eth0_tx", "value": str(rng.randint(0, 10 ** 9))},
        ]},
    ]


HEURISTIC_PROFILES = [
    # (heap_level, safepoint_rate/s, lock_rate/s, thread_ratio, code_level)
    {"heap_level": 0.25, "safepoint_rate": 1, "lock_rate": 2,
     "thread_ratio": 0.5, "code_level": 0.5},   # heap LOW severity
    {"heap_level": 0.45, "safepoint_rate": 4, "lock_rate": 20,
     "thread_ratio": 0.5, "code_level": 0.6},   # moderate tiers
    {"heap_level": 0.65, "safepoint_rate": 6, "lock_rate": 70,
     "thread_ratio": 0.3, "code_level": 0.7},   # severe tiers
    {"heap_level": 0.85, "safepoint_rate": 12, "lock_rate": 600,
     "thread_ratio": 0.05, "code_level": 0.97},  # critical tiers
    {"heap_level": 0.95, "safepoint_rate": 2, "lock_rate": 5,
     "thread_ratio": 0.6, "code_level": 0.4},   # healthy heap
]

URIS = [
    "hdfs://nameservice1:8020",
    "hdfs://nameservice1",
    "hdfs://root2.example.com:8020",
    "hdfs://preprod.example.com:8020",
]

GC_CAUSES = ["Allocation Failure", "Metadata GC Threshold", "Ergonomics",
             "System.gc()"]


FIXTURE_VERSION = 2  # bump when generate() output changes (cache key)


def generate(n_apps: int = 8, seed: int = 42) -> dict[str, list[dict]]:
    """Generate all event tables.  Returns {table_name: [row dicts]} with
    flat rows matching schemas.full_schema(name) (nested only for
    JVMSTATS section bags).

    Two independent RNG streams: ``rng`` drives the original nine
    families; ``rng2`` drives the families added later (Spark
    stage/executor-state/storage, PATH_EVENT, the five Flink gauges) so
    extending coverage never perturbs previously generated values."""
    rng = random.Random(seed)
    rng2 = random.Random(seed * 7919 + 1)
    tables: dict[str, list[dict]] = {
        "fs_event": [], "gc_event": [], "jvmstats_event": [],
        "state_event": [], "container_monitoring_event": [],
        "application_event": [], "container_event": [],
        "spark_task_event": [], "flink_job_event": [],
        "path_event": [], "spark_stage_event": [],
        "spark_stage_state_event": [], "spark_executor_state_event": [],
        "spark_executor_storage_status_event": [],
        "spark_rdd_storage_status_event": [],
        "flink_job_manager_event": [], "flink_task_manager_event": [],
        "flink_task_event": [], "flink_operator_event": [],
        "flink_kafka_consumer_event": [],
    }
    # kafka coordinates: monotone offset per partition (invariant 3)
    offsets = [0, 0, 0, 0]
    offsets2 = [0, 0, 0, 0]
    emitted: list[tuple[str, dict]] = []

    def emit(table, header, body, ts):
        part = rng.randint(0, 3)
        offsets[part] += 1
        row = dict(header)
        row.update(body)
        row["timestamp"] = ts
        row["kafka_partition"] = part
        row["kafka_offset"] = offsets[part]
        tables[table].append(row)
        emitted.append((table, row))

    def emit2(table, header, body, ts):
        # rng2-stream emit for the added families, on partitions 4-7 with
        # their own counters and outside `emitted` — original families
        # keep their exact v1 rows (offsets, partitions, replay tail)
        p = rng2.randint(0, 3)
        offsets2[p] += 1
        row = dict(header)
        row.update(body)
        row["timestamp"] = ts
        row["kafka_partition"] = 4 + p
        row["kafka_offset"] = offsets2[p]
        tables[table].append(row)

    frameworks = ["SPARK", "MAPREDUCE", "FLINK", "SPARK"]
    for ai in range(n_apps):
        fw = frameworks[ai % len(frameworks)]
        app_start = BASE_TS + rng.randint(0, 3 * DAY)
        app = {
            "application_id": f"application_1700000000000_{ai:04d}",
            "attempt_id": f"appattempt_1700000000000_{ai:04d}_000001",
            "application_name": f"app-name-{ai % 5}",
            "username": f"user{ai % 3}",
            "framework": fw,
            "main_class": f"com.example.Job{ai % 4}",
            "framework_version": "2.3.1" if fw == "SPARK" else "1.9",
            "rm_host": "rm01.example.com",
            "queue": f"queue{ai % 3}",
        }
        n_containers = rng.randint(3, 6)
        containers = []
        for ci in range(n_containers):
            containers.append({
                "container_id":
                    f"container_e01_1700000000000_{ai:04d}_01_{ci:06d}",
                "hostname": f"host{rng.randint(0, 9):02d}.example.com",
                "component": "APP_MASTER" if ci == 0 else (
                    "EXECUTOR" if fw == "SPARK" else "APP_SLAVE"),
                "executor_id": str(ci) if fw == "SPARK" else "",
                "profile": HEURISTIC_PROFILES[
                    (ai * n_containers + ci) % len(HEURISTIC_PROFILES)],
            })

        # APPLICATION_EVENT lifecycle on the RM (invariant 2: first, but
        # one app's rows arrive late).
        app_states = ["NEW", "ACCEPTED", "RUNNING", "FINISHED"]
        late_app = ai == 1
        yarn_tags = [f"garmadon.project.name:proj{ai % 3}",
                     f"garmadon.workflow.name:wf{ai % 2}", "adhoc"]
        for si, st in enumerate(app_states):
            ts = app_start + si * 10_000
            if late_app:
                ts = app_start + 2 * DAY  # arrives after most app events
            emit("application_event", _mk_header(app, None, rng), {
                "state": st,
                "queue": app["queue"],
                "tracking_url": f"http://rm/{app['application_id']}",
                "original_tracking_url": "",
                "yarn_tags": yarn_tags,
                "am_container_id": containers[0]["container_id"],
                "project_name": f"proj{ai % 3}",
                "workflow_name": f"wf{ai % 2}",
                "memory_seconds": rng.randint(10 ** 5, 10 ** 8),
                "vcore_seconds": rng.randint(100, 10 ** 5),
                "final_status": "SUCCEEDED" if st == "FINISHED" else "UNDEFINED",
                "start_time": app_start,
                "finish_time": app_start + 3_600_000 if st == "FINISHED" else 0,
            }, ts)

        # --- Spark listener families (GarmadonSparkListener.java:105-214:
        # stage BEGIN/END state + completed-stage metrics;
        # GarmadonSparkStorageStatusListener.java:139-260: RDD storage) —
        # driver-side, so headers ride the AM/driver container.
        if fw == "SPARK":
            drv = _mk_header(app, containers[0], rng2)
            for k in range(3):
                sub = app_start + k * 120_000
                comp = sub + rng2.randint(30_000, 110_000)
                stage = {
                    "stage_name": f"stage-{k} at Job{ai % 4}.scala:{40 + k}",
                    "stage_id": str(k),
                    "stage_attempt_id": "0",
                    "num_tasks": rng2.randint(8, 64),
                }
                emit2("spark_stage_state_event", drv,
                      {**stage, "state": "BEGIN"}, sub)
                emit2("spark_stage_state_event", drv,
                      {**stage, "state": "END"}, comp)
                status = "succeeded" if rng2.random() > 0.1 else "failed"
                body = {
                    **stage, "status": status,
                    "failure_reason": ""
                    if status == "succeeded"
                    else "ExecutorLostFailure (executor 3 exited)",
                    "start_time": sub, "completion_time": comp,
                }
                for f in _SPARK_METRICS():
                    body[f] = rng2.randint(0, 10 ** 9)
                emit2("spark_stage_event", drv, body, comp)
                for rk in range(2):
                    emit2("spark_rdd_storage_status_event", drv, {
                        "rdd_name": f"rdd-{k}-{rk}",
                        "off_heap_memory_used": rng2.randint(0, 2 ** 26),
                        "memory_used": rng2.randint(0, 2 ** 30),
                        "disk_used": rng2.randint(0, 2 ** 31),
                    }, comp)

        # --- MapReduce PATH_EVENT (MapReduceTracer.java:79-215: INPUT on
        # input-format resolution, OUTPUT on committer setup) ------------
        if fw == "MAPREDUCE":
            am = _mk_header(app, containers[0], rng2)
            base_path = f"hdfs://nameservice1/user/{app['username']}"
            emit2("path_event", am,
                  {"path": f"{base_path}/input/ds{ai}", "type": "INPUT"},
                  app_start + 5_000)
            emit2("path_event", am,
                  {"path": f"{base_path}/output/ds{ai}", "type": "OUTPUT"},
                  app_start + 3_600_000)

        for c in containers:
            prof = c["profile"]
            state = {
                "heap_max": 4 * 2 ** 30,
                "heap_level": prof["heap_level"],
                "heap_peak": 0,
                "code_max": 256 * 2 ** 20,
                "code_level": prof["code_level"],
                "safepoint_rate": prof["safepoint_rate"],
                "lock_rate": prof["lock_rate"],
                "safepoints": rng.randint(0, 100),
                "locks": rng.randint(0, 100),
                "minor_gcs": 0,
                "major_gcs": 0,
                "thread_total": 200,
                "thread_count": max(1, int(200 * prof["thread_ratio"])),
            }
            n_samples = rng.randint(6, 12)
            c_start = app_start + rng.randint(0, 60_000)
            hdr = _mk_header(app, c, rng)
            is_executor = fw == "SPARK" and c["component"] == "EXECUTOR"
            is_flink_jm = fw == "FLINK" and c is containers[0]
            is_flink_tm = fw == "FLINK" and c is not containers[0]
            if is_executor:
                # GarmadonSparkListener.java:226-243 (onExecutorAdded)
                emit2("spark_executor_state_event", hdr, {
                    "state": "ADDED", "executor_hostname": c["hostname"],
                    "reason": "", "task_failures": 0,
                }, c_start)
            fl = {"late_task": 0, "late_src": 0, "late_win": 0,
                  "records_in": 0, "records_out": 0,
                  "offset": rng2.randint(10 ** 5, 10 ** 6)}
            for si in range(n_samples):
                ts = c_start + si * 10_000
                # ~2 % late events (invariant 4)
                if rng.random() < 0.02:
                    ts -= rng.randint(2 * 3_600_000, 5 * 3_600_000)
                emit("jvmstats_event", hdr,
                     {"section": _jvmstats_sections(state, rng)}, ts)
                if rng.random() < 0.4:
                    coll = rng.choice(
                        ["PS Scavenge", "PS MarkSweep",
                         "G1 Young Generation", "G1 Old Generation"])
                    if coll in ("PS MarkSweep", "G1 Old Generation"):
                        state["major_gcs"] += 1
                    emit("gc_event", hdr, {
                        "collector_name": coll,
                        "pause_time": rng.randint(5, 800),
                        "cause": rng.choice(GC_CAUSES),
                        "eden_before": rng.randint(10 ** 8, 10 ** 9),
                        "eden_after": rng.randint(10 ** 6, 10 ** 8),
                        "survivor_before": rng.randint(10 ** 6, 10 ** 8),
                        "survivor_after": rng.randint(10 ** 6, 10 ** 8),
                        "old_before": rng.randint(10 ** 8, 10 ** 9),
                        "old_after": rng.randint(10 ** 8, 10 ** 9),
                        "code_before": rng.randint(10 ** 7, 10 ** 8),
                        "code_after": rng.randint(10 ** 7, 10 ** 8),
                        "metaspace_before": rng.randint(10 ** 7, 10 ** 8),
                        "metaspace_after": rng.randint(10 ** 7, 10 ** 8),
                        "gc_pause_ratio_1_min": round(rng.uniform(0, 20), 2),
                    }, ts)
                if rng.random() < 0.5:
                    action = rng.choice(FS_ACTIONS_W)
                    uri = rng.choice(URIS)
                    dst = f"{uri}/{rng.choice(['tmp', 'user', 'apps', 'var'])}/f{rng.randint(0, 999)}"
                    emit("fs_event", hdr, {
                        "src_path": dst + ".src" if action == "RENAME" else "",
                        "dst_path": dst,
                        "action": action,
                        "uri": uri,
                        "method_duration_millis": int(
                            min(10_000, max(1, rng.lognormvariate(3, 1.5)))),
                        "hdfs_user": hdr["username"],
                        "status": "FAILURE" if rng.random() < 0.05 else "SUCCESS",
                    }, ts)
                for mtype, limit in (("MEMORY", 8 * 2 ** 30), ("VCORE", 4000)):
                    emit("container_monitoring_event", hdr, {
                        "type": mtype,
                        "limit": limit,
                        "value": float(
                            limit * rng.uniform(0.3, 1.05 if rng.random() < 0.05 else 0.95)),
                    }, ts)
                if app["framework"] == "SPARK" and rng.random() < 0.5:
                    emit("spark_task_event", hdr, _spark_task_body(rng, si), ts)
                if app["framework"] == "FLINK" and c is containers[0] \
                        and rng.random() < 0.6:
                    emit("flink_job_event", hdr, {
                        "job_id": f"job{ai}", "job_name": f"flink-job-{ai}",
                        "uptime": si * 10_000, "downtime": 0,
                        "restarting_time": 0, "full_restarts": 0,
                        "number_of_completed_checkpoints": si,
                        "number_of_failed_checkpoints": 0,
                        "number_of_in_progress_checkpoints": 0,
                        "last_checkpoint_duration":
                            rng.choice([800, 4000, 20_000, 70_000, 200_000]),
                        "last_checkpoint_size": rng.randint(10 ** 6, 10 ** 9),
                        "last_checkpoint_restore_timestamp": 0,
                        # flink_event.proto:26,34-35 (rng2: v2 additions)
                        "total_number_of_checkpoints": si,
                        "last_checkpoint_alignment_buffered":
                            rng2.randint(0, 10 ** 6),
                        "last_checkpoint_external_path":
                            f"hdfs://nameservice1/flink/ckpt/job{ai}",
                    }, ts)
                if is_executor and rng2.random() < 0.7:
                    # GarmadonSparkStorageStatusListener.java:158-180
                    emit2("spark_executor_storage_status_event", hdr, {
                        "executor_hostname": c["hostname"],
                        "rdd_off_heap_memory_used": rng2.randint(0, 2 ** 26),
                        "rdd_memory_used": rng2.randint(0, 2 ** 30),
                        "rdd_disk_used": rng2.randint(0, 2 ** 31),
                        "stream_off_heap_memory_used": 0,
                        "stream_memory_used": rng2.randint(0, 2 ** 24),
                        "stream_disk_used": 0,
                        "broadcast_off_heap_memory_used": 0,
                        "broadcast_memory_used": rng2.randint(0, 2 ** 24),
                        "broadcast_disk_used": rng2.randint(0, 2 ** 20),
                    }, ts)
                if is_flink_jm and rng2.random() < 0.6:
                    emit2("flink_job_manager_event", hdr, {
                        "num_registered_task_managers": n_containers - 1,
                        "num_running_jobs": 1,
                        "task_slots_available": rng2.randint(0, 4),
                        "task_slots_total": 8,
                    }, ts)
                if is_flink_tm:
                    task_ids = {
                        "job_id": f"job{ai}", "job_name": f"flink-job-{ai}",
                        "task_id": f"task-{c['container_id'][-2:]}",
                        "task_name": "Source: Kafka -> Window -> Sink",
                    }
                    emit2("flink_task_manager_event", hdr, {
                        "network_total_memory_segments": 32768,
                        "network_available_memory_segments":
                            rng2.randint(1_000, 32_768),
                    }, ts)
                    fl["late_task"] += rng2.randint(0, 5)
                    fl["records_in"] += rng2.randint(100, 10_000)
                    fl["records_out"] += rng2.randint(100, 10_000)
                    wm = ts - rng2.randint(500, 30_000)
                    emit2("flink_task_event", hdr, {
                        **task_ids,
                        "task_attempt_num": "0",
                        "buffers_input_queue_length": rng2.randint(0, 64),
                        "buffers_output_queue_length": rng2.randint(0, 64),
                        "buffers_in_pool_usage": rng2.randint(0, 100),
                        "buffers_out_pool_usage": rng2.randint(0, 100),
                        "num_records_out": fl["records_out"],
                        "num_records_in": fl["records_in"],
                        "num_bytes_out": fl["records_out"] * 120,
                        "num_bytes_in_local": fl["records_in"] * 60,
                        "num_bytes_in_remote": fl["records_in"] * 60,
                        "num_buffers_out": fl["records_out"] // 100,
                        "num_buffers_in_local": fl["records_in"] // 200,
                        "num_buffers_in_remote": fl["records_in"] // 200,
                        "num_bytes_out_per_second":
                            round(rng2.uniform(0, 10 ** 6), 2),
                        "num_bytes_in_local_per_second":
                            round(rng2.uniform(0, 10 ** 6), 2),
                        "num_bytes_in_remote_per_second":
                            round(rng2.uniform(0, 10 ** 6), 2),
                        "num_buffers_out_per_second":
                            round(rng2.uniform(0, 10 ** 3), 2),
                        "num_buffers_in_local_per_second":
                            round(rng2.uniform(0, 10 ** 3), 2),
                        "num_buffers_in_remote_per_second":
                            round(rng2.uniform(0, 10 ** 3), 2),
                        "num_records_in_per_second":
                            round(rng2.uniform(0, 10 ** 4), 2),
                        "num_records_out_per_second":
                            round(rng2.uniform(0, 10 ** 4), 2),
                        "subtask_index": c["container_id"][-1:],
                        "current_input_watermark": wm,
                        "num_late_records_dropped": fl["late_task"],
                    }, ts)
                    for op_id, op_name, late_key in (
                        ("op-src", "Source: Kafka", "late_src"),
                        ("op-win", "Window(TumblingEventTimeWindows)",
                         "late_win"),
                    ):
                        fl[late_key] += rng2.randint(0, 3)
                        emit2("flink_operator_event", hdr, {
                            **task_ids,
                            "operator_id": op_id,
                            "operator_name": op_name,
                            "subtask_index": c["container_id"][-1:],
                            "current_input_watermark":
                                wm - rng2.randint(0, 2_000),
                            "num_late_records_dropped": fl[late_key],
                            "current_input_1_watermark":
                                wm - rng2.randint(0, 2_000),
                            "current_input_2_watermark": 0,
                            "current_output_watermark":
                                wm - rng2.randint(0, 5_000),
                            "num_splits_processed": rng2.randint(0, 64),
                            "commits_succeeded": si,
                            "commits_failed": 0,
                            "records_lag_max":
                                float(rng2.randint(0, 50_000)),
                            "records_consumed_rate":
                                round(rng2.uniform(0, 10 ** 4), 2),
                            "bytes_consumed_rate":
                                round(rng2.uniform(0, 10 ** 6), 2),
                        }, ts)
                    fl["offset"] += rng2.randint(100, 5_000)
                    emit2("flink_kafka_consumer_event", hdr, {
                        **task_ids,
                        "operator_id": "op-src",
                        "operator_name": "Source: Kafka",
                        "subtask_index": c["container_id"][-1:],
                        "topic": "garmadon",
                        "partition": str(int(c["container_id"][-1:]) % 4),
                        "current_offsets": fl["offset"],
                        "committed_offsets":
                            fl["offset"] - rng2.randint(0, 500),
                    }, ts)
            end_ts = c_start + n_samples * 10_000
            # container end: RM view + agent STATE_EVENT(END) (invariant 1)
            emit("container_event", hdr, {
                "state": "COMPLETED", "type": "GUARANTEED", "reason": "",
                "exit_status": 0 if rng.random() > 0.1 else 143,
                "start_time": c_start, "finish_time": end_ts,
                "is_finished": True,
                "container_hostname": c["hostname"],
                "log_url": f"http://nm/{c['container_id']}",
                "vcores_reserved": rng.randint(1, 8),
                "memory_reserved": rng.choice([2048, 4096, 8192]),
            }, end_ts)
            if is_executor:
                # GarmadonSparkListener.java:245-280 (removed/blacklisted)
                if rng2.random() < 0.2:
                    emit2("spark_executor_state_event", hdr, {
                        "state": "BLACKLISTED",
                        "executor_hostname": c["hostname"],
                        "reason": "", "task_failures": rng2.randint(1, 8),
                    }, end_ts - 5_000)
                emit2("spark_executor_state_event", hdr, {
                    "state": "REMOVED", "executor_hostname": c["hostname"],
                    "reason": "Executor finished", "task_failures": 0,
                }, end_ts)
            emit("state_event", hdr, {"state": "END"}, end_ts)

    # invariant 3: duplicated tail replay (same offsets re-delivered)
    replay = [r for (_t, r) in emitted if r["kafka_partition"] == 0][-20:]
    for t, r in emitted[::-1]:
        if r in replay:
            tables[t].append(dict(r))
    return tables


FS_ACTIONS_W = ["READ"] * 5 + ["WRITE"] * 3 + ["RENAME", "DELETE", "APPEND",
                                               "ADD_BLOCK", "LIST_STATUS",
                                               "GET_CONTENT_SUMMARY"]


def _SPARK_METRICS():
    from garmadon_spark.schemas import SPARK_METRIC_FIELDS

    return SPARK_METRIC_FIELDS


def _spark_task_body(rng, si):
    body = {
        "task_id": si, "stage_id": str(si // 4), "stage_attempt_id": "0",
        "executor_hostname": f"host{rng.randint(0, 9):02d}.example.com",
        "type": "ResultTask" if si % 4 == 3 else "ShuffleMapTask",
        "locality": rng.choice(
            ["PROCESS_LOCAL", "NODE_LOCAL", "RACK_LOCAL", "ANY"]),
        "attempt_number": 0,
        "start_time": 0, "finish_time": 0,
        "status": "succeeded" if rng.random() > 0.05 else "failed",
        "failure_reason": "",
    }
    from garmadon_spark.schemas import SPARK_METRIC_FIELDS

    for f in SPARK_METRIC_FIELDS:
        body[f] = rng.randint(0, 10 ** 9)
    return body


NAME_MAP = {
    "fs_event": "FS_EVENT", "gc_event": "GC_EVENT",
    "jvmstats_event": "JVMSTATS_EVENT", "state_event": "STATE_EVENT",
    "container_monitoring_event": "CONTAINER_MONITORING_EVENT",
    "application_event": "APPLICATION_EVENT",
    "container_event": "CONTAINER_EVENT",
    "spark_task_event": "SPARK_TASK_EVENT",
    "flink_job_event": "FLINK_JOB_EVENT",
    "path_event": "PATH_EVENT",
    "spark_stage_event": "SPARK_STAGE_EVENT",
    "spark_stage_state_event": "SPARK_STAGE_STATE_EVENT",
    "spark_executor_state_event": "SPARK_EXECUTOR_STATE_EVENT",
    "spark_executor_storage_status_event":
        "SPARK_EXECUTOR_STORAGE_STATUS_EVENT",
    "spark_rdd_storage_status_event": "SPARK_RDD_STORAGE_STATUS_EVENT",
    "flink_job_manager_event": "FLINK_JOB_MANAGER_EVENT",
    "flink_task_manager_event": "FLINK_TASK_MANAGER_EVENT",
    "flink_task_event": "FLINK_TASK_EVENT",
    "flink_operator_event": "FLINK_OPERATOR_EVENT",
    "flink_kafka_consumer_event": "FLINK_KAFKA_CONSUMER_EVENT",
}


def to_spark(spark, tables: dict[str, list[dict]] | None = None,
             n_apps: int = 8, seed: int = 42):
    """Materialize the fixture as Spark DataFrames keyed by table name."""
    from garmadon_spark.schemas import full_schema

    if tables is None:
        tables = generate(n_apps=n_apps, seed=seed)
    out = {}
    for tname, rows in tables.items():
        schema = full_schema(NAME_MAP[tname])
        out[tname] = spark.createDataFrame(rows, schema=schema)
    return out


def write_parquet_pyarrow(out_dir: str, n_apps: int = 8, seed: int = 42):
    """Write the fixture corpus as parquet WITHOUT a SparkSession (pyarrow
    with the exact Arrow schema Spark would use), so DuckDB oracles can
    read the same rows the Spark queries see.  Deterministic: same
    (n_apps, seed) ⇒ byte-identical values."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    from garmadon_spark.schemas import full_schema

    tables = generate(n_apps=n_apps, seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    for tname, rows in tables.items():
        sch = to_arrow_schema(full_schema(NAME_MAP[tname]))
        pq.write_table(
            pa.Table.from_pylist(rows, schema=sch),
            os.path.join(out_dir, f"{tname}.parquet"),
        )
    return sorted(tables)


def write_parquet(spark, out_dir: str, n_apps: int = 8, seed: int = 42):
    dfs = to_spark(spark, n_apps=n_apps, seed=seed)
    for tname, df in dfs.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{tname}.parquet")
    return sorted(dfs)

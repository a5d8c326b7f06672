"""Heuristic severity tests — crafted event sequences per heuristic,
mirroring the reference's test strategy (HeapUsageTest.java, SafepointsTest
.java, …: one test class per heuristic asserting severity outcomes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garmadon_spark.heuristics import batch
from garmadon_spark.heuristics.base import Severity
from garmadon_spark.schemas import full_schema
from garmadon_spark.sources import fixtures

APP = {"application_id": "app_1", "attempt_id": "att_1"}


def _jvm_row(container, ts, sections, offset=0):
    return {
        **APP,
        "container_id": container,
        "timestamp": ts,
        "kafka_partition": 0,
        "kafka_offset": offset,
        "section": [
            {"name": sname,
             "property": [{"name": k, "value": str(v)} for k, v in props.items()]}
            for sname, props in sections.items()
        ],
    }


def _jvm_df(spark, rows):
    return spark.createDataFrame(rows, schema=full_schema("JVMSTATS_EVENT"))


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


# --- HeapUsage tiers (HeapUsage.java:76-87) -------------------------------

@pytest.mark.parametrize(
    "used,expected",
    [(75, Severity.NONE), (65, Severity.LOW), (45, Severity.MODERATE),
     (25, Severity.SEVERE)],
)
def test_heap_usage_tiers(spark, used, expected):
    rows = [
        _jvm_row("c1", 1000 + i * 10_000,
                 {"heap": {"max": 100, "used": used - 5 + 5 * (i % 2)}},
                 offset=i)
        for i in range(3)
    ]
    r = _one(batch.heap_usage(_jvm_df(spark, rows)))
    assert r.severity == expected
    assert r.details["c1"] == f"unused memory %: {100 - used}"


def test_heap_usage_major_gc_skips_container(spark):
    rows = [
        _jvm_row("c1", 1000, {"heap": {"max": 100, "used": 10},
                              "gc(PS MarkSweep)": {"count": 2}}),
    ]
    assert batch.heap_usage(_jvm_df(spark, rows)).count() == 0


# --- Safepoints rates (Safepoints.java:34-42) -----------------------------

@pytest.mark.parametrize(
    "per_sec,expected",
    [(2, None), (4, Severity.LOW), (6, Severity.MODERATE),
     (9, Severity.SEVERE), (20, Severity.CRITICAL)],
)
def test_safepoint_tiers(spark, per_sec, expected):
    rows = [
        _jvm_row("c1", i * 10_000, {"safepoints": {"count": 100 + i * per_sec * 10}},
                 offset=i)
        for i in range(1, 4)
    ]
    out = batch.safepoints(_jvm_df(spark, rows))
    if expected is None:
        assert out.count() == 0  # NONE containers dropped
    else:
        r = _one(out)
        assert r.severity == expected
        assert r.details["c1"] == f"Max safepoint/s: {per_sec}"


def test_safepoint_zero_last_skipped(spark):
    # first sample has count=0 → that delta is skipped (Safepoints.java:36)
    rows = [
        _jvm_row("c1", 10_000, {"safepoints": {"count": 0}}, offset=1),
        _jvm_row("c1", 20_000, {"safepoints": {"count": 1000}}, offset=2),
        _jvm_row("c1", 30_000, {"safepoints": {"count": 1010}}, offset=3),
    ]
    assert batch.safepoints(_jvm_df(spark, rows)).count() == 0


# --- Locks (Locks.java:33-41) ---------------------------------------------

@pytest.mark.parametrize(
    "per_sec,expected",
    [(5, None), (20, Severity.LOW), (70, Severity.MODERATE),
     (200, Severity.SEVERE), (600, Severity.CRITICAL)],
)
def test_lock_tiers(spark, per_sec, expected):
    rows = [
        _jvm_row("c1", i * 10_000,
                 {"synclocks": {"contendedlockattempts": i * per_sec * 10}},
                 offset=i)
        for i in range(1, 4)
    ]
    out = batch.locks(_jvm_df(spark, rows))
    if expected is None:
        assert out.count() == 0
    else:
        assert _one(out).severity == expected


# --- Threads (Threads.java:43-56) -----------------------------------------

@pytest.mark.parametrize(
    "count,total,expected",
    [(50, 100, None), (10, 100, Severity.LOW), (5, 1000, Severity.MODERATE)],
)
def test_threads_tiers(spark, count, total, expected):
    rows = [_jvm_row("c1", 1000, {"threads": {"count": count, "total": total}})]
    out = batch.threads(_jvm_df(spark, rows))
    if expected is None:
        assert out.count() == 0
    else:
        r = _one(out)
        assert r.severity == expected
        assert r.details["c1"] == \
            f"Max count threads: {count}, Total threads: {total}"


# --- CodeCacheUsage (CodeCacheUsage.java:37-49) ---------------------------

@pytest.mark.parametrize("used,kept", [(96, True), (90, False)])
def test_code_cache(spark, used, kept):
    rows = [_jvm_row("c1", 1000, {"code": {"used": used, "max": 100}})]
    out = batch.code_cache_usage(_jvm_df(spark, rows))
    if kept:
        assert _one(out).severity == Severity.MODERATE
    else:
        assert out.count() == 0


# --- GCCause / G1GC -------------------------------------------------------

def _gc_df(spark, rows):
    base = {**APP, "kafka_partition": 0,
            "collector_name": "PS Scavenge", "pause_time": 10,
            "cause": "Allocation Failure", "eden_before": 0, "eden_after": 0,
            "survivor_before": 0, "survivor_after": 0, "old_before": 0,
            "old_after": 0, "code_before": 0, "code_after": 0,
            "metaspace_before": 0, "metaspace_after": 0,
            "gc_pause_ratio_1_min": 0.0}
    full = []
    for i, r in enumerate(rows):
        d = dict(base)
        d.update(r)
        d.setdefault("kafka_offset", i)
        full.append(d)
    return spark.createDataFrame(full, schema=full_schema("GC_EVENT"))


def test_gc_cause_counts(spark):
    df = _gc_df(spark, [
        {"container_id": "c1", "timestamp": 1, "cause": "Metadata GC Threshold"},
        {"container_id": "c1", "timestamp": 2, "cause": "Ergonomics"},
        {"container_id": "c1", "timestamp": 3, "cause": "Ergonomics"},
        {"container_id": "c1", "timestamp": 4},  # ignored cause
    ])
    r = _one(batch.gc_cause(df))
    assert r.severity == Severity.MODERATE
    assert r.details["c1"] == "Metadata GC Threshold: 1, Ergonomics: 2"


def test_gc_cause_no_match_no_result(spark):
    df = _gc_df(spark, [{"container_id": "c1", "timestamp": 1}])
    assert batch.gc_cause(df).count() == 0


def test_g1_single_and_cumulative(spark):
    df = _gc_df(spark, [
        {"container_id": "c1", "timestamp": 1,
         "collector_name": "G1 Old Generation", "pause_time": 100},
        {"container_id": "c2", "timestamp": 2,
         "collector_name": "G1 Old Generation", "pause_time": 100},
        {"container_id": "c2", "timestamp": 3,
         "collector_name": "G1 Old Generation", "pause_time": 150},
        {"container_id": "c3", "timestamp": 4,
         "collector_name": "G1 Young Generation", "pause_time": 5},
    ])
    r = _one(batch.g1_full_gc(df))
    assert r.severity == Severity.SEVERE
    assert r.details["c2"] == "Count: 2, Cumulative PauseTime: 250ms"
    assert r.details["c1"].startswith("Timestamp: ")


# --- FileHeuristic (FileHeuristic.java:76-97) -----------------------------

@pytest.mark.parametrize(
    "writes,expected",
    [(5, Severity.NONE), (15, Severity.LOW), (60, Severity.MODERATE),
     (150, Severity.SEVERE)],
)
def test_file_heuristic_tiers(spark, writes, expected):
    rows = [
        {**APP, "container_id": "c1", "timestamp": i, "kafka_partition": 0,
         "kafka_offset": i, "src_path": "", "dst_path": f"/f{i}",
         "action": "WRITE" if i < writes else "READ", "uri": "hdfs://ns",
         "method_duration_millis": 1, "hdfs_user": "u", "status": "SUCCESS"}
        for i in range(writes + 3)
    ]
    df = spark.createDataFrame(rows, schema=full_schema("FS_EVENT"))
    r = _one(batch.file_heuristic(df, max_created_files=100))
    assert r.severity == expected
    assert r.details["Files written"] == str(writes)
    assert r.details["Files read"] == "3"


def test_file_heuristic_zero_activity_apps(spark):
    """FileHeuristic.onAppCompleted emits a row for EVERY completed app —
    apps with no fs events get all-zero counters at NONE severity when
    the app universe is supplied."""
    rows = [
        {**APP, "container_id": "c1", "timestamp": 1, "kafka_partition": 0,
         "kafka_offset": 1, "src_path": "", "dst_path": "/f1",
         "action": "WRITE", "uri": "hdfs://ns",
         "method_duration_millis": 1, "hdfs_user": "u",
         "status": "SUCCESS"}
    ]
    fs = spark.createDataFrame(rows, schema=full_schema("FS_EVENT"))
    universe = spark.createDataFrame(
        [(APP["application_id"], APP["attempt_id"]),
         ("app_quiet", "attempt_1")],
        "application_id string, attempt_id string",
    )
    got = {
        r.application_id: r
        for r in batch.file_heuristic(
            fs, max_created_files=100, app_universe=universe
        ).collect()
    }
    assert set(got) == {APP["application_id"], "app_quiet"}
    quiet = got["app_quiet"]
    assert quiet.severity == 0
    assert all(v == "0" for v in quiet.details.values())
    assert len(quiet.details) == 8


# --- FlinkCheckpointDuration ----------------------------------------------

@pytest.mark.parametrize(
    "duration,expected", [(60_000, Severity.NONE), (1_000_000, Severity.SEVERE)]
)
def test_flink_checkpoint_duration(spark, duration, expected):
    rows = [
        {**APP, "container_id": "c1", "timestamp": 1, "kafka_partition": 0,
         "kafka_offset": 1, "job_id": "j1", "job_name": "jobA",
         "uptime": 0, "downtime": 0, "restarting_time": 0, "full_restarts": 0,
         "number_of_completed_checkpoints": 1, "number_of_failed_checkpoints": 0,
         "number_of_in_progress_checkpoints": 0,
         "last_checkpoint_duration": duration,
         "last_checkpoint_size": 1, "last_checkpoint_restore_timestamp": 0}
    ]
    df = spark.createDataFrame(rows, schema=full_schema("FLINK_JOB_EVENT"))
    r = _one(batch.flink_checkpoint_duration(df))
    assert r.severity == expected and r.attempt_id == "jobA"


# --- integration: the full fixture ---------------------------------------

def test_run_all_fused_parity(spark):
    """The one-pass jvm plan must produce row-identical results to the
    five independent heuristic plans."""
    for n_apps, seed in ((4, 7), (8, 42)):
        dfs = fixtures.to_spark(spark, n_apps=n_apps, seed=seed)
        key = lambda r: (r.application_id, r.attempt_id, r.heuristic)
        fused = {key(r): (r.severity, r.score, dict(r.details))
                 for r in batch.run_all(dfs, 100, fused=True).collect()}
        plain = {key(r): (r.severity, r.score, dict(r.details))
                 for r in batch.run_all(dfs, 100, fused=False).collect()}
        assert fused == plain


def test_extractor_stats_counts_per_container(spark):
    dfs = fixtures.to_spark(spark, n_apps=4, seed=7)
    out = batch.extractor_stats(
        jvmstats=dfs["jvmstats_event"], gc_events=dfs["gc_event"]
    ).collect()
    assert out  # fixture containers are YARN_APPLICATION tagged
    # tallies must reproduce the per-table filtered counts exactly
    n_jvm = sum(r.jvm_stat_count for r in out)
    n_gc = sum(r.gc_stat_count for r in out)
    assert n_jvm == dfs["jvmstats_event"].filter(
        F.array_contains("tags", "YARN_APPLICATION")).count()
    assert n_gc == dfs["gc_event"].filter(
        F.array_contains("tags", "YARN_APPLICATION")).count()
    for r in out:
        assert r.container_id and r.application_id
        assert r.jvm_stat_count >= 0 and r.gc_stat_count >= 0


def test_run_all_on_fixture(spark):
    dfs = fixtures.to_spark(spark, n_apps=4, seed=7)
    out = batch.run_all(dfs, max_created_files=100).cache()
    names = {r.heuristic for r in out.select("heuristic").distinct().collect()}
    assert {"HeapUsage", "Safepoints", "Locks", "Threads", "CodeCacheUsage",
            "GCCause", "G1GC", "FileHeuristic"} <= names
    # severity domain + critical tiers reachable from fixture profiles
    sevs = {r.severity for r in out.select("severity").distinct().collect()}
    assert sevs <= {0, 1, 2, 3, 4} and Severity.CRITICAL in sevs
    assert out.filter(F.col("details").isNull()).count() == 0

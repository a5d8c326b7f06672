"""Archive sink + wire-frame codec tests (SURVEY §2.10, §2.9, §1.1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from garmadon_spark.sinks import archive
from garmadon_spark.sources import fixtures, frames


@pytest.fixture(scope="module")
def garmadon(spark):
    return fixtures.to_spark(spark, n_apps=4, seed=7)


# --- daily archive / partition pruning ------------------------------------

def test_daily_archive_layout_and_pruning(spark, garmadon, tmp_path):
    path = str(tmp_path / "fs_event")
    archive.write_daily_archive(garmadon["fs_event"], path)
    days = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert len(days) >= 2  # fixture spans multiple UTC days
    back = spark.read.parquet(path)
    assert back.count() == garmadon["fs_event"].count()
    # a day filter must prune partitions at the scan
    one_day = days[0][4:]
    plan = (
        back.filter(F.col("day") == one_day)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "day" in plan


def test_read_archive_time_range_prunes_and_matches(spark, garmadon,
                                                    tmp_path):
    """read_archive: day bounds land in PartitionFilters (planning-time
    prune), ts bounds in PushedFilters (footer-stats prune), and the
    result equals a manual filter over the full scan."""
    path = str(tmp_path / "fs_event")
    archive.write_daily_archive(garmadon["fs_event"], path)
    days = sorted(d[4:] for d in os.listdir(path) if d.startswith("day="))
    lo, hi = days[0], days[-2] if len(days) > 2 else days[-1]
    full = spark.read.parquet(path)
    ts_mid = full.approxQuantile("timestamp", [0.5], 0.0)[0]
    got = archive.read_archive(
        spark, path, start_day=lo, end_day=hi, end_ts=int(ts_mid)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split(
        "PartitionFilters")[1].split("]")[0]
    assert "timestamp" in plan.split("PushedFilters")[1].split("]")[0]
    exp = full.filter(
        (F.col("day") >= lo) & (F.col("day") <= hi)
        & (F.col("timestamp") <= int(ts_mid))
    )
    assert got.count() == exp.count() > 0


def test_daily_archive_sub_buckets_same_data_more_files(spark, garmadon,
                                                        tmp_path):
    """The hot-day knob splits a day across tasks without changing the
    data: same rows back, ≥ as many files per day, and per-file ts
    ranges within a day stay disjoint (footer pruning intact)."""
    src = garmadon["fs_event"]
    flat = str(tmp_path / "flat")
    split = str(tmp_path / "split")
    archive.write_daily_archive(src, flat)
    archive.write_daily_archive(src, split, sub_buckets=4)
    a, b = spark.read.parquet(flat), spark.read.parquet(split)
    assert b.count() == a.count() == src.count()
    assert sorted(map(repr, a.collect())) == sorted(map(repr, b.collect()))
    day = sorted(d for d in os.listdir(split) if d.startswith("day="))[0]
    files = [f for f in os.listdir(os.path.join(split, day))
             if f.endswith(".parquet")]
    spans = []
    for f in files:
        stats = (
            spark.read.parquet(os.path.join(split, day, f))
            .agg(F.min("timestamp"), F.max("timestamp")).head()
        )
        spans.append((stats[0], stats[1]))
    spans.sort()
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint, ordered time slices


def test_hourly_index(spark, garmadon, tmp_path):
    path = str(tmp_path / "index")
    df = garmadon["gc_event"].withColumn("event_type", F.lit("GC_EVENT"))
    archive.write_hourly_index(df, path)
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    hours = {r.hour for r in back.select("hour").distinct().collect()}
    assert all(len(h) == 13 for h in hours)  # yyyy-MM-dd-HH


def test_register_table(spark, garmadon, tmp_path):
    path = str(tmp_path / "reg")
    archive.write_daily_archive(garmadon["state_event"], path)
    archive.register_table(spark, "state_event", path, database="g_test")
    n = spark.sql("SELECT COUNT(*) c FROM g_test.state_event").first().c
    assert n == garmadon["state_event"].count()


# --- exactly-once replay handling (W8) ------------------------------------

def test_dedup_by_offset_drops_replays(garmadon):
    fs = garmadon["fs_event"]
    assert archive.dedup_by_offset(fs).count() \
        == fs.select("kafka_partition", "kafka_offset").distinct().count()


def test_committed_offsets_and_skip(spark, garmadon, tmp_path):
    path = str(tmp_path / "off")
    fs = archive.dedup_by_offset(garmadon["fs_event"])
    first, rest = fs.filter(F.col("kafka_offset") % 2 == 0), fs.filter(
        F.col("kafka_offset") % 2 == 1
    )
    archive.write_daily_archive(first, path)
    marks = archive.committed_offsets(spark, path)
    assert set(marks) <= {0, 1, 2, 3}
    # replaying everything after recovery keeps only offsets above the mark
    replay = archive.skip_committed(fs, marks)
    for r in replay.groupBy("kafka_partition").agg(
        F.min("kafka_offset").alias("lo")
    ).collect():
        assert r.lo > marks.get(r.kafka_partition, -1)


def test_retention(spark, garmadon, tmp_path):
    path = str(tmp_path / "ret")
    archive.write_daily_archive(garmadon["jvmstats_event"], path)
    days = sorted(d[4:] for d in os.listdir(path) if d.startswith("day="))
    dropped = archive.apply_retention(spark, path, max_days=0, today=days[-1])
    left = {d[4:] for d in os.listdir(path) if d.startswith("day=")}
    assert left == {days[-1]}
    assert [d[4:] for d in dropped] == days[:-1]


def test_compact_day(spark, garmadon, tmp_path):
    path = str(tmp_path / "cmp")
    archive.write_daily_archive(garmadon["fs_event"], path)
    day = sorted(d for d in os.listdir(path) if d.startswith("day="))[0][4:]
    before = spark.read.parquet(os.path.join(path, f"day={day}")).count()
    archive.compact_day(spark, path, day, target_files=1)
    part = os.path.join(path, f"day={day}")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files) == 1
    assert spark.read.parquet(part).count() == before


def test_compact_day_swap_keeps_partition_visible(spark, garmadon, tmp_path):
    """The renameat2 RENAME_EXCHANGE swap must never leave a window
    where the partition directory is absent or empty of parquet files
    — a poller thread hammers the directory for the whole compaction
    and records any moment it saw neither old nor new files."""
    import threading

    path = str(tmp_path / "cmpatomic")
    archive.write_daily_archive(garmadon["fs_event"], path)
    day = sorted(d for d in os.listdir(path) if d.startswith("day="))[0][4:]
    part = os.path.join(path, f"day={day}")
    before = spark.read.parquet(part).count()

    gaps: list[str] = []
    stop = threading.Event()

    def look():
        try:
            names = os.listdir(part)
        except FileNotFoundError:
            return "missing-dir"
        if not any(n.endswith(".parquet") for n in names):
            return "no-parquet-files"
        return None

    def poll():
        while not stop.is_set():
            bad = look()
            # confirm before recording: a REAL swap gap (rename-pair
            # fallback) persists across back-to-back listings, while a
            # loaded CI host can surface one-off transient listdir
            # blips; requiring two consecutive sightings keeps the
            # atomicity tripwire without the load flakiness
            if bad is not None and look() is not None:
                gaps.append(bad)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        archive.compact_day(spark, path, day, target_files=1)
    finally:
        stop.set()
        t.join(timeout=10)
    if archive._last_swap_strategy == "exchange":
        assert gaps[:5] == []
    else:
        # renameat2 unsupported/transiently refused here — the fallback
        # ran, whose absent-directory window is documented; the
        # atomicity property is pinned by test_exchange_dirs below
        import pytest

        pytest.skip(f"fallback swap ran (saw {sorted(set(gaps))})")
    assert spark.read.parquet(part).count() == before
    assert not os.path.exists(part + "._compact_tmp")
    assert not os.path.exists(part + "._compact_bak")


def test_exchange_dirs_swaps_atomically(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a), os.makedirs(b)
    open(os.path.join(a, "x"), "w").close()
    open(os.path.join(b, "y"), "w").close()
    if not archive._exchange_dirs(a, b):
        import pytest

        pytest.skip("renameat2 RENAME_EXCHANGE unsupported here")
    assert os.listdir(a) == ["y"] and os.listdir(b) == ["x"]


# --- frame codec (S2/S3) --------------------------------------------------

HDR = {"application_id": "app_1", "attempt_id": "att_1", "framework": "SPARK",
       "container_id": "c1", "tags": ["YARN_APPLICATION"]}


def _frames_df(spark, payloads, corrupt=0):
    rows = [Row(value=bytearray(p)) for p in payloads]
    for _ in range(corrupt):
        rows.append(Row(value=bytearray(b"\x00\x01garbage")))
    return spark.createDataFrame(rows, "value: binary")


def test_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed on the join key into the same bucket count
    must sort-merge-join with no Exchange on either side — the
    co-located layout write_bucketed exists to produce."""
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
    )
    items = spark.range(0, 4000).select(
        (F.col("id") % 1000).alias("l_orderkey"),
        (F.col("id") % 13).cast("double").alias("l_quantity"),
    )
    db = "bkt_test"
    try:
        archive.write_bucketed(orders, "orders_b", ["o_orderkey"],
                               n_buckets=8, database=db)
        archive.write_bucketed(items, "items_b", ["l_orderkey"],
                               n_buckets=8, database=db)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(f"{db}.orders_b").join(
                spark.table(f"{db}.items_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert joined.count() == 4000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_frame_roundtrip(spark):
    f1 = frames.encode_frame(1, 1700000000123, HDR,
                             {"action": "WRITE", "dst_path": "/tmp/x",
                              "status": "SUCCESS"})
    f2 = frames.encode_frame(3, 1700000000456, HDR, {"state": "END"})
    decoded = frames.decode_frames(_frames_df(spark, [f1, f2], corrupt=2))
    rows = {r.type_marker: r for r in decoded.collect()}
    assert set(rows) == {1, 3}
    assert rows[1].timestamp == 1700000000123
    fs = frames.decode_typed(decoded, 1).collect()
    assert len(fs) == 1
    assert fs[0].body.action == "WRITE" and fs[0].header.application_id == "app_1"
    assert fs[0].body.src_path is None  # absent proto3 field pre-default
    st = frames.decode_typed(decoded, 3).collect()
    assert st[0].body.state == "END"


def test_corrupt_frames_observed(spark):
    f1 = frames.encode_frame(1000, 1, HDR, {"collector_name": "PS Scavenge"})
    df = frames.decode_frames(_frames_df(spark, [f1], corrupt=3))
    assert df.count() == 1  # corrupt rows filtered


def test_streaming_frame_decode_to_archive(spark, tmp_path):
    """S1→S2→S3→K3 lifecycle on a STREAM (SURVEY §3.3): binary frames
    arrive via a file stream (Kafka stand-in), get frame-decoded and
    type-parsed inside the streaming query, and land in the
    day-partitioned archive exactly once."""
    import json as _json

    from pyspark.sql.types import BinaryType, StructField, StructType

    from garmadon_spark.sources.frames import (
        decode_frames, decode_typed, encode_frame,
    )

    src = str(tmp_path / "frames_in")
    out = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")
    schema = StructType([StructField("value", BinaryType())])
    day_ms = 86_400_000
    rows = [
        (bytearray(encode_frame(
            1, 1700000000000 + i * day_ms // 4,
            {"application_id": f"app_{i % 2}", "attempt_id": "1",
             "container_id": f"c{i}", "hostname": "h", "username": "u",
             "framework": "SPARK"},
            {"src_path": f"/p/{i}", "dst_path": "", "action": "READ",
             "uri": "hdfs://ns", "method_duration_millis": i,
             "hdfs_user": "u", "status": "SUCCESS"},
        )),)
        for i in range(8)
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    typed = decode_typed(decode_frames(stream), 1)
    flat = typed.select(
        "header.application_id", "body.action", "body.src_path",
        "timestamp",
        F.to_date(F.timestamp_millis(F.col("timestamp"))).alias("day"),
    )
    q = (
        flat.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .partitionBy("day")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 8
    assert got.select("application_id").distinct().count() == 2
    days = [r.day for r in got.select("day").distinct().collect()]
    assert len(days) == 3  # 8 events × 6h stride spread over 3 UTC days
    # restart with no new data ⇒ no duplicates (exactly-once)
    q2 = (
        flat.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .partitionBy("day")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == 8

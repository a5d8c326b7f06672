"""Continuous-aggregate rollup: incremental maintenance must equal the
from-scratch rollup, touch only the day partitions the increment hits,
and keep partials mergeable across redeliveries of late data."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from garmadon_spark.session import load_table
from garmadon_spark.sinks import rollup


def _events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events")


def _key(r):
    return (r.day, r.bucket, r.event_type)


def _vals(r):
    return (r.cnt, round(r.sum_value, 4), r.min_value, r.max_value)


def test_incremental_maintenance_equals_full_rebuild(spark, tmp_path):
    path = str(tmp_path / "rollup")
    ev = _events(spark)
    cut = "2024-01-15"
    early = ev.filter(F.to_date("ts") < cut)
    late = ev.filter(F.to_date("ts") >= cut)

    rollup.maintain_rollup(spark, early, path)
    days = rollup.maintain_rollup(spark, late, path)
    assert all(str(d) >= cut for d in days)

    got = {
        _key(r): _vals(r)
        for r in spark.read.parquet(path).collect()
    }
    exp = {
        _key(r): _vals(r)
        for r in rollup.build_rollup(ev).collect()
    }
    assert got == exp and len(got) > 10


def test_late_data_reopens_only_its_day(spark, tmp_path):
    path = str(tmp_path / "rollup")
    ev = _events(spark)
    one_day = "2024-01-10"
    first_half = ev.filter(
        (F.to_date("ts") == one_day) & (F.hour("ts") < 12)
    )
    late_half = ev.filter(
        (F.to_date("ts") == one_day) & (F.hour("ts") >= 12)
    )
    other = ev.filter(F.to_date("ts") != one_day)

    rollup.maintain_rollup(spark, other.unionByName(first_half), path)
    untouched = sorted(
        e for e in os.listdir(path) if e.startswith("day=")
        and one_day not in e
    )
    mtimes = {
        e: os.path.getmtime(os.path.join(path, e)) for e in untouched
    }
    days = rollup.maintain_rollup(spark, late_half, path)
    assert [str(d) for d in days] == [one_day]
    # untouched day partitions were neither rewritten...
    assert all(
        os.path.getmtime(os.path.join(path, e)) == mtimes[e]
        for e in untouched
    )
    # ...and the reopened day merged its partials (full-day parity)
    got = {
        _key(r): _vals(r)
        for r in spark.read.parquet(path).collect()
        if str(r.day) == one_day
    }
    exp = {
        _key(r): _vals(r)
        for r in rollup.build_rollup(
            ev.filter(F.to_date("ts") == one_day)
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """foreachBatch-fed continuous aggregate == from-scratch rollup,
    and a restart over the same source re-folds nothing (checkpoint +
    batch markers)."""
    src = str(tmp_path / "src")
    path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    ev = _events(spark)
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = rollup.rollup_query(stream, path, ckpt)
    q.awaitTermination()
    got = {
        _key(r): _vals(r) for r in spark.read.parquet(path).collect()
    }
    exp = {_key(r): _vals(r) for r in rollup.build_rollup(ev).collect()}
    assert got == exp and len(got) > 10
    # restart with the same checkpoint: no new batches, no re-fold
    q2 = rollup.rollup_query(
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src),
        path, ckpt,
    )
    q2.awaitTermination()
    again = {
        _key(r): _vals(r) for r in spark.read.parquet(path).collect()
    }
    assert again == exp

    # a FRESH checkpoint over the folded rollup is refused: the fold
    # chains state, so re-numbered batch ids would double-count or be
    # silently skipped (run-scoped markers)
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException,
                        match="different streaming incarnation"):
        rollup.rollup_query(
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src),
            path, str(tmp_path / "ckpt_fresh"),
        ).awaitTermination()
    still = {
        _key(r): _vals(r) for r in spark.read.parquet(path).collect()
    }
    assert still == exp


def test_streaming_rollup_restart_mid_stream(spark, tmp_path):
    """Hard-stop the continuous aggregate PARTWAY through the source,
    restart from the same checkpoint, drain: every micro-batch must
    fold exactly once.  The stop can land between a partition commit
    and its checkpoint entry, so the restart REPLAYS that batch —
    the per-batch marker is what keeps the re-fold from double-
    counting (the W8 exactly-once claim, previously shown only for
    the archive sink)."""
    import time

    src = str(tmp_path / "src")
    path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    ev = _events(spark)
    ev.repartition(8).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )

    q = rollup.rollup_query(stream(), path, ckpt)
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 2:
            break
        if not q.isActive:
            break
        time.sleep(0.1)
    q.stop()  # mid-stream kill; some batches committed, some not
    interrupted_at = (q.lastProgress or {}).get("batchId")

    q2 = rollup.rollup_query(stream(), path, ckpt)
    q2.awaitTermination()
    got = {
        _key(r): _vals(r) for r in spark.read.parquet(path).collect()
    }
    exp = {_key(r): _vals(r) for r in rollup.build_rollup(ev).collect()}
    assert got == exp and len(got) > 10
    # the kill really was mid-stream (8 single-file batches total)
    assert interrupted_at is None or interrupted_at < 7
    # marker set is one per folded batch — no duplicate folds recorded
    # (the Hadoop local FS also writes .crc sidecars; count .done only)
    markers = [
        m for m in os.listdir(os.path.join(path, "_rollup_batches"))
        if m.endswith(".done")
    ]
    assert len(markers) == len(set(markers)) <= 9


def test_histogram_rollup_incremental_equals_full(spark, tmp_path):
    path = str(tmp_path / "hist")
    ev = _events(spark)
    cut = "2024-01-15"
    rollup.maintain_histogram_rollup(
        spark, ev.filter(F.to_date("ts") < cut), path
    )
    rollup.maintain_histogram_rollup(
        spark, ev.filter(F.to_date("ts") >= cut), path
    )
    got = {
        (r.day, r.bucket, r.event_type, r.bin): r.cnt
        for r in spark.read.parquet(path).collect()
    }
    exp = {
        (r.day, r.bucket, r.event_type, r.bin): r.cnt
        for r in rollup.build_histogram_rollup(ev).collect()
    }
    assert got == exp and len(got) > 10


def test_histogram_quantile_within_bin_resolution(spark, tmp_path):
    """histogram_quantile over the rollup must land within one bin of
    the exact percentile computed from raw events — the Prometheus
    error contract."""
    ev = _events(spark)
    bin_width = 10.0
    hist = rollup.build_histogram_rollup(ev, bin_width=bin_width)
    est = {
        r.event_type: r.p95_est
        for r in rollup.histogram_quantile(
            hist, 0.95, bin_width=bin_width, per_bucket=False
        ).collect()
    }
    exact = {
        r.event_type: r.p
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.95)").alias("p"))
        .collect()
    }
    assert set(est) == set(exact) and len(est) >= 3
    for t in exact:
        assert abs(est[t] - exact[t]) <= bin_width, (
            t, est[t], exact[t]
        )


def test_distinct_rollup_merges_and_bounds_error(spark, tmp_path):
    """HLL sketch partials: incremental maintenance then a coarse-grain
    union must estimate within 5·rsd of the true distinct count — and
    crucially, summing per-hour exact distincts would OVERCOUNT (users
    span hours); the sketch union does not."""
    path = str(tmp_path / "hll")
    ev = _events(spark)
    cut = "2024-01-15"
    rollup.maintain_distinct_rollup(
        spark, ev.filter(F.to_date("ts") < cut), path
    )
    rollup.maintain_distinct_rollup(
        spark, ev.filter(F.to_date("ts") >= cut), path
    )
    est = {
        r.event_type: r.distinct_est
        for r in rollup.distinct_estimate(
            spark.read.parquet(path)
        ).collect()
    }
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    rsd = 1.04 / (2 ** 12) ** 0.5
    assert set(est) == set(exact) and len(est) >= 3
    for t in exact:
        assert abs(est[t] - exact[t]) <= max(5 * rsd * exact[t], 2.0), (
            t, est[t], exact[t]
        )
    # the naive alternative really is wrong: summing hourly distincts
    hourly_sum = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts"))
        .agg(F.count_distinct("user_id").alias("d"))
        .groupBy("event_type").agg(F.sum("d").alias("s"))
        .collect()
    )
    assert all(r.s > exact[r.event_type] for r in hourly_sum)


def test_read_rollup_derives_avg(spark, tmp_path):
    path = str(tmp_path / "rollup")
    rollup.maintain_rollup(spark, _events(spark), path)
    view = rollup.read_rollup(spark, path)
    r = view.filter(F.col("cnt") > 0).head()
    assert r.avg_value == round(r.sum_value / r.cnt, 4)


def test_refuse_foreign_chain_scans_past_newest_legacy(spark, tmp_path):
    """The O(1) newest-marker short-circuit must fall back to an
    exhaustive scan when the newest marker is LEGACY: a pre-run-scoping
    build that resumed the checkpoint AFTER a scoped incarnation buries
    that incarnation's foreign markers behind bare 'done' ones — the
    guard still has to find them."""
    import pytest as _pytest

    from garmadon_spark.sinks.rollup import (
        _refuse_foreign_chain, _write_marker,
    )

    mdir = str(tmp_path / "_chain")
    # scoped incarnation A committed 0-1, then a legacy build wrote 2-3
    _write_marker(spark, f"{mdir}/0.done", "run-A")
    _write_marker(spark, f"{mdir}/1.done", "run-A")
    _write_marker(spark, f"{mdir}/2.done", None)
    _write_marker(spark, f"{mdir}/3.done", None)

    with _pytest.raises(RuntimeError, match="different streaming"):
        _refuse_foreign_chain(spark, mdir, "run-C", "hint")
    # the same history is fine for A itself (legacy accepted as own)
    _refuse_foreign_chain(spark, mdir, "run-A", "hint")

    # all-scoped history: newest marker alone decides (foreign newest
    # refuses, own newest passes even over older legacy)
    mdir2 = str(tmp_path / "_chain2")
    _write_marker(spark, f"{mdir2}/0.done", None)
    _write_marker(spark, f"{mdir2}/1.done", "run-B")
    with _pytest.raises(RuntimeError, match="different streaming"):
        _refuse_foreign_chain(spark, mdir2, "run-C", "hint")
    _refuse_foreign_chain(spark, mdir2, "run-B", "hint")

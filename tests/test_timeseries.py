"""Gap-fill / LOCF / interpolation invariants the oracle can't see
(the declared queries pin exact parity; these pin the semantics on a
hand-built series with known gaps)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from garmadon_spark.operators import timeseries


def _series(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # group "a": observed at hours 0, 3 (gap at 1, 2), 4
        ("a", t0 + datetime.timedelta(hours=0), 1.0),
        ("a", t0 + datetime.timedelta(hours=3), 4.0),
        ("a", t0 + datetime.timedelta(hours=4), 10.0),
        # group "b": observed only at hour 2 (leading + trailing gaps)
        ("b", t0 + datetime.timedelta(hours=2), 7.0),
    ]
    return spark.createDataFrame(
        rows, "grp string, bucket timestamp, v double"
    )


def test_gapfill_densifies_to_shared_axis(spark):
    dense = timeseries.gapfill(
        _series(spark), group_cols=("grp",)
    ).collect()
    # global axis = hours 0..4 (5 buckets) x 2 groups
    assert len(dense) == 10
    gaps = {(r.grp, r.bucket.hour) for r in dense if r.is_gap}
    assert gaps == {("a", 1), ("a", 2),
                    ("b", 0), ("b", 1), ("b", 3), ("b", 4)}


def test_locf_carries_forward_and_leaves_leading_gaps(spark):
    dense = timeseries.gapfill(_series(spark), group_cols=("grp",))
    got = {
        (r.grp, r.bucket.hour): r.v_locf
        for r in timeseries.locf(
            dense, "v", group_cols=("grp",)
        ).collect()
    }
    assert got[("a", 1)] == 1.0 and got[("a", 2)] == 1.0  # carried
    assert got[("a", 3)] == 4.0  # observed wins
    assert got[("b", 0)] is None and got[("b", 1)] is None  # leading
    assert got[("b", 3)] == 7.0 and got[("b", 4)] == 7.0


def test_interpolate_is_time_weighted_with_edge_fallback(spark):
    dense = timeseries.gapfill(_series(spark), group_cols=("grp",))
    got = {
        (r.grp, r.bucket.hour): r.v_interp
        for r in timeseries.interpolate(
            dense, "v", group_cols=("grp",)
        ).collect()
    }
    # a: line from (0h, 1.0) to (3h, 4.0) -> 2.0 at 1h, 3.0 at 2h
    assert got[("a", 1)] == 2.0 and got[("a", 2)] == 3.0
    assert got[("a", 4)] == 10.0
    # b: single observation -> every gap falls back to it
    assert all(got[("b", h)] == 7.0 for h in range(5))


def test_counter_rate_handles_resets(spark):
    """Prometheus reset rule: a counter dropping means restart — the
    whole new value counts as increase, never a negative delta."""
    rows = [
        # job j: 5 -> 9 (inc 4) -> RESET to 2 (inc 2) -> 4 (inc 2)
        ("j", 0, 5), ("j", 1_000_000, 9),
        ("j", 3_700_000, 2), ("j", 3_800_000, 4),
        # job k: monotone across the bucket edge: 10 -> 25
        ("k", 3_500_000, 10), ("k", 3_700_000, 25),
    ]
    df = spark.createDataFrame(
        rows, "job string, timestamp long, ckpts long"
    )
    got = {
        (r.job, r.bucket): r.increase
        for r in timeseries.counter_rate(
            df, "ckpts", group_cols=("job",)
        ).collect()
    }
    assert got[("j", 0)] == 4          # first sample contributes 0
    assert got[("j", 1)] == 2 + 2      # reset absorbed, then +2
    assert got[("k", 0)] == 0
    assert got[("k", 1)] == 15         # delta crosses the bucket edge


def test_dense_axis_no_groups_is_plain_range(spark):
    axis = timeseries.dense_axis(_series(spark)).collect()
    assert len(axis) == 5
    assert sorted(r.bucket.hour for r in axis) == [0, 1, 2, 3, 4]

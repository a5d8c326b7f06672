"""Bucketized range joins vs brute force — exact same pair sets, no
duplicates, across bucket widths (the correctness must not depend on
the tuning knob)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators.rangejoin import (
    interval_overlap_join, point_in_interval_join,
)


def _data(spark, seed=7):
    rng = random.Random(seed)
    points = [(i, rng.randint(0, 400)) for i in range(150)]
    intervals = []
    for j in range(60):
        s = rng.randint(0, 380)
        intervals.append((j, s, s + rng.randint(0, 40)))
    p = spark.createDataFrame(points, "pid long, ts long")
    i = spark.createDataFrame(intervals, "iid long, lo long, hi long")
    return p, i


@pytest.mark.parametrize("width", [1, 7, 50, 1000])
def test_point_in_interval_matches_brute_force(spark, width):
    p, i = _data(spark)
    got = sorted(
        (r.pid, r.iid)
        for r in point_in_interval_join(
            p, i, "ts", "lo", "hi", bucket_width=width
        ).collect()
    )
    exp = sorted(
        (r.pid, r.iid)
        for r in p.crossJoin(i)
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    )
    assert got == exp and len(exp) > 50
    assert len(got) == len(set(got))  # duplicate-free


@pytest.mark.parametrize("width", [7, 1000])
def test_point_in_interval_left_matches_brute_force(spark, width):
    """how='left' must KEEP unmatched points as null-extended rows —
    the round-5 advisor found the old post-join residual filter
    silently degraded it to inner semantics."""
    p, i = _data(spark)
    got = sorted(
        (r.pid, r.iid)
        for r in point_in_interval_join(
            p, i, "ts", "lo", "hi", bucket_width=width, how="left"
        ).collect()
    )
    exp = sorted(
        (r.pid, r.iid)
        for r in p.join(
            i,
            (F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")),
            "left",
        ).collect()
    )
    assert got == exp
    # the brute-force left join really exercises both branches
    assert any(iid is None for _, iid in exp)
    assert sum(1 for _, iid in exp if iid is not None) > 50


def test_point_in_interval_rejects_unsupported_how(spark):
    p, i = _data(spark)
    with pytest.raises(ValueError, match="left_semi"):
        point_in_interval_join(
            p, i, "ts", "lo", "hi", bucket_width=7, how="left_semi"
        )


def test_inverted_intervals_match_nothing(spark):
    """end < start must match nothing — without the guard, Spark's
    sequence() silently generates a DESCENDING bucket list for the
    inverted row and the join emits bogus pairs."""
    p = spark.createDataFrame([(1, 50)], "pid long, ts long")
    i = spark.createDataFrame(
        [(1, 60, 40), (2, 40, 60)], "iid long, lo long, hi long"
    )
    got = point_in_interval_join(
        p, i, "ts", "lo", "hi", bucket_width=7
    ).collect()
    assert [(r.pid, r.iid) for r in got] == [(1, 2)]


@pytest.mark.parametrize("width", [1, 7, 50, 1000])
def test_interval_overlap_matches_brute_force(spark, width):
    _, i = _data(spark)
    a = i.select(
        F.col("iid").alias("aid"),
        F.col("lo").alias("a_lo"), F.col("hi").alias("a_hi"),
    )
    b = i.select(
        F.col("iid").alias("bid"),
        F.col("lo").alias("b_lo"), F.col("hi").alias("b_hi"),
    )
    got = sorted(
        (r.aid, r.bid)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=width
        ).collect()
    )
    exp = sorted(
        (r.aid, r.bid)
        for r in a.crossJoin(b)
        .filter(
            (F.col("a_lo") <= F.col("b_hi"))
            & (F.col("b_lo") <= F.col("a_hi"))
        )
        .collect()
    )
    assert got == exp and len(exp) > 100
    assert len(got) == len(set(got))

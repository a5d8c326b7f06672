"""Salted skew-handling utilities: results must equal the unsalted
formulation on a corpus with one planted hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from garmadon_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" carries 2000 rows, 50 keys carry 10 each
    hot = [Row(k="hot", v=i % 700) for i in range(2000)]
    cold = [Row(k=f"k{j}", v=i) for j in range(50) for i in range(10)]
    return spark.createDataFrame(hot + cold)


def test_salted_topk_matches_unsalted(skewed):
    got = {
        r.k: r.top_5_v
        for r in skew.salted_topk_values(skewed, "k", "v", k=5).collect()
    }
    exp = {
        r.k: r.top
        for r in skewed.groupBy("k")
        .agg(F.slice(F.sort_array(F.collect_list("v"), asc=False), 1, 5)
             .alias("top"))
        .collect()
    }
    assert got == exp


def test_salted_collect_set_matches_unsalted(skewed):
    got = {
        r.k: r.v_set
        for r in skew.salted_collect_set(skewed, "k", "v").collect()
    }
    exp = {
        r.k: sorted(r.s)
        for r in skewed.groupBy("k")
        .agg(F.collect_set("v").alias("s")).collect()
    }
    assert got == exp


def test_salted_count_distinct_exact(skewed):
    got = {
        r.k: r.distinct_v
        for r in skew.salted_count_distinct(skewed, "k", "v").collect()
    }
    exp = {
        r.k: r.d
        for r in skewed.groupBy("k")
        .agg(F.count_distinct("v").alias("d")).collect()
    }
    assert got == exp
    assert got["hot"] == 700


def test_salt_is_deterministic(skewed):
    a = skew.with_salt(skewed, 16, ["v"]).select("k", "v", "_salt").collect()
    b = skew.with_salt(skewed, 16, ["v"]).select("k", "v", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r._salt < 16 for r in a)


def test_replicated_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [Row(k="hot", label="H")] + [Row(k=f"k{j}", label=f"L{j}")
                                     for j in range(50)]
    )
    n = 8
    big = skew.with_salt(skewed, n, ["v"])
    rep = skew.replicate_for_salted_join(dim, n)
    got = big.join(rep, ["k", "_salt"]).groupBy("label").count()
    exp = skewed.join(dim, "k").groupBy("label").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))

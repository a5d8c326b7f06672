"""Filter algebra unit tests — semantics of GarmadonMessageFilter
(readers/common/.../GarmadonMessageFilter.java) re-expressed as Columns."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from garmadon_spark import filters as gf


def _fixture(spark):
    return spark.createDataFrame(
        [
            Row(event_type="GC_EVENT", tags=["YARN_APPLICATION"],
                container_id="c1", framework="SPARK"),
            Row(event_type="FS_EVENT", tags=["FORWARDER"],
                container_id="c2", framework="MAPREDUCE"),
            Row(event_type="GC_EVENT", tags=["NODEMANAGER", "FORWARDER"],
                container_id="c3", framework="FLINK"),
        ]
    )


def test_has_type(spark):
    df = _fixture(spark)
    assert df.filter(gf.has_type("GC_EVENT")).count() == 2


def test_has_tag(spark):
    df = _fixture(spark)
    assert df.filter(gf.has_tag("FORWARDER")).count() == 2
    assert df.filter(gf.has_tag("YARN_APPLICATION")).count() == 1


def test_compound_reference_shape(spark):
    # The heuristics subscription filter (Heuristics.java:57-77):
    # hasTag(YARN_APPLICATION) AND (hasType(GC_EVENT) AND
    #   (hasFramework(SPARK) OR hasFramework(MAPREDUCE)))
    df = _fixture(spark)
    pred = gf.has_tag("YARN_APPLICATION") & (
        gf.has_type("GC_EVENT")
        & (gf.has_framework("SPARK") | gf.has_framework("MAPREDUCE"))
    )
    rows = df.filter(pred).collect()
    assert len(rows) == 1 and rows[0].container_id == "c1"


def test_not_any_none(spark):
    df = _fixture(spark)
    assert df.filter(gf.any_filter()).count() == 3
    assert df.filter(gf.none_filter()).count() == 0
    assert df.filter(gf.not_filter(gf.has_framework("SPARK"))).count() == 2


def test_and_or_all(spark):
    df = _fixture(spark)
    assert df.filter(gf.and_all(gf.has_type("GC_EVENT"),
                                gf.has_container_id("c3"))).count() == 1
    assert df.filter(gf.or_all(gf.has_framework("SPARK"),
                               gf.has_framework("FLINK"))).count() == 2


def test_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    # A filter built from the algebra must appear in PushedFilters of a
    # parquet scan — the Spark-native equivalent of the reference's lazy
    # per-type deserialization (GarmadonReader.java:198-226).
    from garmadon_spark.session import load_table

    df = load_table(spark, sf_dir, "events").filter(gf.has_type("click"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "event_type" in plan.split("PushedFilters")[1][:200]

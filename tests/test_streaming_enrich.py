"""Streaming latest-value enrichment tests (J1/J2 streaming parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garmadon_spark.sources import fixtures
from garmadon_spark.streaming import enrich, pipeline


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("enrich_events"))
    fixtures.write_parquet(spark, d, n_apps=4, seed=7)
    return d


def test_enrich_stream_applies_latest_metadata(spark, event_dir):
    apps = pipeline.stream_events(
        spark, f"{event_dir}/application_event.parquet", "APPLICATION_EVENT")
    fs = pipeline.stream_events(
        spark, f"{event_dir}/fs_event.parquet", "FS_EVENT")
    # blank out header metadata on the event stream: enrichment must fill it
    fs_blank = fs.withColumn("application_name", F.lit("")) \
        .withColumn("username", F.lit("")) \
        .withColumn("component", F.lit("UNKNOWN"))
    union = enrich.prepare_enrich_input(apps, fs_blank, "fs")
    out = enrich.enrich_stream(union)
    q = (
        out.writeStream.format("memory").queryName("enriched")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM enriched WHERE event_kind='fs'").collect()
    assert rows
    batch_apps = spark.read.parquet(f"{event_dir}/application_event.parquet")
    meta = {
        r.application_id: r.application_name
        for r in batch_apps.groupBy("application_id")
        .agg(F.max_by("application_name", "timestamp").alias("application_name"))
        .collect()
    }
    am = {
        r.application_id: r.am
        for r in batch_apps.groupBy("application_id")
        .agg(F.max_by("am_container_id", "timestamp").alias("am"))
        .collect()
    }
    enriched = [r for r in rows if r.application_name != ""]
    assert enriched  # metadata applied to events after it arrived
    for r in enriched:
        assert r.application_name == meta[r.application_id]
        expected = "APP_MASTER" if r.container_id == am[r.application_id] \
            else "APP_SLAVE"
        assert r.component == expected
    # cache-miss parity: the late-metadata app (fixture app #1) has events
    # flowing through unenriched
    assert any(r.application_name == "" for r in rows)

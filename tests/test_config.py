"""Config-driven reader surface (garmadon-config.yml analogue)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from garmadon_spark.config import (
    ConfigError,
    filter_from_config,
    load_config,
    run_batch_archive,
)
from garmadon_spark.sources import fixtures

YAML = """
hdfs:
  finalDir: {out}
  messagesBeforeExpiringWriters: 1000
kafka:
  settings:
    bootstrap.servers: kafka:9092
    group.id: hdfs-reader
prometheus:
  port: 31001
filters:
  tags: [YARN_APPLICATION]
  types: [FS_EVENT, GC_EVENT]
"""


def test_load_config_defaults_and_validation(tmp_path):
    cfg = load_config(YAML.format(out=tmp_path))
    assert cfg["hdfs"]["messagesBeforeExpiringWriters"] == 1000
    assert cfg["hdfs"]["backlogDays"] == 2          # default
    assert cfg["hdfs"]["compression"] == "gzip"     # default
    assert cfg["kafka"]["group.id"] == "hdfs-reader"
    with pytest.raises(ConfigError):
        load_config({"hdfss": {}})                  # typo'd section
    with pytest.raises(ConfigError):
        load_config({"hdfs": {}})                   # missing finalDir


def test_filter_from_config_matches_manual_predicate(spark):
    dfs = fixtures.to_spark(spark, n_apps=4, seed=7)
    fs = dfs["fs_event"]
    pred = filter_from_config(
        {"tags": ["YARN_APPLICATION"], "types": ["FS_EVENT"]}
    )
    got = fs.withColumn("event_type", F.lit("FS_EVENT")).filter(pred).count()
    exp = fs.filter(F.array_contains("tags", "YARN_APPLICATION")).count()
    assert got == exp > 0


def test_run_batch_archive_writes_day_partitions(spark, tmp_path):
    dfs = fixtures.to_spark(spark, n_apps=4, seed=7)
    sub = {"fs_event": dfs["fs_event"].withColumn(
        "event_type", F.lit("FS_EVENT"))}
    cfg = load_config(YAML.format(out=tmp_path))
    paths = run_batch_archive(spark, cfg, sub)
    assert paths == [f"{tmp_path}/fs_event"]
    days = [d for d in os.listdir(paths[0]) if d.startswith("day=")]
    assert days
    back = spark.read.parquet(paths[0])
    exp = sub["fs_event"].filter(
        F.array_contains("tags", "YARN_APPLICATION")).count()
    assert back.count() == exp > 0
    part_file = next(
        f for f in os.listdir(os.path.join(paths[0], days[0]))
        if f.endswith(".parquet")
    )
    assert ".gz." in part_file or part_file.endswith(".gz.parquet")

"""Time-bucketing operators (SURVEY §2.4 E6, §2.9 W1/W2/W4).

Reference behaviors:
- HDFS daily partition ``day=YYYY-MM-DD`` — UTC event-time truncation
  (PartitionedWriter.java:103);
- ES hourly index ``garmadon-yyyy-MM-dd-HH`` from the event timestamp
  (ElasticSearchReader.java:62,141);
- checkpoint "delayed day" = day(t − 26h): a day is checkpoint-eligible
  only 26 h after it starts — 24 h + 2 h grace (ReaderFactory.java:221-229,
  DelayedDailyPathComputer.java:19-23).

DIVERGENCE (documented per SURVEY risks): the reference formats the
checkpoint day with week-year pattern "YYYY-MM-dd"
(DelayedDailyPathComputer.java:21) — a bug around new year.  We use the
ISO calendar year ("yyyy").

All pure scalar expressions; the day/hour columns are the archive's
partition keys, so downstream time-range queries get partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_time(ts_millis: Column | str) -> Column:
    c = F.col(ts_millis) if isinstance(ts_millis, str) else ts_millis
    return F.timestamp_millis(c)


def day_bucket(ts_millis: Column | str) -> Column:
    """W1: UTC day partition value 'yyyy-MM-dd' (PartitionedWriter.java:103)."""
    return F.date_format(event_time(ts_millis), "yyyy-MM-dd")


def hour_bucket(ts_millis: Column | str) -> Column:
    """W2: ES hourly index suffix 'yyyy-MM-dd-HH' (ElasticSearchReader.java:141)."""
    return F.date_format(event_time(ts_millis), "yyyy-MM-dd-HH")


def delayed_day(ts_millis: Column | str, grace_hours: int = 26) -> Column:
    """W4: checkpointable day for a watermark time — day(t − grace).
    grace = 24 h (day length) + 2 h (late data), ReaderFactory.java:222."""
    c = F.col(ts_millis) if isinstance(ts_millis, str) else ts_millis
    return F.date_format(
        F.timestamp_millis(c - grace_hours * 3_600_000), "yyyy-MM-dd"
    )


def with_buckets(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    return (
        df.withColumn("event_time", event_time(ts_col))
        .withColumn("day", day_bucket(ts_col))
        .withColumn("hour", hour_bucket(ts_col))
    )

"""YAML reader configuration — the config-driven surface of the
reference's reader binaries (``garmadon-config.yml``; parsed by
ReaderConfiguration / KafkaConfiguration / PrometheusConfiguration,
readers/common/.../reader/configurations/*.java; hdfs option inventory
Readme.md:630-650, elasticsearch example
readers/elasticsearch/src/test/resources/garmadon-config.yml).

A user of the reference points their ``hdfs:`` / ``elasticsearch:`` /
``kafka:`` sections here instead; each option maps onto the Spark knob
that plays the same role:

===========================  =============================================
reference option             Spark mapping
===========================  =============================================
hdfs.finalDir                archive output path (``partitionBy(day)``)
hdfs.messagesBeforeExpiring  ``maxRecordsPerFile`` (writer roll, W6)
hdfs.writersExpirationDelay  ``trigger(processingTime=...)`` micro-batch
hdfs.sizeBeforeFlushingTmp   parquet block sizing (left to Spark default)
hdfs.backlogDays             offset-recovery scan window (obviated by
                             checkpoints; kept for the batch-replay dedup)
elasticsearch.*              hourly index table (the ES stand-in, K1/K2)
ilmTimingDayForDeletePhase   ``apply_retention`` cutoff days
kafka.settings               passed through to the Kafka source verbatim
prometheus.port              MetricsCollector (scrape-ready snapshot)
filters                      extension: tags/types/frameworks predicate
                             (GarmadonMessageFilter subscriptions)
===========================  =============================================

Temp-file retry knobs (maxTmpFileOpenRetries, tmpFileOpenRetryPeriod,
expirerPeriod, heartbeatPeriod) have no Spark role: the file-sink commit
protocol and checkpointing replace the temp→rename dance and heartbeat
markers (SURVEY §2.9 W5/W7).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column

KNOWN_SECTIONS = {
    "hdfs", "elasticsearch", "kafka", "prometheus", "filters", "retention",
}

_HDFS_DEFAULTS = {
    "messagesBeforeExpiringWriters": 3_000_000,
    "writersExpirationDelay": 30,          # minutes
    "backlogDays": 2,
    "compression": "gzip",
}

_ES_DEFAULTS = {
    "ilmTimingDayForDeletePhase": 4,
    "bulkSizeMB": 5,
}


class ConfigError(ValueError):
    pass


def load_config(source: str | dict) -> dict:
    """Parse and validate a garmadon-config.yml (path, YAML string, or
    pre-parsed dict).  Unknown top-level sections fail fast, like the
    reference's strict YAML binding (ReaderConfiguration is bound
    field-by-field; a typo'd section dies at startup, not at runtime)."""
    if isinstance(source, dict):
        cfg = dict(source)
    else:
        import os

        import yaml

        text = source
        if os.path.exists(source):
            with open(source) as fh:
                text = fh.read()
        cfg = yaml.safe_load(text) or {}
    if not isinstance(cfg, dict):
        raise ConfigError(f"config root must be a mapping, got {type(cfg)}")
    unknown = set(cfg) - KNOWN_SECTIONS
    if unknown:
        raise ConfigError(f"unknown config sections: {sorted(unknown)}")
    out: dict[str, Any] = {}
    if "hdfs" in cfg:
        hdfs = {**_HDFS_DEFAULTS, **(cfg["hdfs"] or {})}
        if "finalDir" not in hdfs:
            raise ConfigError("hdfs.finalDir is required")
        out["hdfs"] = hdfs
    if "elasticsearch" in cfg:
        out["elasticsearch"] = {**_ES_DEFAULTS, **(cfg["elasticsearch"] or {})}
    out["kafka"] = (cfg.get("kafka") or {}).get("settings", {})
    out["prometheus"] = cfg.get("prometheus") or {}
    out["filters"] = cfg.get("filters") or {}
    return out


def filter_from_config(filters_cfg: dict) -> Column | None:
    """Build the subscription predicate from the ``filters`` section —
    the YAML form of the GarmadonMessageFilter algebra (F1-F7):
    ``{tags: [...], types: [...], frameworks: [...], containers: [...]}``
    conjoined across keys, disjoined within a key (the reference's
    ``hasTag(X).and(hasType(A).or(hasType(B)))`` shape)."""
    from garmadon_spark import filters as fl

    parts = []
    if filters_cfg.get("tags"):
        parts.append(fl.or_all(*[fl.has_tag(t) for t in filters_cfg["tags"]]))
    if filters_cfg.get("types"):
        parts.append(fl.has_any_type(*filters_cfg["types"]))
    if filters_cfg.get("frameworks"):
        parts.append(
            fl.or_all(*[fl.has_framework(f)
                        for f in filters_cfg["frameworks"]])
        )
    if filters_cfg.get("containers"):
        parts.append(
            fl.or_all(*[fl.has_container_id(c)
                        for c in filters_cfg["containers"]])
        )
    if not parts:
        return None
    return fl.and_all(*parts)


def run_batch_archive(spark, cfg: dict, events_by_type: dict) -> list[str]:
    """Config-driven batch archive run (the HdfsExporter role over a
    batch replay): per event type, apply the subscription filter and
    write the day-partitioned archive under ``hdfs.finalDir``; register
    each table when a Hive-style database is wanted.  Returns the output
    paths."""
    from garmadon_spark.sinks.archive import write_daily_archive

    hdfs = cfg.get("hdfs")
    if hdfs is None:
        raise ConfigError("run_batch_archive needs an hdfs section")
    pred = filter_from_config(cfg.get("filters", {}))
    out = []
    for tname, df in sorted(events_by_type.items()):
        if pred is not None:
            df = df.filter(pred)
        path = f"{hdfs['finalDir']}/{tname}"
        write_daily_archive(
            df, path,
            compression=hdfs["compression"],
            max_records_per_file=hdfs["messagesBeforeExpiringWriters"],
        )
        out.append(path)
    return out

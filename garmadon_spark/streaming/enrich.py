"""Streaming latest-value enrichment (SURVEY §2.5 J1/J2, streaming form).

The reference keeps Guava caches (5-min TTL) of app metadata and enriches
every event as it flows (ElasticSearchCacheManager.java:22-92).  The
Spark-native equivalent is keyed state: ``applyInPandasWithState`` keyed
by ``application_id`` — APPLICATION_EVENT rows update the state (latest
metadata wins by event timestamp), every other row is emitted with the
current state's metadata applied.

Cache-miss parity: events arriving before their app's metadata flow
through unenriched (empty strings), exactly like the reference's miss
path — no buffering, no watermark stall.  A TTL (the reference's 5 min)
maps to a ProcessingTimeTimeout; kept NoTimeout here because app
cardinality is bounded and state is a single small dict per app.

Scale: state value is ~1 kB per live application (≪ state per-key limits);
the shuffle is the same application_id hash partitioning the batch join
uses.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

META_COLS = ("application_name", "framework", "username", "am_container_id")

ENRICHED_SCHEMA = StructType(
    [
        StructField("application_id", StringType()),
        StructField("container_id", StringType()),
        StructField("event_kind", StringType()),
        StructField("timestamp", StringType()),
        StructField("application_name", StringType()),
        StructField("framework", StringType()),
        StructField("username", StringType()),
        StructField("component", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("meta_json", StringType())])


def prepare_enrich_input(
    app_events: DataFrame, events: DataFrame, event_kind: str
) -> DataFrame:
    """Union the metadata carrier stream with one event stream, projected
    to the narrow enrichment schema (JVM-side)."""
    meta = app_events.select(
        "application_id",
        F.col("container_id"),
        F.lit("__app_meta__").alias("event_kind"),
        F.col("timestamp").cast("string").alias("timestamp"),
        "application_name",
        "framework",
        "username",
        F.col("am_container_id").alias("component"),  # carries AM id in-band
    )
    ev = events.select(
        "application_id",
        "container_id",
        F.lit(event_kind).alias("event_kind"),
        F.col("timestamp").cast("string").alias("timestamp"),
        "application_name",
        "framework",
        "username",
        "component",
    )
    return meta.unionByName(ev)


def _enrich_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (app_id,) = key
    meta = json.loads(state.get[0]) if state.exists else {}
    out = []
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["ts_i"] = rows["timestamp"].astype("int64")
    rows = rows.sort_values("ts_i", kind="stable")
    for r in rows.itertuples():
        if r.event_kind == "__app_meta__":
            if r.ts_i >= meta.get("ts", -1):
                meta = {
                    "ts": int(r.ts_i),
                    "application_name": r.application_name,
                    "framework": r.framework,
                    "username": r.username,
                    "am_container_id": r.component,
                }
        else:
            # J2 component resolution (ElasticSearchCacheManager.java:71-92)
            comp = r.component
            if comp == "UNKNOWN" and meta:
                comp = (
                    "APP_MASTER"
                    if r.container_id == meta.get("am_container_id")
                    else "APP_SLAVE"
                )
            out.append(
                {
                    "application_id": app_id,
                    "container_id": r.container_id,
                    "event_kind": r.event_kind,
                    "timestamp": r.timestamp,
                    "application_name":
                        meta.get("application_name") or r.application_name,
                    "framework": meta.get("framework") or r.framework,
                    "username": meta.get("username") or r.username,
                    "component": comp,
                }
            )
    state.update((json.dumps(meta),))
    yield pd.DataFrame(out, columns=[f.name for f in ENRICHED_SCHEMA])


def enrich_stream(union_events: DataFrame) -> DataFrame:
    """Latest-value enrichment over a prepare_enrich_input union."""
    return union_events.groupBy("application_id").applyInPandasWithState(
        _enrich_fn,
        outputStructType=ENRICHED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Enrichment joins (SURVEY §2.5 J1/J2).

The reference keeps 5-min TTL caches of APPLICATION_EVENT metadata and
container→component mappings, enriching every event by application_id /
container_id (ElasticSearchCacheManager.java:22-92).  Semantics: a
*latest-value lookup join* — each event gets the most recent known
metadata for its key.

Batch form (here): the "cache" is the dimension side of a broadcast join —
we reduce APPLICATION_EVENT to one latest row per (application_id) with
max_by over the event timestamp, then broadcast it.  Per-app metadata is
tiny relative to the event stream (1 row per app vs ~10⁶ events per app at
prod scale), so the fact stream NEVER shuffles for enrichment.

Component resolution parity (ElasticSearchCacheManager.java:71-92):
UNKNOWN components resolve to APP_MASTER iff the event's container is the
app's AM container, else APP_SLAVE.

Streaming form: garmadon_spark.streaming.enrich (latest-value state via
transformWithState / stream-stream join with watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

APP_META_COLS = ("application_name", "framework", "username", "yarn_tags",
                 "project_name", "workflow_name", "am_container_id")


def latest_app_metadata(app_events: DataFrame) -> DataFrame:
    """Reduce APPLICATION_EVENT to the latest metadata row per app —
    max_by(col, timestamp) per key, one shuffle on application_id
    (small: one output row per app)."""
    aggs = [
        F.max_by(c, "timestamp").alias(f"app_{c}") for c in APP_META_COLS
    ]
    return app_events.groupBy("application_id").agg(*aggs)


def enrich_with_app_metadata(
    events: DataFrame, app_events: DataFrame
) -> DataFrame:
    """J1: left-join latest app metadata onto every event by
    application_id; event-side values win only when the dimension misses
    (the reference *overwrites* appName/framework/username from the cache,
    ElasticSearchCacheManager.java:49-60)."""
    dim = F.broadcast(latest_app_metadata(app_events))
    out = events.join(dim, "application_id", "left")
    for c in ("application_name", "framework", "username"):
        out = out.withColumn(c, F.coalesce(F.col(f"app_{c}"), F.col(c)))
    return out


def resolve_component(
    events: DataFrame, app_events: DataFrame
) -> DataFrame:
    """J2: UNKNOWN component → APP_MASTER iff container_id ==
    am_container_id else APP_SLAVE (ElasticSearchCacheManager.java:71-92).
    Broadcast of the per-app AM-container dimension."""
    am = F.broadcast(
        app_events.groupBy("application_id").agg(
            F.max_by("am_container_id", "timestamp").alias("_am_container_id")
        )
    )
    out = events.join(am, "application_id", "left")
    resolved = (
        F.when(
            F.col("component") != "UNKNOWN", F.col("component")
        )
        .when(
            F.col("container_id") == F.col("_am_container_id"),
            F.lit("APP_MASTER"),
        )
        .otherwise(F.lit("APP_SLAVE"))
    )
    return out.withColumn("component", resolved).drop("_am_container_id")

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


def enrich_as_of(
    events: DataFrame,
    states: DataFrame,
    key: str = "application_id",
    ts_col: str = "timestamp",
    state_cols: tuple[str, ...] = ("state",),
    payload_cols: tuple[str, ...] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """AS-OF join: each event gets the state row with the greatest
    state-timestamp ≤ the event's timestamp (per key) — the event-TIME
    form of J1's latest-value lookup, for timeline-correct enrichment
    (what state was the app in WHEN this sample was taken, not at scan
    end).  ``direction="forward"`` flips the match to the SMALLEST
    state-timestamp ≥ the event's (the "next scheduled change" lookup);
    both directions are inclusive at equal timestamps.

    Spark lacks a native as-of join; the classic range-join rewrite
    explodes O(events × states-per-key).  This is the sort-based form:
    union both sides tagged, one window per key ordered by
    (ts, is_event) — state rows sort BEFORE events at equal timestamps,
    making the match inclusive — and a running last(ignorenulls) carries
    each state column forward.  ONE shuffle on the key, O(1) window
    state per row, no range blowup; at 100 TB this is a single exchange
    of events ⊕ states.

    ``states`` must be unique per (key, ts) — ties there make the match
    nondeterministic in ANY as-of implementation; dedupe first (e.g.
    arg-max over kafka coordinates).
    """
    if payload_cols is None:
        payload_cols = tuple(
            c for c in events.columns if c not in (key, ts_col)
        )
    ev_types = dict(events.dtypes)
    st_types = dict(states.dtypes)
    ev = events.select(
        key, ts_col,
        *[F.col(c) for c in payload_cols],
        F.lit(1).alias("_is_ev"),
        *[F.lit(None).cast(st_types[c]).alias(f"_s_{c}")
          for c in state_cols],
    )
    st = states.select(
        key, ts_col,
        *[F.lit(None).cast(ev_types[c]).alias(c) for c in payload_cols],
        F.lit(0).alias("_is_ev"),
        *[F.col(c).alias(f"_s_{c}") for c in state_cols],
    )
    from pyspark.sql import Window

    if direction == "backward":
        # states sort BEFORE events at equal ts -> inclusive match
        w = (
            Window.partitionBy(key)
            .orderBy(ts_col, "_is_ev")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last
    elif direction == "forward":
        # events sort BEFORE states at equal ts -> inclusive match
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts_col), F.desc("_is_ev"))
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first
    else:
        raise ValueError(f"direction must be backward|forward: {direction}")
    out = ev.unionByName(st).select(
        key, ts_col, *payload_cols, "_is_ev",
        *[
            pick(f"_s_{c}", ignorenulls=True).over(w).alias(f"{c}_asof")
            for c in state_cols
        ],
    )
    return out.filter(F.col("_is_ev") == 1).drop("_is_ev")

"""JVM-statistics explode operators (SURVEY §2.4 E3/E4).

The JVMSTATS body is a dynamic string bag:
``section: array<struct<name, property: array<struct<name, value>>>>``
(jvm_statistics_event.proto:8-18).  Two reference consumers:

E3 (Elasticsearch, EventHelper.java:20-44):
  - non-device sections flatten to ``<section>_<property>`` fields with a
    number-or-string fallback (``Double.parseDouble`` try/catch at
    EventHelper.java:33-40 → ``try_cast`` here);
  - ``disk``/``network`` sections pivot into ONE document per device with
    ``event_type=OS`` — property names are ``<device>_<metric>``
    (EventHelper.java:22-30).

E4 (HDFS, ReaderFactory.java:126-170 + jvm_statistics_exploded.proto):
  only the ``heap`` section, typed → JvmStatisticsHeap{init, committed,
  used, max}.

Scale: explode(section) multiplies rows by ~12 (bounded by section count,
not data size) and immediately collapses back via groupBy(event id) pivot
— but we avoid the generic pivot entirely: `map_from_entries` turns each
section into a map and `element_at` does O(1) typed lookups, keeping the
whole thing a scalar projection with ZERO shuffles.  Only the ES
wide-document form needs the explode, and the per-device pivot keys are
data-independent (section names), so the "pivot" is a static projection
too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sections_map(col: str = "section") -> Column:
    """section array → map<section_name, map<prop_name, value>> — one
    expression, O(1) lookups afterwards."""
    return F.map_from_entries(
        F.transform(
            F.col(col),
            lambda s: F.struct(
                s["name"].alias("key"),
                F.map_from_entries(
                    F.transform(
                        s["property"],
                        lambda p: F.struct(
                            p["name"].alias("key"), p["value"].alias("value")
                        ),
                    )
                ).alias("value"),
            ),
        )
    )


def section_prop(
    smap: Column, section: str, prop: str, cast: str | None = "double"
) -> Column:
    """Typed lookup of one section/property with the reference's
    number-or-string fallback semantics (try_cast ⇒ null if non-numeric,
    caller keeps the string via section_prop(..., cast=None))."""
    v = F.element_at(F.element_at(smap, F.lit(section)), F.lit(prop))
    return v.try_cast(cast) if cast else v


def explode_heap(df: DataFrame, section_col: str = "section") -> DataFrame:
    """E4: typed heap extraction (ReaderFactory.java:126-170).  Scalar
    projection, no explode, no shuffle."""
    smap = _sections_map(section_col)
    return df.select(
        *[c for c in df.columns if c != section_col],
        section_prop(smap, "heap", "init", "long").alias("heap_init"),
        section_prop(smap, "heap", "committed", "long").alias("heap_committed"),
        section_prop(smap, "heap", "used", "long").alias("heap_used"),
        section_prop(smap, "heap", "max", "long").alias("heap_max"),
    )


def flatten_sections_es(
    df: DataFrame,
    section_col: str = "section",
    device_sections: tuple[str, ...] = ("disk", "network"),
) -> DataFrame:
    """E3 main document: every non-device section/property becomes a
    ``<section>_<property>`` entry of a flat map column
    (``section_props``), numeric where parseable (try_cast fallback).

    gc(<name>) sections keep their parenthesized names, matching the
    reference's field naming (EventHelper.java:20-32)."""
    flat = F.map_from_entries(
        F.flatten(
            F.transform(
                F.filter(
                    F.col(section_col),
                    lambda s: ~s["name"].isin(*device_sections),
                ),
                lambda s: F.transform(
                    s["property"],
                    lambda p: F.struct(
                        F.concat_ws("_", s["name"], p["name"]).alias("key"),
                        p["value"].alias("value"),
                    ),
                ),
            )
        )
    )
    return df.select(
        *[c for c in df.columns if c != section_col],
        flat.alias("section_props"),
    )


def explode_os_devices(
    df: DataFrame,
    section_col: str = "section",
    device_sections: tuple[str, ...] = ("disk", "network"),
) -> DataFrame:
    """E3 device pivot: disk/network sections emit ONE row per device with
    ``event_type='OS'`` (EventHelper.java:20-44).  Property names are
    ``<device>_<metric>``; the device is the prefix before the first '_',
    the metric the remainder (EventHelper.java:26-29).

    explode is bounded by device count per row; the per-device "pivot" is
    map_from_entries over that device's metrics — still no shuffle."""
    props = F.flatten(
        F.transform(
            F.filter(F.col(section_col), lambda s: s["name"].isin(*device_sections)),
            lambda s: s["property"],
        )
    )
    devices = F.array_distinct(
        F.transform(props, lambda p: F.substring_index(p["name"], "_", 1))
    )
    base = [c for c in df.columns if c != section_col]
    exploded = df.select(
        *base,
        props.alias("_props"),
        F.explode(devices).alias("device"),
    )
    metrics = F.map_from_entries(
        F.transform(
            F.filter(
                F.col("_props"),
                lambda p: F.substring_index(p["name"], "_", 1) == F.col("device"),
            ),
            lambda p: F.struct(
                F.substr(
                    p["name"],
                    F.length(F.substring_index(p["name"], "_", 1)) + 2,
                ).alias("key"),
                p["value"].try_cast("double").alias("value"),
            ),
        )
    )
    return exploded.select(
        *base,
        F.lit("OS").alias("event_type"),
        F.col("device"),
        metrics.alias("metrics"),
    )

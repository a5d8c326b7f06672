"""Composable filter algebra — the reference's public predicate API.

Mirrors `GarmadonMessageFilter` / `GarmadonMessageFilters`
(readers/common/src/main/java/com/criteo/hadoop/garmadon/reader/
GarmadonMessageFilter.java:6-196): hasType / hasTag / hasContainerId /
hasFramework, composable with and/or/not, plus ANY/NONE.

Spark-first design: every predicate is a thin builder returning a
``pyspark.sql.Column``.  Because they are Columns (not callbacks), Catalyst
pushes them into the Parquet/Kafka scan (PushedFilters), reorders cheap
predicates first, and prunes per-type parsing — which is exactly the
hand-rolled "lazy deserialize only if a filter accepts the type" trick at
GarmadonReader.java:198-226, obtained for free.

The two-phase type/header split of the reference collapses: a filter over
``event_type`` prunes whole row groups via parquet column stats before any
header column is decoded.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def has_type(event_type: str, col: str = "event_type") -> Column:
    """GarmadonMessageFilter.TypeFilter (GarmadonMessageFilter.java:131-148)."""
    return F.col(col) == F.lit(event_type)


def has_any_type(*event_types: str, col: str = "event_type") -> Column:
    return F.col(col).isin(list(event_types))


def has_tag(tag: str, col: str = "tags") -> Column:
    """Array-containment tag filter (GarmadonMessageFilter.java:152-166)."""
    return F.array_contains(F.col(col), tag)


def has_container_id(container_id: str, col: str = "container_id") -> Column:
    """GarmadonMessageFilter.java:168-181."""
    return F.col(col) == F.lit(container_id)


def has_framework(framework: str, col: str = "framework") -> Column:
    """GarmadonMessageFilter.java:183-196."""
    return F.col(col) == F.lit(framework)


def any_filter() -> Column:
    """ANY — accepts everything (GarmadonMessageFilter.java:80-93)."""
    return F.lit(True)


def none_filter() -> Column:
    """NONE — rejects everything (GarmadonMessageFilter.java:95-108)."""
    return F.lit(False)


def not_filter(pred: Column) -> Column:
    """NotFilter (GarmadonMessageFilter.java:110-129). ``~pred`` works too."""
    return ~pred


def and_all(*preds: Column) -> Column:
    """Conjunction (GarmadonMessageFilter.java:34-55)."""
    out = F.lit(True)
    for p in preds:
        out = out & p
    return out


def or_all(*preds: Column) -> Column:
    """Disjunction (GarmadonMessageFilter.java:57-76)."""
    out = F.lit(False)
    for p in preds:
        out = out | p
    return out

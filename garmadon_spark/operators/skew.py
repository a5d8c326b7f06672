"""Skew-handling utilities: deterministic salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
join skew at runtime; salting is still needed where AQE doesn't reach:

- **aggregations whose per-key state grows with the key's row count**
  (collect_list/collect_set, exact distinct, large top-k heaps) — a hot
  key concentrates its whole payload in one reducer task.  Two-stage
  salted aggregation bounds any single task's state to ~1/n_salts of
  the hot key.
- **stream-stream / stream-static joins**, where runtime re-planning is
  unavailable.

Salts are DETERMINISTIC — `pmod(xxhash64(payload), n)` — never
`rand()`: retries/speculative tasks must salt a row identically or
exactly-once sinks see duplicates.

Plan shapes:
  salted_topk:          groupBy(key, salt) topk  →  groupBy(key) merge
  salted_collect_list:  groupBy(key, salt) collect → groupBy(key) flatten
Both stages are map-side combinable; the second stage sees n_salts rows
per key regardless of the key's true row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int,
              payload_cols: list[str] | None = None,
              salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, n_salts): hash of the payload
    columns (default: all non-key content — pass the columns that vary
    within a hot key, e.g. the event id)."""
    cols = payload_cols or df.columns
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")
    )


def salted_topk_values(
    df: DataFrame, key_col: str, value_col: str, k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Top-k values per key, hot-key safe.

    Stage 1 keeps only k candidates per (key, salt) — any global top-k
    value is a top-k value within its salt, so no candidate is lost.
    Stage 2 merges n_salts·k candidates per key (bounded, tiny)."""
    salted = with_salt(df, n_salts, [value_col])
    partial = (
        salted.groupBy(key_col, "_salt")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(value_col), asc=False), 1, k
            ).alias("_cand")
        )
    )
    return (
        partial.select(key_col, F.explode("_cand").alias(value_col))
        .groupBy(key_col)
        .agg(
            F.slice(
                F.sort_array(F.collect_list(value_col), asc=False), 1, k
            ).alias(f"top_{k}_{value_col}")
        )
    )


def salted_collect_set(
    df: DataFrame, key_col: str, value_col: str, n_salts: int = 16,
) -> DataFrame:
    """collect_set per key without concentrating a hot key's payload in
    one task: per-salt partial sets, then a flatten+dedup merge of
    n_salts pre-deduplicated arrays per key."""
    salted = with_salt(df, n_salts, [value_col])
    partial = (
        salted.groupBy(key_col, "_salt")
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return (
        partial.groupBy(key_col)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_part")))
            ).alias(f"{value_col}_set")
        )
    )


def salted_count_distinct(
    df: DataFrame, key_col: str, value_col: str, n_salts: int = 16,
) -> DataFrame:
    """Exact distinct count per key, hot-key safe: dedup happens inside
    each (key, salt) partition; because the salt is derived from the
    VALUE, equal values always land in the same salt — per-salt distinct
    counts are disjoint and sum exactly."""
    salted = with_salt(df, n_salts, [value_col])
    partial = (
        salted.groupBy(key_col, "_salt")
        .agg(F.count_distinct(value_col).alias("_d"))
    )
    return partial.groupBy(key_col).agg(
        F.sum("_d").alias(f"distinct_{value_col}")
    )


def replicate_for_salted_join(
    small: DataFrame, n_salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Broadcast-style salted join prep: replicate the SMALL side once
    per salt so a salted big side joins on (key, salt).  Use when the
    small side is too big to broadcast but the big side has hot keys:
    big.withColumn(salt, pmod(xxhash64(<row id>), n)) ⋈ replicate(small).
    """
    return small.crossJoin(
        F.broadcast(
            small.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias(salt_col)
            )
        )
    )

"""Bounded-memory frequent-items (heavy hitters) for the dashboard
tier: Misra–Gries summaries per partition, merged by itemwise sum.

The exact top-k query (``ev_topk_users``) shuffles one row per DISTINCT
key — fine when keys fit a shuffle, wrong when a 100 TB stream has
billions of them and the dashboard only wants "which buckets dominate".
This operator is the sketch twin, same relationship HLL++ has to exact
``count_distinct``:

- **Partial** (``freq_items_partial``): one ``mapInPandas`` pass keeps
  ≤ k counters per partition (Misra & Gries 1982).  Each Arrow batch is
  reduced vectorized (``value_counts``) and folded into the running
  summary; when the summary exceeds k entries, the (k+1)-th largest
  counter value is subtracted from every entry and non-positive ones
  drop — the mergeable-summaries MERGE step (Agarwal et al., PODS
  2012), whose total decrement is bounded by n_p/(k+1) for a partition
  of n_p rows.
- **Merge** (``freq_items``): the ≤ k·P partial rows (P = partitions —
  KILOBYTES, not data) are summed per item in one tiny aggregate.

Guarantee carried to the caller: for every item,
``true − n/(k+1) ≤ count_lb ≤ true``, so any item with true frequency
above n/(k+1) is PRESENT in the output.  The declared
``ev_heavy_value_buckets_check`` gate verifies exactly that contract
against the exact aggregate.

No data-sized shuffle anywhere: the corpus is read once, map-side,
and only k·P summary rows move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _mg_fold(counters: dict, items, counts, k: int) -> dict:
    """Fold exact (item, count) pairs into a Misra–Gries summary of at
    most k entries.  Adding exact counts is error-free; the prune
    subtracts the (k+1)-th largest value from every counter and drops
    the non-positive ones."""
    for it, c in zip(items, counts):
        counters[it] = counters.get(it, 0) + int(c)
    if len(counters) > k:
        kth = sorted(counters.values(), reverse=True)[k]
        counters = {i: c - kth for i, c in counters.items() if c > kth}
    return counters


def freq_items_partial(
    df: DataFrame, item_col: str, k: int = 64,
    count_rows: bool = False,
) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ k rows (item, cnt) per
    partition, cnt a LOWER bound on the partition-local frequency with
    per-partition error ≤ n_p/(k+1).  NULL items are ignored (no
    frequency semantics).

    ``count_rows=True`` additionally emits ONE ``(NULL, n_p)`` row per
    non-empty partition so a caller gets the exact total row count in
    the SAME pass (the streaming maintainer needs n for the error
    bound; a second count() scan would double every trigger's read).
    NULL is unambiguous as the sentinel because null items never enter
    a summary."""
    if k < 1:
        raise ValueError("k must be >= 1")
    import pandas as pd

    item_type = df.schema[item_col].dataType
    out_schema = StructType([
        StructField("item", item_type),
        StructField("cnt", LongType()),
    ])
    sel = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )

    def mg(batches):
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf["item"].value_counts(dropna=True)
            counters = _mg_fold(
                counters, vc.index.tolist(), vc.values.tolist(), k
            )
        if counters:
            yield pd.DataFrame(
                {"item": list(counters.keys()),
                 "cnt": [counters[i] for i in counters]}
            )
        if count_rows and n_rows:
            yield pd.DataFrame({"item": [None], "cnt": [n_rows]})

    return sel.mapInPandas(mg, out_schema)


def freq_items(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """Merged heavy-hitters sketch: itemwise sum of the per-partition
    summaries.  Output columns (item, count_lb); for every item
    ``true − n/(k+1) ≤ count_lb ≤ true`` (n = total non-null rows), so
    items above the n/(k+1) threshold are guaranteed present.  The
    aggregate runs over ≤ k·partitions rows — summary-sized, never
    data-sized."""
    return (
        freq_items_partial(df, item_col, k)
        .groupBy("item")
        .agg(F.sum("cnt").alias("count_lb"))
    )

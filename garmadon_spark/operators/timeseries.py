"""Time-series gap handling: dense bucket axes, LOCF, interpolation.

The ES/Grafana dashboard surface this engine re-expresses (SURVEY §2.7)
draws timelines from `date_histogram` buckets; Grafana's null-handling
modes ("connect nulls", "fill forward") are presentation-side there.  A
SQL consumer of the same archive needs them as relational operators:
a date_histogram emits NO row for an empty bucket, so a downstream
join/alert/derivative over the series silently skips gaps.  Spark has
no native gap-fill (TimescaleDB's ``time_bucket_gapfill`` /
``locf`` / ``interpolate``); this module composes it from built-ins:

- **Dense axis** — one ``sequence()`` over the global [min, max] bucket
  range, exploded, cross-joined with the distinct group keys.  The axis
  is (range/step × groups) rows — dashboard-sized, independent of event
  volume — so the cross join is two broadcast-sized inputs, never the
  fact table.
- **LOCF** — ``last(value, ignorenulls=True)`` over an unbounded-
  preceding window per group, ordered by bucket: each gap carries the
  last observed value forward.
- **Linear interpolation** — the same trick twice (last non-null
  looking back, first non-null looking forward, with their bucket
  times) and one fused arithmetic expression between them.

Scale shape: the raw events collapse to per-(group, bucket) aggregates
BEFORE touching the axis, so the windows run over the DENSE SERIES
(axis-sized — e.g. 8,760 rows per group for a year of hours), not over
events.  One shuffle for the aggregate, one axis-sized shuffle for the
window partition; both keyed on the group column, so AQE coalesces the
tiny partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_axis(
    series: DataFrame,
    bucket_col: str = "bucket",
    step: str = "1 hour",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Every (group, bucket) cell of the dense time grid spanned by the
    observed global [min, max] bucket range at ``step`` granularity.
    All groups share one axis (the dashboard contract: one x-axis per
    panel), so a group missing at the edges is filled there too."""
    bounds = series.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    axis = bounds.select(
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(f"interval {step}")
            )
        ).alias(bucket_col)
    )
    if not group_cols:
        return axis
    groups = series.select(*group_cols).distinct()
    return groups.crossJoin(F.broadcast(axis))


def gapfill(
    series: DataFrame,
    bucket_col: str = "bucket",
    step: str = "1 hour",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Left-join the series onto its dense axis: every missing (group,
    bucket) appears as a row with NULL value columns and ``is_gap``
    true.  Input must already be aggregated to one row per (group,
    bucket) — gapfill densifies a series, it does not build one."""
    axis = dense_axis(series, bucket_col, step, group_cols)
    keys = [*group_cols, bucket_col]
    marked = series.withColumn("_present", F.lit(True))
    return (
        axis.join(marked, keys, "left")
        .withColumn("is_gap", F.col("_present").isNull())
        .drop("_present")
    )


def locf(
    dense: DataFrame,
    value_col: str,
    bucket_col: str = "bucket",
    group_cols: tuple[str, ...] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward over a densified series: fill
    each NULL with the most recent non-NULL value in its group.
    Leading gaps (no prior observation) stay NULL — LOCF never invents
    a value it did not see."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.withColumn(
        out_col or f"{value_col}_locf",
        F.coalesce(
            F.col(value_col), F.last(value_col, ignorenulls=True).over(w)
        ),
    )


def counter_rate(
    df: DataFrame,
    value_col: str,
    ts_col: str = "timestamp",
    group_cols: tuple[str, ...] = (),
    bucket_ms: int = 3_600_000,
    out_col: str = "increase",
) -> DataFrame:
    """Prometheus ``increase()`` over a cumulative counter column, with
    counter-reset handling: per group (ordered by time) the per-sample
    delta is ``value - lag(value)``; a NEGATIVE delta means the process
    restarted and its counter began again at ~0, so the whole current
    value counts as increase (the Prometheus reset rule).  Summed into
    fixed time buckets — integer arithmetic end to end, no float.

    The first sample of a bucket deltas against the PREVIOUS bucket's
    last sample (lag crosses bucket edges), so bucket increases sum to
    the true total — the off-by-one-bucket error of bucketing first and
    diffing second.  One window shuffle on the group key, then the
    bucket aggregate.  The window is one ordered partition per GROUP —
    fine for metric streams (samples-per-series bounded by scrape rate
    × retention); for multi-year retentions run per archive
    day-partition with the previous day's last sample unioned in, so
    the cross-midnight delta survives the split."""
    w = Window.partitionBy(*group_cols).orderBy(ts_col, value_col)
    prev = F.lag(value_col).over(w)
    val = F.col(value_col)
    inc = (
        F.when(prev.isNull(), F.lit(0))
        .when(val >= prev, val - prev)
        .otherwise(val)
    )
    return (
        df.select(
            *group_cols,
            F.expr(f"{ts_col} div {bucket_ms}").alias("bucket"),
            inc.alias("_inc"),
        )
        .groupBy("bucket", *group_cols)
        .agg(F.sum("_inc").cast("long").alias(out_col))
    )


def _masked(col: str, when_col: Column) -> Column:
    return F.when(when_col.isNotNull(), F.col(col))


def interpolate(
    dense: DataFrame,
    value_col: str,
    bucket_col: str = "bucket",
    group_cols: tuple[str, ...] = (),
    out_col: str | None = None,
    decimals: int = 4,
) -> DataFrame:
    """Linear interpolation across gaps: each NULL becomes the value on
    the straight line between the nearest observed neighbors, weighted
    by time distance.  Edge gaps (no neighbor on one side) fall back to
    the single available neighbor (LOCF forward / backward).  One
    backward and one forward window over the dense series — still
    axis-sized work."""
    val = F.col(value_col)
    back = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ts = F.unix_timestamp(F.col(bucket_col)).cast("double")
    pv = F.last(val, ignorenulls=True).over(back)
    pt = F.last(_masked(bucket_col, val), ignorenulls=True).over(back)
    nv = F.first(val, ignorenulls=True).over(fwd)
    nt = F.first(_masked(bucket_col, val), ignorenulls=True).over(fwd)
    pts = F.unix_timestamp(pt).cast("double")
    nts = F.unix_timestamp(nt).cast("double")
    interp = F.when(val.isNotNull(), val).otherwise(
        F.when(
            pv.isNotNull() & nv.isNotNull(),
            pv + (nv - pv) * (ts - pts) / (nts - pts),
        ).otherwise(F.coalesce(pv, nv))
    )
    return dense.withColumn(
        out_col or f"{value_col}_interp", F.round(interp, decimals)
    )

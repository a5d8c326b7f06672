"""Bucketized range join: point-in-interval matching without the
nested-loop trap.

Spark plans an inequality-only join (``p.ts BETWEEN i.start AND
i.end``) as BroadcastNestedLoopJoin or a cartesian product — O(points ×
intervals) comparisons, the classic 100 TB killer.  The standard fix
(Databricks' range-join optimization, postgres GiST) is binning: chop
the number line into fixed buckets, explode each interval to the
buckets it overlaps, put each point in its one bucket, equi-join on the
bucket id, and re-check the exact predicate on the survivors.

Cost model: the equi-join shuffles points once and intervals
``avg_interval_len / bucket_width + 1`` times; comparisons drop from
|P|·|I| to the pairs sharing a bucket.  ``bucket_width`` ≈ the median
interval length is the usual sweet spot (≤1 extra copy per interval,
buckets no wider than the match neighborhoods).  Each point lives in
exactly ONE bucket and an interval's exploded bucket list is distinct,
so the join emits no duplicate (point, interval) pairs — no post-dedup
shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """Join interval rows that OVERLAP (``l_start <= r_end AND r_start
    <= l_end``).  Both sides explode to their buckets, so an
    overlapping pair meets in every shared bucket; the pair is kept
    only in the FIRST bucket both occupy — ``greatest(l_start, r_start)
    div width`` — which emits each pair exactly once without a dedup
    shuffle (the "report at the stab point" trick from interval-tree
    literature).  Same domain contract as point_in_interval_join:
    non-negative integral bounds; inverted intervals are dropped."""
    left = left.filter(F.col(l_end) >= F.col(l_start))
    right = right.filter(F.col(r_end) >= F.col(r_start))
    lb = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{l_start} div {bucket_width}"),
                F.expr(f"{l_end} div {bucket_width}"),
            )
        ),
    )
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{r_start} div {bucket_width}"),
                F.expr(f"{r_end} div {bucket_width}"),
            )
        ),
    )
    first_shared = F.expr(
        f"greatest({l_start}, {r_start}) div {bucket_width}"
    )
    return (
        lb.join(rb, "_bkt")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bkt") == first_shared)
        )
        .drop("_bkt")
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end``.  The three columns must be integral and
    NON-NEGATIVE (epoch days/millis etc. — cast dates before calling;
    ``div`` truncates toward zero, so negative coordinates would fold
    buckets -w..w-1 together).  Inverted intervals (end < start) match
    nothing and are dropped before the explode — Spark's ``sequence``
    would otherwise silently generate a DESCENDING bucket list for
    them.  Returns the combined columns; duplicate-free by
    construction.

    ``how`` accepts ``inner`` and ``left`` only.  For ``left``, the
    range predicate is part of the JOIN CONDITION, not a post-join
    filter — a post-join filter on interval columns would silently
    drop the null-extended rows an outer join exists to keep (the
    round-5 advisor footgun).  Both modes still plan as a hash equi-
    join on the bucket id with the range check as the join residual,
    never BroadcastNestedLoopJoin."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: only 'inner' and 'left' keep correct range "
            "semantics (semi/anti would drop the interval columns the "
            "residual predicate needs)"
        )
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    p = points.withColumn(
        "_bkt", F.expr(f"{point_col} div {bucket_width}")
    )
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_width}"),
                F.expr(f"{end_col} div {bucket_width}"),
            )
        ),
    )
    if how == "inner":
        return (
            p.join(i, "_bkt")
            .filter(
                (F.col(point_col) >= F.col(start_col))
                & (F.col(point_col) <= F.col(end_col))
            )
            .drop("_bkt")
        )
    # left outer: fold the residual into the condition so unmatched
    # points survive as one null-extended row (their single bucket
    # joins at most one exploded copy of any qualifying interval, so
    # matched pairs stay duplicate-free exactly as in inner mode)
    i = i.withColumnRenamed("_bkt", "_bkt_i")
    cond = (
        (p["_bkt"] == i["_bkt_i"])
        & (p[point_col] >= i[start_col])
        & (p[point_col] <= i[end_col])
    )
    return p.join(i, cond, "left").drop("_bkt", "_bkt_i")

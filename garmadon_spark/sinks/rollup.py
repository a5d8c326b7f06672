"""Continuous-aggregate maintenance: a materialized rollup table kept
current by partition-scoped merges — history is never rescanned.

The dashboard surface reads hourly/terms aggregates; at 100 TB/day
recomputing them from raw events for every panel load is the cost
center.  The standard fix (TimescaleDB continuous aggregates,
Druid/Pinot rollup segments) is a materialized partial-aggregate table
refreshed incrementally.  Spark-native form:

- The rollup stores RE-AGGREGABLE partials (count/sum/min/max) keyed by
  (day, bucket, group) — never avg or percentiles, which don't merge.
  Derived metrics (avg = sum/count) are computed at read time.
- Maintenance aggregates ONLY the increment, unions it with the
  existing partials of the DAYS THE INCREMENT TOUCHES (a
  partition-pruned read — late events reopen exactly their day), and
  rewrites those day partitions via dynamic partition overwrite.
  Untouched history is neither read nor written.
- Work per refresh = O(increment) + O(rollup rows of touched days);
  rollup rows are bucket-granular (24 × groups per day), so the merge
  side is dashboard-sized regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, path: str):
    """FileSystem handle + Path, resolved through Hadoop's FS API — the
    probe works for file://, hdfs://, s3a://, abfss:// alike.  A driver
    -local ``os.path`` probe silently returns False on remote stores,
    which would clobber the merge-with-existing read into a plain
    overwrite and let foreachBatch replay markers never dedupe (the
    round-5 advisor finding)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _has_partitions(spark: SparkSession, path: str,
                    part_col: str) -> bool:
    """Does ``path`` already hold ``{part_col}=`` partitions?  Through
    the Hadoop FS API — os.path silently answers False on hdfs://s3a://
    paths, which would turn every merge-with-existing fold into an
    overwrite (the round-5 advisor finding; corpus's datasheet fold
    shares this probe for the same reason)."""
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return False
    return any(
        st.getPath().getName().startswith(f"{part_col}=")
        for st in fs.listStatus(jpath)
    )


def _has_day_partitions(spark: SparkSession, path: str) -> bool:
    return _has_partitions(spark, path, "day")


def _write_marker(spark: SparkSession, marker: str,
                  run_id: str | None = None) -> None:
    """Commit marker.  With ``run_id`` the marker records WHICH
    streaming incarnation committed it (the checkpoint's query id), so
    a sink restarted over the same output path with a FRESH checkpoint
    — which re-numbers batches from 0 — can tell its own markers from
    a dead incarnation's and recompute instead of silently skipping
    colliding batch ids."""
    fs, jpath = _hadoop_fs(spark, marker)
    out = fs.create(jpath, True)  # mkdirs parents implicitly
    try:
        body = b"done" if run_id is None else f"done:{run_id}".encode()
        out.write(bytearray(body))
    finally:
        out.close()


def _read_marker(spark: SparkSession, marker: str) -> str | None:
    """Marker content, or None if absent."""
    fs, jpath = _hadoop_fs(spark, marker)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        try:
            # one JVM call for the whole (tiny) file — commons-io ships
            # on Spark's classpath via hadoop-common
            data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream
            )
            return bytes(data).decode()
        except Exception:
            # the fast path may have consumed part of the stream before
            # failing; restart from the top or the fallback would return
            # a silently TRUNCATED marker — which _marker_run_id reads
            # as a legacy own marker, the exact misread the run-scoped
            # guards exist to prevent.  FSDataInputStream is seekable.
            stream.seek(0)
            buf = bytearray()           # slow per-byte fallback
            while True:
                b = stream.read()
                if b < 0:
                    break
                buf.append(b)
            return buf.decode()
    finally:
        stream.close()


def _list_markers(spark: SparkSession, marker_dir: str) -> list:
    """``.done`` marker paths under ``marker_dir`` through the Hadoop
    FS API — NOT os.listdir, which silently sees nothing on
    hdfs://s3a:// paths and would turn every guard built on this
    listing into a no-op off the local filesystem."""
    fs, jpath = _hadoop_fs(spark, marker_dir)
    if not fs.exists(jpath):
        return []
    return sorted(
        str(st.getPath())
        for st in fs.listStatus(jpath)
        if st.getPath().getName().endswith(".done")
    )


def _refuse_foreign_chain(
    spark: SparkSession, marker_dir: str, run_id: str | None, hint: str,
    allow_foreign: bool = False,
) -> None:
    """Fail LOUD, not open, when a sink cannot prove the existing
    marker set is safe to act on:

    - markers exist but THIS incarnation's run id is unreadable
      (checkpoint metadata missing/unparseable) ⇒ own-vs-dead markers
      are indistinguishable and both skip-and-lose and
      recompute-and-duplicate are possible — refuse rather than
      silently reverting to unscoped presence-skip semantics;
    - markers recorded by a DIFFERENT incarnation ⇒ a fresh checkpoint
      is re-numbering batches over someone else's chain (skip loses
      rows, re-fold double-counts) — refuse with the remediation.
      ``allow_foreign=True`` skips this second check for sinks whose
      batches are independent and idempotently overwritten (the ANN
      serving results): there a foreign marker is simply recomputed.

    Bare legacy ``done`` markers (no recorded run) are accepted as own
    — the upgrade path for deployments resuming their original
    checkpoint.

    Cost: O(1) marker READS on the common path, not O(total batches
    ever).  This check runs on an incarnation's FIRST batch, before it
    commits anything — so a passing incarnation only ever adds its OWN
    run id to a set it verified as own/legacy, and (as long as every
    writer run-scopes) the marker set is always {legacy} ∪ {exactly
    one run id}, with the numerically-newest marker belonging to the
    most recent run-scoped writer: reading it alone decides
    own-vs-foreign.  Two escapes keep the guard exhaustive where that
    invariant can't be trusted: a newest marker that turns out to be
    LEGACY (a pre-run-scoping build may have resumed the checkpoint
    AFTER a scoped incarnation, burying foreign scoped markers behind
    bare ones) falls back to scanning every marker, and non-numeric
    marker names (none are written today) are always read rather than
    silently trusted."""
    markers = _list_markers(spark, marker_dir)
    if not markers:
        return
    if run_id is None:
        raise RuntimeError(
            f"{marker_dir} holds committed batches but this query's "
            "run id could not be read from its checkpoint metadata; "
            "refusing to act on a marker set of unknown ownership. "
            + hint
        )
    if allow_foreign:
        return

    def _raise_foreign(m, rec):
        raise RuntimeError(
            f"{marker_dir} holds batches committed by a different "
            f"streaming incarnation ({m.rsplit('/', 1)[-1]}: run "
            f"{rec}); " + hint
        )

    numeric = [m for m in markers
               if m.rsplit("/", 1)[-1][: -len(".done")].isdigit()]
    check = [m for m in markers if m not in set(numeric)]
    newest = None
    if numeric:
        newest = max(
            numeric,
            key=lambda m: int(m.rsplit("/", 1)[-1][: -len(".done")]),
        )
        rec = _marker_run_id(_read_marker(spark, newest))
        if rec is not None and rec != run_id:
            _raise_foreign(newest, rec)
        if rec is None:
            # newest is legacy: the one-run-id invariant may not hold
            # (mixed-version history) — scan the rest
            check += [m for m in numeric if m != newest]
    for m in check:
        rec = _marker_run_id(_read_marker(spark, m))
        if rec is not None and rec != run_id:
            _raise_foreign(m, rec)


def _marker_run_id(content: str | None) -> str | None:
    """The run id a marker recorded, or None for absent / legacy
    (pre-run-id ``done``) markers."""
    if content is not None and content.startswith("done:"):
        return content[len("done:"):]
    return None


def _marker_current(spark: SparkSession, marker: str,
                    run_id: str | None) -> bool:
    """True iff the marker exists AND belongs to this incarnation.
    Legacy ``done`` markers (written before run scoping) are treated
    as current — the upgrade path for live deployments resuming their
    original checkpoint."""
    content = _read_marker(spark, marker)
    if content is None:
        return False
    recorded = _marker_run_id(content)
    return recorded is None or run_id is None or recorded == run_id


def _checkpoint_run_id(spark: SparkSession, checkpoint: str) -> str | None:
    """The streaming query id Spark pins inside the checkpoint's
    ``metadata`` file — STABLE across restarts of the same checkpoint,
    fresh for a new one.  None until the query's first start (the
    file is written by StreamExecution before batch 0) or if the
    checkpoint layout is unreadable."""
    import json as _json

    try:
        content = _read_marker(spark, f"{checkpoint}/metadata")
        if content is None:
            return None
        return _json.loads(content).get("id")
    except Exception:
        return None


def build_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """The rollup shape: (day, bucket, groups) → mergeable partials.
    One shuffle on the rollup key; map-side partial aggregation does
    the heavy reduction before it."""
    return (
        events.groupBy(
            F.to_date(F.col(ts_col)).alias("day"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
            *group_cols,
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def _merge_partials(
    partials: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    return partials.groupBy("day", "bucket", *group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def maintain_rollup(
    spark: SparkSession,
    increment: DataFrame,
    path: str,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    bucket: str = "hour",
) -> list:
    """Fold one increment (today's batch, a late-data redelivery, a
    backfill) into the materialized rollup at ``path``.  Returns the
    day partitions that were rewritten.

    The day list is collected driver-side — it is partition-count
    sized, the same contract as archive.committed_offsets.  Dynamic
    partition overwrite replaces exactly the touched day directories;
    concurrent readers keep seeing committed files."""
    inc = build_rollup(increment, ts_col, group_cols, value_col, bucket)
    return _fold_partials(
        spark, inc, path, lambda p: _merge_partials(p, group_cols)
    )


def _fold_partials(spark, inc: DataFrame, path: str, merge_fn) -> list:
    """Shared maintenance core: merge the increment's partials with the
    existing partials of the touched days, dynamic-overwrite exactly
    those day partitions."""
    days = [r.day for r in inc.select("day").distinct().collect()]
    if _has_day_partitions(spark, path):
        # align column order; the partition column comes back last
        existing = spark.read.parquet(path).filter(
            F.col("day").isin(days)
        ).select(*inc.columns)
        merged = merge_fn(existing.unionByName(inc))
    else:
        merged = inc
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("day")
            .write.partitionBy("day")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return days


def build_histogram_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    bin_width: float = 10.0,
    bucket: str = "hour",
) -> DataFrame:
    """The Prometheus-histogram partial: per (day, bucket, group,
    value-bin) observation counts.  Bin counts are the ONLY percentile
    representation that merges exactly (sum the bins) — avg/percentile
    partials don't — so this is what a rollup stores when dashboards
    need p95 without rescanning events.  Bin error is bounded by
    bin_width by construction."""
    bin_col = (F.floor(F.col(value_col) / bin_width)).cast("long")
    return (
        events.groupBy(
            F.to_date(F.col(ts_col)).alias("day"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
            *group_cols,
            bin_col.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def maintain_histogram_rollup(
    spark: SparkSession,
    increment: DataFrame,
    path: str,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    bin_width: float = 10.0,
    bucket: str = "hour",
) -> list:
    """Fold an increment into the materialized histogram rollup — same
    partition-scoped merge discipline as maintain_rollup, the merge
    being a plain sum of bin counts."""
    inc = build_histogram_rollup(
        increment, ts_col, group_cols, value_col, bin_width, bucket
    )

    def merge(partials: DataFrame) -> DataFrame:
        return partials.groupBy(
            "day", "bucket", *group_cols, "bin"
        ).agg(F.sum("cnt").alias("cnt"))

    return _fold_partials(spark, inc, path, merge)


def histogram_quantile(
    hist: DataFrame,
    q: float,
    bin_width: float = 10.0,
    group_cols: tuple[str, ...] = ("event_type",),
    per_bucket: bool = True,
) -> DataFrame:
    """Prometheus ``histogram_quantile(q, ...)``: estimate the
    q-quantile from bin counts by linear interpolation inside the
    target bin.  Exact rank semantics up to bin resolution — the
    estimate is always within bin_width of the true value.

    Runs entirely over the rollup (bin-cardinality rows): one window
    for the cumulative counts, one aggregate for the pick — never
    touches raw events."""
    keys = ([*group_cols, "bucket"] if per_bucket else list(group_cols))
    # collapse away any extra rollup dimensions (day, or bucket when
    # per_bucket=False): the walk needs exactly one row per (key, bin)
    hist = hist.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy(*keys).agg(F.sum("cnt").alias("total"))

    ranked = cum.join(tot, keys).withColumn(
        "rank", F.lit(q) * F.col("total")
    )
    hit = ranked.filter(F.col("cum") >= F.col("rank"))
    first_hit = hit.groupBy(*keys).agg(
        F.min_by(F.struct("bin", "cnt", "cum", "rank"), "bin").alias("h")
    )
    lower = F.col("h.bin") * bin_width
    frac = (
        (F.col("h.rank") - (F.col("h.cum") - F.col("h.cnt")))
        / F.col("h.cnt")
    )
    est = lower + F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), frac)
    ) * bin_width
    return first_hit.select(
        *keys, F.round(est, 4).alias(f"p{int(q * 100)}_est")
    )


def build_distinct_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    id_col: str = "user_id",
    bucket: str = "hour",
    lg_k: int = 12,
) -> DataFrame:
    """The cardinality partial: a Datasketches HLL sketch per (day,
    bucket, group) — COUNT(DISTINCT) does not merge across partials,
    sketches do (union), which is what lets a rollup answer "distinct
    users this week" from per-hour rows without ever rescanning events.
    ``lg_k=12`` ⇒ ~1.6 % rsd in ~2.5 KiB per cell."""
    return (
        events.groupBy(
            F.to_date(F.col(ts_col)).alias("day"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
            *group_cols,
        )
        .agg(F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("hll"))
    )


def maintain_distinct_rollup(
    spark: SparkSession,
    increment: DataFrame,
    path: str,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    id_col: str = "user_id",
    bucket: str = "hour",
    lg_k: int = 12,
) -> list:
    """Fold an increment into the materialized sketch rollup: the merge
    is hll_union_agg over the sketch column — same partition-scoped
    discipline as the scalar/histogram rollups."""
    inc = build_distinct_rollup(
        increment, ts_col, group_cols, id_col, bucket, lg_k
    )

    def merge(partials: DataFrame) -> DataFrame:
        return partials.groupBy("day", "bucket", *group_cols).agg(
            F.hll_union_agg("hll", F.lit(True)).alias("hll")
        )

    return _fold_partials(spark, inc, path, merge)


def distinct_estimate(
    sketches: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Roll sketch cells up to any coarser grain (drop day/bucket from
    ``group_cols`` to widen the window) and estimate: one union
    aggregate over sketch-sized rows, then hll_sketch_estimate."""
    return (
        sketches.groupBy(*group_cols)
        .agg(F.hll_union_agg("hll", F.lit(True)).alias("hll"))
        .select(
            *group_cols,
            F.hll_sketch_estimate("hll").alias("distinct_est"),
        )
    )


def rollup_query(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    bucket: str = "hour",
    available_now: bool = True,
):
    """The continuous aggregate fed by the stream itself: every
    micro-batch folds into the materialized rollup via
    ``maintain_rollup`` inside ``foreachBatch`` — the Structured
    Streaming idiom for sinks that need a merge, not an append.

    Replay semantics, honestly: foreachBatch is at-least-once, and a
    MERGE sink is not naturally idempotent — re-folding a replayed
    batch would double-count its partials.  A per-batch marker file
    under ``path/_rollup_batches`` (probed and written through the
    Hadoop FS API, so the dedup works on hdfs://s3a:// paths too)
    skips batches already folded, narrowing the double-count window to
    a crash BETWEEN the partition commit and the marker write.
    Closing that window needs a transactional table format
    (Delta/Iceberg MERGE) — the documented production swap, same trade
    recorded for W8 in sinks/archive.py.  Returns the started
    StreamingQuery.

    Markers are run-scoped (the checkpoint's query id): a FRESH
    checkpoint over a rollup another incarnation folded is REFUSED on
    its first batch — the fold CHAINS state, so re-numbered batch ids
    would either be skipped (losing their rows) or re-folded
    (double-counting).  Resume the original checkpoint or rebuild the
    rollup; bare legacy ``done`` markers are accepted as own (the
    upgrade path)."""
    cache: dict = {}

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        if "run" not in cache:
            cache["run"] = _checkpoint_run_id(sess, checkpoint)
            _refuse_foreign_chain(
                sess, f"{path}/_rollup_batches", cache["run"],
                "resume its original checkpoint or rebuild the rollup",
            )
        marker = f"{path}/_rollup_batches/{batch_id}.done"
        if _marker_current(sess, marker, cache["run"]):
            return
        maintain_rollup(
            sess, batch_df, path,
            ts_col, group_cols, value_col, bucket,
        )
        _write_marker(sess, marker, cache["run"])

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Dashboard-facing view of the rollup: partials plus the derived
    mean.  Filters on day/bucket prune partitions before any IO."""
    df = spark.read.parquet(path)
    return df.select(
        "day", "bucket", *group_cols, "cnt", "sum_value", "min_value",
        "max_value",
        F.round(F.col("sum_value") / F.col("cnt"), 4).alias("avg_value"),
    )

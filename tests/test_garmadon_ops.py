"""Operator unit tests on the synthetic garmadon event fixture —
the reference's per-operator test strategy (SURVEY §5) in Spark form."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from garmadon_spark.operators import bucketing, enrich, flatten, jvmstats, normalize
from garmadon_spark.sources import fixtures


@pytest.fixture(scope="module")
def garmadon(spark):
    return fixtures.to_spark(spark, n_apps=4, seed=7)


# --- fixture invariants ---------------------------------------------------

def test_every_container_gets_end_marker(garmadon):
    containers = set()
    for name, df in garmadon.items():
        if name == "application_event":
            continue
        for r in df.select("container_id").distinct().collect():
            if r.container_id:
                containers.add(r.container_id)
    ends = {
        r.container_id
        for r in garmadon["state_event"]
        .filter(F.col("state") == "END")
        .select("container_id")
        .distinct()
        .collect()
    }
    assert containers == ends


def test_offsets_monotone_and_replayed(spark, garmadon):
    union = None
    for df in garmadon.values():
        part = df.select("kafka_partition", "kafka_offset")
        union = part if union is None else union.unionByName(part)
    # replay duplicates exist (invariant 3) …
    total = union.count()
    distinct = union.distinct().count()
    assert total > distinct
    # … and offsets are unique per partition once deduped
    per_off = union.groupBy("kafka_partition", "kafka_offset").count()
    assert per_off.filter(F.col("count") > 2).count() == 0


# --- flatten (E1/E2) ------------------------------------------------------

def test_materialize_defaults(spark):
    df = spark.createDataFrame(
        [Row(a=None, b=None, c=None)],
        "a: string, b: long, c: array<string>",
    )
    out = flatten.materialize_defaults(df).collect()[0]
    assert out.a == "" and out.b == 0 and out.c == []


def test_clamp_neg_infinity(spark):
    df = spark.createDataFrame([(float("-inf"), 1.5)], "x: double, y: double")
    out = flatten.clamp_neg_infinity(df).collect()[0]
    assert out.x == -1.7976931348623157e308 and out.y == 1.5


def test_flatten_nested_header_body(spark):
    df = spark.createDataFrame(
        [Row(header=Row(application_id="a1", id="k"), body=Row(path="/p"),
             timestamp=1, kafka_offset=2)]
    )
    out = flatten.flatten_event(df)
    assert set(out.columns) == {"application_id", "path", "timestamp", "kafka_offset"}


# --- normalize (E5/E9) ----------------------------------------------------

def test_uniformize_uri_port_strip_and_mapping(spark):
    df = spark.createDataFrame(
        [("hdfs://root2.example.com:8020",), ("hdfs://nameservice1:8020",),
         ("hdfs://other:9000",)],
        "uri: string",
    )
    mapping = {"hdfs://root2.example.com": "hdfs://root"}
    out = df.select(
        normalize.uniformize_uri("uri", mapping).alias("u")
    ).collect()
    assert [r.u for r in out] == [
        "hdfs://root", "hdfs://nameservice1", "hdfs://other"]


def test_strip_uri_prefix_not_anchored(spark):
    # String.replace semantics (GarmadonMessage.java:80-81): every
    # occurrence, not only a prefix.
    df = spark.createDataFrame(
        [("hdfs://ns/u/hdfs://ns/x", "hdfs://ns")], "p: string, u: string"
    )
    out = df.select(
        normalize.strip_uri_prefix("p", F.col("u")).alias("p")
    ).collect()[0]
    assert out.p == "/u//x"


def test_normalize_fs_event_roundtrip(garmadon):
    out = normalize.normalize_fs_event(
        garmadon["fs_event"],
        mapping={"hdfs://root2.example.com": "hdfs://root"},
    )
    rows = out.select("uri", "dst_path").collect()
    for r in rows:
        assert ":8020" not in r.uri
        assert not r.dst_path.startswith("hdfs://")


def test_parse_yarn_tags(spark):
    df = spark.createDataFrame(
        [Row(yarn_tags=["garmadon.project.name:p1",
                        "garmadon.workflow.name:wf", "adhoc"])]
    )
    out = normalize.parse_yarn_tags(df).collect()[0]
    assert out.project_name_parsed == "p1"
    assert out.workflow_name_parsed == "wf"
    assert out.yarn_tags == ["adhoc"]


# --- jvmstats explode (E3/E4) --------------------------------------------

def test_explode_heap_typed(garmadon):
    out = jvmstats.explode_heap(garmadon["jvmstats_event"])
    r = out.select("heap_init", "heap_committed", "heap_used", "heap_max").first()
    assert r.heap_max == 4 * 2 ** 30
    assert 0 < r.heap_used <= r.heap_max
    assert r.heap_init == r.heap_max // 2


def test_flatten_sections_es_fallback(garmadon):
    out = jvmstats.flatten_sections_es(garmadon["jvmstats_event"])
    r = out.select("section_props").first().section_props
    assert "heap_used" in r and "safepoints_count" in r
    # numeric parse happens at read via try_cast; non-numeric kept as string
    assert r["class_vendor"] == "HotSpot(TM)"
    assert "disk_sda_reads" not in r  # device sections excluded


def test_explode_os_devices(garmadon):
    out = jvmstats.explode_os_devices(garmadon["jvmstats_event"])
    devs = {r.device for r in out.select("device").distinct().collect()}
    assert devs == {"sda", "sdb", "eth0"}
    r = out.filter(F.col("device") == "eth0").first()
    assert r.event_type == "OS"
    assert set(r.metrics.keys()) == {"rx", "tx"}
    # one row per (event, device): sda/sdb/eth0 ⇒ 3× the event count
    assert out.count() == 3 * garmadon["jvmstats_event"].count()


# --- bucketing (E6/W4) ----------------------------------------------------

def test_buckets(spark):
    df = spark.createDataFrame([(1700000000000,)], "timestamp: long")
    r = bucketing.with_buckets(df).first()
    assert r.day == "2023-11-14" and r.hour == "2023-11-14-22"
    d = df.select(bucketing.delayed_day("timestamp").alias("d")).first().d
    assert d == "2023-11-13"  # 26 h earlier crosses the day boundary


# --- enrichment (J1/J2) ---------------------------------------------------

def test_enrich_latest_value_wins(spark):
    apps = spark.createDataFrame(
        [
            Row(application_id="a1", application_name="n1", framework="SPARK",
                username="u1", yarn_tags=["t"], project_name="p",
                workflow_name="w", am_container_id="c0", timestamp=100),
            Row(application_id="a1", application_name="n2", framework="SPARK",
                username="u1", yarn_tags=["t"], project_name="p",
                workflow_name="w", am_container_id="c0", timestamp=200),
        ]
    )
    events = spark.createDataFrame(
        [Row(application_id="a1", application_name="", framework="",
             username="", container_id="c9", timestamp=150)]
    )
    out = enrich.enrich_with_app_metadata(events, apps).collect()[0]
    assert out.application_name == "n2"  # latest app event wins


def test_component_resolution(spark):
    apps = spark.createDataFrame(
        [Row(application_id="a1", am_container_id="c0", timestamp=1)]
    )
    events = spark.createDataFrame(
        [
            Row(application_id="a1", container_id="c0", component="UNKNOWN"),
            Row(application_id="a1", container_id="c1", component="UNKNOWN"),
            Row(application_id="a1", container_id="c1", component="EXECUTOR"),
        ]
    )
    out = {(r.container_id, r.component)
           for r in enrich.resolve_component(events, apps).collect()}
    assert out == {("c0", "APP_MASTER"), ("c1", "APP_SLAVE"),
                   ("c1", "EXECUTOR")}


def test_enrichment_is_broadcast(garmadon):
    out = enrich.enrich_with_app_metadata(
        garmadon["fs_event"], garmadon["application_event"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_wide_event_table_union(garmadon):
    from garmadon_spark.operators.flatten import wide_event_table

    dfs = {k: v for k, v in garmadon.items()
           if k in ("fs_event", "gc_event", "state_event")}
    wide = wide_event_table(dfs)
    # every source row survives; discriminator partitions them back
    total = sum(df.count() for df in dfs.values())
    assert wide.count() == total
    by_type = {r.event_type: r.c for r in
               wide.groupBy("event_type").agg(
                   F.count(F.lit(1)).alias("c")).collect()}
    assert by_type == {k.upper(): v.count() for k, v in dfs.items()}
    # missing body columns are null-filled, shared header survives
    assert "action" in wide.columns and "collector_name" in wide.columns
    gc_rows = wide.filter(F.col("event_type") == "GC_EVENT")
    assert gc_rows.filter(F.col("action").isNotNull()).count() == 0


def test_enrich_as_of_semantics(spark):
    """AS-OF enrichment: greatest state-ts ≤ event-ts per key, INCLUSIVE
    at equality (state sorts before the event), null before the first
    state, carry-forward between states."""
    from garmadon_spark.operators.enrich import enrich_as_of

    states = spark.createDataFrame(
        [("a", 10, "NEW"), ("a", 20, "RUNNING"), ("b", 5, "NEW")],
        "application_id string, timestamp long, state string",
    )
    events = spark.createDataFrame(
        [("a", 9, "e1"), ("a", 10, "e2"), ("a", 15, "e3"),
         ("a", 25, "e4"), ("b", 4, "e5")],
        "application_id string, timestamp long, container_id string",
    )
    out = {
        r.container_id: r.state_asof
        for r in enrich_as_of(
            events, states, payload_cols=("container_id",)
        ).collect()
    }
    assert out == {"e1": None, "e2": "NEW", "e3": "NEW",
                   "e4": "RUNNING", "e5": None}
    # forward direction: smallest state-ts >= event-ts, inclusive
    fwd = {
        r.container_id: r.state_asof
        for r in enrich_as_of(
            events, states, payload_cols=("container_id",),
            direction="forward",
        ).collect()
    }
    assert fwd == {"e1": "NEW", "e2": "NEW", "e3": "RUNNING",
                   "e4": None, "e5": "NEW"}


def test_decode_all_covers_every_marker(spark):
    """Every one of the 20 registered markers decodes through the wire
    codec (encode_frame → decode_frames → decode_all) with a fixture row
    for its family — the GarmadonSerialization registry parity check
    (GarmadonSerialization.java:52-101)."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    from garmadon_spark import schemas
    from garmadon_spark.sources import fixtures
    from garmadon_spark.sources.frames import decode_frames, decode_all, \
        encode_frame

    tables = fixtures.generate(n_apps=8, seed=42)
    header_keys = {f.name for f in schemas.HEADER.fields}
    frames = []
    covered = set()
    for tname, rows in tables.items():
        assert rows, f"fixture family {tname} generated no rows"
        e = schemas.BY_NAME[fixtures.NAME_MAP[tname]]
        row = rows[0]
        header = {k: v for k, v in row.items() if k in header_keys}
        body = {
            f.name: row.get(f.name) for f in e.body.fields
            if row.get(f.name) is not None
        }
        frames.append(
            (bytearray(encode_frame(e.marker, row["timestamp"], header,
                                    body)),)
        )
        covered.add(e.marker)
    assert covered == set(schemas.REGISTRY) - {9901}, \
        "fixtures must cover every built-in marker"
    assert len(covered) >= 20
    df = spark.createDataFrame(
        frames, StructType([StructField("value", BinaryType())])
    )
    typed = decode_all(decode_frames(df))
    for tname, rows in tables.items():
        name = fixtures.NAME_MAP[tname]
        got = typed[name].select("header.application_id", "timestamp")
        r = got.head()
        assert r is not None, f"{name} frame did not decode"
        assert r.timestamp == rows[0]["timestamp"]
        assert r.application_id == rows[0]["application_id"]


def test_register_custom_event_type_roundtrip(spark):
    """§2.11 extension surface: a user-registered event type flows
    through the frame codec and typed decode like a built-in."""
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    from garmadon_spark import schemas
    from garmadon_spark.sources.frames import (
        decode_frames, decode_typed, encode_frame,
    )

    marker = 9901
    if marker not in schemas.REGISTRY:
        schemas.register(
            marker, "CUSTOM_TEST_EVENT",
            StructType([StructField("metric", StringType()),
                        StructField("reading", LongType())]),
        )
    frame = encode_frame(
        marker, 1700000000123,
        {"application_id": "app_x", "container_id": "c1"},
        {"metric": "gauge", "reading": 42},
    )
    df = spark.createDataFrame(
        [(bytearray(frame),)],
        StructType([StructField("value", BinaryType())]),
    )
    typed = decode_typed(decode_frames(df), marker)
    r = typed.select("header.application_id", "body.metric",
                     "body.reading", "timestamp").head()
    assert tuple(r) == ("app_x", "gauge", 42, 1700000000123)
    # full_schema includes the registered body + kafka coords
    cols = [f.name for f in schemas.full_schema("CUSTOM_TEST_EVENT").fields]
    assert {"metric", "reading", "timestamp", "kafka_offset"} <= set(cols)


def test_clone_and_override_header_semantics(spark):
    """E8 Header.cloneAndOverride parity: an override VALUE wins over
    the base, a null override keeps the base (coalesce semantics), and
    a Column override applies per row."""
    df = spark.createDataFrame(
        [Row(application_id="app_1", framework="SPARK", executor_id=None),
         Row(application_id="app_2", framework=None, executor_id="e7")],
    )
    out = {r.application_id: r for r in flatten.clone_and_override(
        df,
        framework="FLINK",
        executor_id=F.when(F.col("application_id") == "app_1",
                           F.lit("driver")),
    ).collect()}
    assert out["app_1"].framework == "FLINK"     # literal override wins
    assert out["app_2"].framework == "FLINK"     # even over null base
    assert out["app_1"].executor_id == "driver"  # per-row Column override
    assert out["app_2"].executor_id == "e7"      # null override keeps base


def test_with_event_time_derives_timestamp(spark):
    df = spark.createDataFrame([Row(timestamp=1_700_000_000_123)])
    r = flatten.with_event_time(df).head()
    assert r.event_time.year == 2023 and r.event_time.microsecond == 123000

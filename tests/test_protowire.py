"""Protobuf wire codec tests — writer verified by an independent reader
(no protobuf wheel needed); Spark-side decode gated on the connector."""

from __future__ import annotations

import struct

import pytest

from garmadon_spark import schemas
from garmadon_spark.sources import protowire as pw


def test_varint_roundtrip_edges():
    for n in (0, 1, 127, 128, 300, 2 ** 31 - 1, 2 ** 63 - 1, -1, -42):
        enc = pw._varint(n)
        dec = pw.decode_message(pw._tag(1, 0) + enc)[1][0]
        want = n if n >= 0 else n + (1 << 64)
        assert dec == want


def test_encode_message_field_numbers_and_values():
    body = {
        "src_path": "", "dst_path": "/tmp/x", "action": "WRITE",
        "uri": "hdfs://ns", "method_duration_millis": 300,
        "hdfs_user": "u1", "status": "SUCCESS",
    }
    raw = pw.encode_message(schemas.FS_EVENT_BODY, body)
    fields = pw.decode_message(raw)
    # proto3 elision: empty src_path (field 1) omitted
    assert 1 not in fields
    assert fields[2][0].decode() == "/tmp/x"
    assert fields[3][0].decode() == "WRITE"
    assert fields[5][0] == 300      # varint int64
    assert fields[7][0].decode() == "SUCCESS"


def test_encode_nested_sections():
    body = {
        "section": [
            {"name": "heap", "property": [
                {"name": "used", "value": "123"},
                {"name": "max", "value": "456"},
            ]},
            {"name": "threads", "property": [{"name": "count",
                                             "value": "7"}]},
        ]
    }
    raw = pw.encode_message(schemas.JVMSTATS_EVENT_BODY, body)
    sections = pw.decode_message(raw)[1]
    assert len(sections) == 2
    heap = pw.decode_message(sections[0])
    assert heap[1][0].decode() == "heap"
    props = [pw.decode_message(p) for p in heap[2]]
    assert props[0][1][0].decode() == "used"
    assert props[1][2][0].decode() == "456"


def test_double_and_float_wire_types():
    raw = pw.encode_message(schemas.GC_EVENT_BODY,
                            {"pause_time": 5, "gc_pause_ratio_1_min": 2.5})
    fields = pw.decode_message(raw)
    # gc_pause_ratio_1_min is field 14, FloatType → 4-byte I32
    assert struct.unpack("<f", fields[14][0])[0] == pytest.approx(2.5)


def test_descriptor_set_structure():
    """The hand-built FileDescriptorSet parses as valid nested TLVs:
    one file, package 'garmadon', one message per registered body + the
    Header."""
    ds = pw.decode_message(pw.build_descriptor_set())
    files = ds[1]
    assert len(files) == 1
    fdp = pw.decode_message(files[0])
    assert fdp[1][0].decode() == "garmadon_events.proto"
    assert fdp[2][0].decode() == "garmadon"
    assert fdp[12][0].decode() == "proto3"
    messages = [pw.decode_message(m) for m in fdp[4]]
    names = {m[1][0].decode() for m in messages}
    builtin = {e.name for e in schemas.REGISTRY.values()
               if e.marker < 9000}  # exclude test-registered customs
    assert {"Header"} | builtin <= names
    # every field entry carries name+number+label+type
    for m in messages:
        for fd in m.get(2, []):
            parsed = pw.decode_message(fd)
            assert 1 in parsed and 3 in parsed and 4 in parsed and 5 in parsed


def test_descriptor_set_parses_with_protobuf_wheel():
    """Where the google.protobuf wheel exists, the descriptor set must
    load as a real FileDescriptorSet (skips in wheel-less containers)."""
    descriptor_pb2 = pytest.importorskip(
        "google.protobuf.descriptor_pb2")
    fds = descriptor_pb2.FileDescriptorSet.FromString(
        pw.build_descriptor_set())
    assert fds.file[0].package == "garmadon"
    names = {m.name for m in fds.file[0].message_type}
    assert "Header" in names and "FS_EVENT" in names


def test_frame_proto_roundtrip_via_spark(spark):
    """Full wire fidelity where the spark-protobuf connector exists:
    encode_frame_proto → decode_frames_binary → from_protobuf equals the
    JSON payload path.  Skips where the connector jar is absent."""
    if not pw.protobuf_capable(spark):
        pytest.skip("spark-protobuf connector not on the classpath")
    from pyspark.sql.types import BinaryType, StructField, StructType

    header = {"application_id": "app_p", "attempt_id": "1",
              "container_id": "c9", "tags": ["YARN_APPLICATION"]}
    body = {"dst_path": "/tmp/y", "action": "READ", "uri": "hdfs://ns",
            "method_duration_millis": 12, "hdfs_user": "u",
            "status": "SUCCESS"}
    frame = pw.encode_frame_proto(1, 1700000000123, header, body)
    df = spark.createDataFrame(
        [(bytearray(frame),)],
        StructType([StructField("value", BinaryType())]),
    )
    typed = pw.decode_typed_proto(pw.decode_frames_binary(df), 1)
    r = typed.select("header.application_id", "header.tags", "body.action",
                     "body.method_duration_millis", "timestamp").head()
    assert r.application_id == "app_p"
    assert list(r.tags) == ["YARN_APPLICATION"]
    assert r.action == "READ"
    assert r.method_duration_millis == 12
    assert r.timestamp == 1700000000123

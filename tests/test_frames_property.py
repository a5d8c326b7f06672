"""Property-based wire-codec tests (hypothesis): encode→decode is the
identity for arbitrary payloads, including unicode and empty fields."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import BinaryType, StructField, StructType

from garmadon_spark.sources.frames import decode_frames, encode_frame

payload_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
header_dicts = st.fixed_dictionaries(
    {"application_id": payload_text, "container_id": payload_text}
)
body_dicts = st.fixed_dictionaries(
    {"src_path": payload_text, "action": payload_text,
     "method_duration_millis": st.integers(0, 2**53)}
)


@pytest.fixture(scope="module")
def frame_schema():
    return StructType([StructField("value", BinaryType())])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    marker=st.integers(0, 5005),
    ts=st.integers(0, 2**62),
    header=header_dicts,
    body=body_dicts,
)
def test_roundtrip_identity(spark, frame_schema, marker, ts, header, body):
    frame = encode_frame(marker, ts, header, body)
    df = spark.createDataFrame([(bytearray(frame),)], frame_schema)
    rows = decode_frames(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type_marker == marker
    assert r.timestamp == ts
    assert json.loads(r.header_json) == header
    assert json.loads(r.body_json) == body


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(junk=st.binary(min_size=0, max_size=40))
def test_corrupt_frames_never_surface(spark, frame_schema, junk):
    # arbitrary bytes either decode to a VALID self-consistent frame or
    # are filtered; decode never throws and never emits a length-
    # inconsistent row
    good = encode_frame(1, 123, {"a": "x"}, {"b": "y"})
    df = spark.createDataFrame(
        [(bytearray(junk),), (bytearray(good),)], frame_schema
    )
    rows = decode_frames(df).collect()
    assert any(r.type_marker == 1 and r.timestamp == 123 for r in rows)
    for r in rows:
        assert r.header_json is not None and r.body_json is not None

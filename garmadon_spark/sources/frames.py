"""Wire-frame codec (SURVEY §1.1, §2.1 S2/S3).

The reference's wire format (ProtocolMessage.java:27-42):

    int32 typeMarker | int64 timestampMillis | int32 headerLen |
    int32 bodyLen | headerBytes | bodyBytes

(big-endian, 20-byte head).  Decode is pure Column arithmetic —
``conv(hex(substring(...)))`` — so the whole parse stays inside
whole-stage codegen; no Python touches the hot path.

Corrupt frames (length mismatch, GarmadonReader.java:176-192's
drop-with-counter) are filtered out and counted via ``observe``.

Payload format: JSON by default; protobuf where the spark-protobuf
connector is on the classpath — ``sources/protowire.py`` ships the wire
writer, a hand-assembled descriptor set, and a ``from_protobuf``-backed
``decode_typed_proto`` behind ``protobuf_capable()`` (the reference is
protobuf end-to-end, ProtocolMessage.java:27-42).  Either way the
structural behaviors (type-gated lazy parse, malformed-drop, per-type
schema dispatch) are identical: ``from_json``/``from_protobuf`` per
type after a ``type_marker`` filter reproduces the reference's
lazy-deserialize ordering (GarmadonReader.java:198-226) — Catalyst
prunes the payload parse for rows the type filter rejects.

``encode_frames`` is the Python-side producer used by fixtures/tests
(the agent/forwarder side is out of scope per SURVEY)."""

from __future__ import annotations

import json
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from garmadon_spark.schemas import HEADER, REGISTRY

FRAME_HEAD_BYTES = 20


def encode_frame(
    marker: int, timestamp: int, header: dict, body: dict
) -> bytes:
    """Build one wire frame (test/fixture producer side)."""
    h = json.dumps(header, sort_keys=True).encode()
    b = json.dumps(body, sort_keys=True).encode()
    return struct.pack(">iqii", marker, timestamp, len(h), len(b)) + h + b


def _be_int(col: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from a binary slice — JVM-side."""
    return F.conv(F.hex(F.substring(col, pos, nbytes)), 16, 10)


def decode_frames(df: DataFrame, value_col: str = "value") -> DataFrame:
    """S2: binary frames → (type_marker, timestamp, header_json,
    body_json) with corrupt-frame filtering.

    Emits the ``garmadon.frames.corrupt`` observation counter (the
    reference's drop counter) on the returned DataFrame."""
    v = F.col(value_col)
    # try_cast, not cast: garbage bytes can parse as unsigned values
    # above the signed range (e.g. 0x80000000 → 2147483648) and an ANSI
    # cast would FAIL THE JOB on one corrupt record — the reference
    # drops such frames and counts them (GarmadonReader.java:176-192)
    parsed = df.select(
        *[c for c in df.columns if c != value_col],
        _be_int(v, 1, 4).try_cast("int").alias("type_marker"),
        _be_int(v, 5, 8).try_cast("long").alias("timestamp"),
        _be_int(v, 13, 4).try_cast("int").alias("header_len"),
        _be_int(v, 17, 4).try_cast("int").alias("body_len"),
        v.alias("_frame"),
    )
    valid = (
        F.col("type_marker").isNotNull()
        & F.col("timestamp").isNotNull()
        & F.col("header_len").isNotNull()
        & F.col("body_len").isNotNull()
        # long arithmetic: two garbage 4-byte lengths can each fit int32
        # yet SUM past it (e.g. 0x75CBDCEC twice) — int math here would
        # raise ARITHMETIC_OVERFLOW under ANSI mode and fail the job
        # instead of dropping the frame
        & (F.length("_frame").cast("long")
           == F.lit(FRAME_HEAD_BYTES).cast("long")
           + F.col("header_len").cast("long")
           + F.col("body_len").cast("long"))
    )
    observed = parsed.observe(
        "garmadon.frames",
        F.sum(F.when(~valid, 1).otherwise(0)).alias("corrupt"),
        F.count(F.lit(1)).alias("total"),
    )
    return observed.filter(valid).select(
        *[c for c in df.columns if c != value_col],
        "type_marker",
        "timestamp",
        F.expr(f"substring(_frame, {FRAME_HEAD_BYTES + 1}, header_len)")
        .cast("string")
        .alias("header_json"),
        F.expr(
            f"substring(_frame, {FRAME_HEAD_BYTES + 1} + header_len, body_len)"
        )
        .cast("string")
        .alias("body_json"),
    )


def decode_typed(frames: DataFrame, marker: int) -> DataFrame:
    """S3: lazy typed deserialize — type filter FIRST, then header/body
    JSON parse (Catalyst orders the cheap marker predicate before the
    parse, the built-in form of the reference's two-phase filters)."""
    e = REGISTRY[marker]
    return (
        frames.filter(F.col("type_marker") == marker)
        .select(
            F.from_json("header_json", HEADER).alias("header"),
            F.from_json("body_json", e.body).alias("body"),
            "timestamp",
            *[c for c in frames.columns
              if c not in ("type_marker", "timestamp", "header_json",
                           "body_json")],
        )
    )


def decode_all(frames: DataFrame) -> dict[str, DataFrame]:
    """Fan the heterogeneous stream out into one typed DataFrame per
    registered marker (the shared-topic → per-type-table split of the
    HDFS reader, ReaderFactory.java:212-240)."""
    return {e.name: decode_typed(frames, m) for m, e in REGISTRY.items()}

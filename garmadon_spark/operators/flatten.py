"""Flattening / projection operators (SURVEY §2.4 E1/E2/E7/E8).

The reference flattens header⊕body into one wide row, appending
``timestamp`` (+ ``kafka_offset`` in the proto variant) —
ProtoConcatenator.concatToMap/concatToProto (readers/common/.../protobuf/
ProtoConcatenator.java:36-106, append at :158-160).  Two semantics to
preserve:

- **proto3 default materialization** (``concatToMap`` with defaults, used
  for ES docs at ElasticSearchReader.java:120,130): absent scalars become
  0 / "" / empty array, NOT null.
- **-Inf clamp**: double ``-Infinity`` → ``-Double.MAX_VALUE``
  (ProtoConcatenator.java:99-103).

Everything is a Column expression — one projection node, folded into the
scan by Catalyst (column pruning keeps unreferenced body fields unread).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    NumericType,
    StringType,
    StructType,
)

_DOUBLE_MAX = 1.7976931348623157e308


def _default_for(field) -> object:
    if isinstance(field.dataType, NumericType):
        return 0
    if isinstance(field.dataType, StringType):
        return ""
    if isinstance(field.dataType, ArrayType):
        return F.array().cast(field.dataType)
    return None


def materialize_defaults(df: DataFrame, schema: StructType | None = None) -> DataFrame:
    """proto3 zero-value materialization: null → 0/""/[] per column type
    (ProtoConcatenator.java:81-106 with includeDefaultValue=true)."""
    schema = schema or df.schema
    cols = []
    for f in schema.fields:
        d = _default_for(f)
        if d is None or isinstance(f.dataType, StructType):
            cols.append(F.col(f.name))
        elif isinstance(d, int):
            cols.append(F.coalesce(F.col(f.name), F.lit(d).cast(f.dataType)).alias(f.name))
        else:
            cols.append(F.coalesce(F.col(f.name), d if not isinstance(d, str) else F.lit(d)).alias(f.name))
    return df.select(*cols)


def clamp_neg_infinity(df: DataFrame) -> DataFrame:
    """-Inf → -Double.MAX_VALUE on every float/double column
    (ProtoConcatenator.java:99-103)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (DoubleType, FloatType)):
            lo = F.lit(-_DOUBLE_MAX).cast(f.dataType)
            cols.append(
                F.when(F.col(f.name) == F.lit(float("-inf")), lo)
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def flatten_event(
    df: DataFrame,
    with_defaults: bool = True,
    drop_id: bool = True,
) -> DataFrame:
    """E1/E2: the flattened event view.  Fixture tables are already wide
    (header⊕body⊕timestamp⊕kafka coords); for nested input
    (header struct ⊕ body struct) this selects ``header.*, body.*``.
    ``drop_id`` mirrors E7 (ElasticSearchReader.java:137)."""
    names = set(df.columns)
    if "header" in names and "body" in names:
        keep = [c for c in df.columns if c not in ("header", "body")]
        df = df.select("header.*", "body.*", *keep)
    if drop_id and "id" in df.columns:
        df = df.drop("id")
    df = clamp_neg_infinity(df)
    if with_defaults:
        df = materialize_defaults(df)
    return df


def wide_event_table(dfs: dict[str, DataFrame]) -> DataFrame:
    """The ES-style single wide table: every typed event table unioned
    with an `event_type` discriminator, missing body columns null-filled
    (`unionByName(allowMissingColumns=True)`) — what the reference's
    shared hourly index stores (one JSON doc shape per index,
    ElasticSearchReader.java:62,141; SURVEY §2.8).

    Scale: the union is a zero-shuffle plan combinator; per-type filters
    (`event_type == k`) prune back to single-scan plans, and on the
    archived layout the discriminator is the partition column so the
    union never materializes."""
    from pyspark.sql import functions as F

    out = None
    for name, df in sorted(dfs.items()):
        part = df.withColumn("event_type", F.lit(name.upper()))
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    return out


def with_event_time(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Derive a TimestampType event-time column from epoch-millis for
    windowing (the reference keeps epoch long everywhere; SURVEY §1.4)."""
    return df.withColumn("event_time", F.timestamp_millis(F.col(ts_col)))


def clone_and_override(df: DataFrame, **overrides) -> DataFrame:
    """E8 Header.cloneAndOverride (Header.java; used at
    GarmadonSparkListener.java:282-286): per-event header overrides win
    over base values — coalesce(override, base)."""
    out = df
    for col, value in overrides.items():
        v = value if hasattr(value, "_jc") else F.lit(value)
        out = out.withColumn(col, F.coalesce(v, F.col(col)))
    return out

"""Normalization operators (SURVEY §2.4 E5/E9).

E5 — FS_EVENT path/URI uniformization:
  * ``UriHelper.getUniformizedUri`` (readers/common/.../UriHelper.java:30-40):
    strip the ``:port`` suffix from the URI, then map concrete
    namenode hosts → abstract nameservice via a properties mapping.
  * ``GarmadonMessage.toMap/toProto`` (GarmadonMessage.java:70-120,
    esp. :80-81): remove the (uniformized) URI prefix from src/dst paths
    with plain ``String.replace`` — NOT anchored; replicated here with
    non-regex ``F.replace``.

E9 — YARN tag parse (RMContextImplEventRunnable.java:31-37,71-83):
  ``key:value`` app tags; ``garmadon.project.name`` /
  ``garmadon.workflow.name`` extracted into columns, the rest kept as the
  ``yarn_tags`` array.

Scale: all scalar expressions (codegen'd); the host→nameservice mapping is
a literal map lookup (``F.element_at``) — no join, no shuffle.  With a
large dynamic mapping table it becomes a broadcast join instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PORT_RE = r":[0-9]+$"


def uniformize_uri(
    uri: Column | str, mapping: dict[str, str] | None = None
) -> Column:
    """UriHelper.getUniformizedUri parity: drop :port, then apply the
    host→nameservice mapping (unmapped URIs pass through)."""
    c = F.col(uri) if isinstance(uri, str) else uri
    stripped = F.regexp_replace(c, PORT_RE, "")
    if not mapping:
        return stripped
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return F.coalesce(F.element_at(m, stripped), stripped)


def strip_uri_prefix(path: Column | str, uri: Column) -> Column:
    """GarmadonMessage.java:80-81 parity: plain substring replace of the
    uniformized URI anywhere in the path (deliberately not anchored)."""
    p = F.col(path) if isinstance(path, str) else path
    return F.replace(p, uri, F.lit(""))


def normalize_fs_event(
    df: DataFrame,
    mapping: dict[str, str] | None = None,
    src_col: str = "src_path",
    dst_col: str = "dst_path",
    uri_col: str = "uri",
) -> DataFrame:
    """E5 composite: uniformize uri, strip it from src/dst paths."""
    uni = uniformize_uri(uri_col, mapping)
    return (
        df.withColumn(uri_col, uni)
        .withColumn(src_col, strip_uri_prefix(src_col, F.col(uri_col)))
        .withColumn(dst_col, strip_uri_prefix(dst_col, F.col(uri_col)))
    )


def parse_yarn_tags(
    df: DataFrame, tags_col: str = "yarn_tags"
) -> DataFrame:
    """E9: extract garmadon.project.name / garmadon.workflow.name from
    key:value tags; keep remaining tags in the array.

    Array higher-order functions (filter/transform/element_at) — JVM-side,
    no explode, no shuffle."""
    tags = F.col(tags_col)

    def extract(key: str) -> Column:
        matched = F.filter(tags, lambda t: t.startswith(key + ":"))
        return F.when(
            F.size(matched) > 0,
            F.substring_index(F.element_at(matched, 1), ":", -1),
        ).otherwise(F.lit(""))

    rest = F.filter(
        tags,
        lambda t: ~t.startswith("garmadon.project.name:")
        & ~t.startswith("garmadon.workflow.name:"),
    )
    return (
        df.withColumn("project_name_parsed", extract("garmadon.project.name"))
        .withColumn("workflow_name_parsed", extract("garmadon.workflow.name"))
        .withColumn(tags_col, rest)
    )

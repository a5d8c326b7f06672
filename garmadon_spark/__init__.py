"""garmadon_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of criteo/garmadon, rebuilt Spark-first.

The reference (/root/reference, criteo/garmadon) is a Hadoop-cluster
introspection pipeline: typed protobuf event streams → Kafka → readers that
materialize dashboards (time-bucketed aggregations), daily Parquet archives,
and stateful per-application "heuristic" severity scores.  This package
re-expresses that data plane as idiomatic PySpark:

- ``registry`` / ``schemas``: the type-marker schema registry
  (GarmadonSerialization.java:20-41) as a dict of StructTypes.
- ``filters``: the composable filter algebra
  (GarmadonMessageFilter.java) as Column predicates.
- ``operators``: flattening, JVM-stats explode, URI normalization,
  day/hour bucketing, enrichment joins (ProtoConcatenator.java,
  EventHelper.java, UriHelper.java, ElasticSearchCacheManager.java).
- ``queries``: the Grafana dashboard query surface (date_histogram,
  terms/top-k, sum/avg/max/count, percentiles, derivative, cardinality).
- ``heuristics``: the stateful per-app session aggregations with severity
  tiers (readers/heuristics/*.java) — batch and streaming forms.
- ``sources`` / ``sinks``: Kafka frame decode, partitioned Parquet/Hive
  archival with exactly-once semantics.
- LLM-data-pipeline extensions: dedup (exact/MinHash-LSH/SimHash),
  similarity search, text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"

from garmadon_spark.session import get_spark  # noqa: F401

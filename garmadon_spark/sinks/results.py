"""K5 heuristics-result sink (SURVEY §2.10).

Relational shape mirrors the reference MySQL schema
(readers/heuristics/src/main/resources/init.sql:1-33) and the insert
protocol of HeuristicsResultDB.java:73-141:

- ``garmadon_yarn_app_heuristic_result`` (id, yarn_app_result_id,
  heuristic_class, heuristic_name, severity, score, ready, read_times)
- ``garmadon_yarn_app_heuristic_result_details``
  (yarn_app_heuristic_result_id, name, value, details)

Two deliberate departures from the reference's row-at-a-time JDBC loop,
both forced by distributed execution:

- **Deterministic ids.** The reference relies on MySQL AUTO_INCREMENT
  and threads the generated key into each detail insert
  (HeuristicsResultDB.java:85-97).  A parallel writer can't consult a
  driver-side sequence, so ``id`` is ``xxhash64(app, attempt,
  heuristic)`` — stable across task retries (re-insert is idempotent
  instead of duplicating), unique per natural key, and already present
  on the exploded detail rows without a key round-trip.
- **Set-oriented writes.** One ``df.write.jdbc`` per table replaces the
  per-row PreparedStatement loop; batching/retry is the JDBC
  datasource's job (``batchsize``, ``isolationLevel`` options).

JDBC itself is a *capability*: no MySQL driver jar ships in this
sandbox, so ``jdbc_capable()`` gates the ``df.write.jdbc`` leg and
``write_results`` falls back to a two-directory parquet layout with the
identical schemas (the 100 TB-scale answer anyway — heuristics results
are O(apps), tiny, but parquet keeps the sink cluster-writable when the
warehouse is the destination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_TABLE = "garmadon_yarn_app_heuristic_result"
DETAILS_TABLE = "garmadon_yarn_app_heuristic_result_details"

MYSQL_DRIVER = "com.mysql.cj.jdbc.Driver"


def jdbc_capable(spark, driver: str = MYSQL_DRIVER) -> bool:
    """True iff the given JDBC driver class is on Spark's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def to_result_tables(results: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split ``assemble_results`` output (application_id, attempt_id,
    heuristic, severity, score, details map) into the two relational
    tables of init.sql:1-26.

    ``heuristic_name`` carries the ``<SimpleName>@<attempt>`` format the
    reference writes (HeuristicsResultDB.java:84); ``heuristic_class``
    is the implementing module path (the reference stores the JVM class
    name — same role, this engine's namespace).  Narrow, shuffle-free:
    both outputs are projections/explodes of the input."""
    res = results.select(
        F.xxhash64("application_id", "attempt_id", "heuristic").alias("id"),
        F.col("application_id").alias("yarn_app_result_id"),
        F.concat(
            F.lit("garmadon_spark.heuristics."), F.col("heuristic")
        ).alias("heuristic_class"),
        F.concat(
            F.col("heuristic"), F.lit("@"), F.col("attempt_id")
        ).alias("heuristic_name"),
        F.col("severity").cast("int").alias("severity"),
        F.col("score").cast("int").alias("score"),
        F.lit(True).alias("ready"),
        F.lit(0).alias("read_times"),
    )
    det = results.select(
        F.xxhash64("application_id", "attempt_id", "heuristic").alias(
            "yarn_app_heuristic_result_id"
        ),
        F.explode_outer("details").alias("name", "value"),
        F.lit(None).cast("string").alias("details"),
    ).where(F.col("name").isNotNull())
    return res, det


def write_results(
    results: DataFrame,
    *,
    jdbc_url: str | None = None,
    path: str | None = None,
    mode: str = "append",
    properties: dict | None = None,
) -> None:
    """Write assembled heuristic results to MySQL (when a JDBC driver is
    present) or to a parquet warehouse directory.

    Exactly one of ``jdbc_url`` / ``path`` must be given.  The JDBC leg
    raises ``RuntimeError`` when the driver class is absent rather than
    failing deep inside the JVM writer."""
    if (jdbc_url is None) == (path is None):
        raise ValueError("pass exactly one of jdbc_url / path")
    res, det = to_result_tables(results)
    if jdbc_url is not None:
        spark = results.sparkSession
        props = {"driver": MYSQL_DRIVER, **(properties or {})}
        if not jdbc_capable(spark, props["driver"]):
            raise RuntimeError(
                f"JDBC driver {props['driver']} not on the classpath; "
                "pass path= for the parquet fallback"
            )
        res.write.jdbc(jdbc_url, RESULT_TABLE, mode=mode, properties=props)
        det.write.jdbc(jdbc_url, DETAILS_TABLE, mode=mode, properties=props)
    else:
        res.write.mode(mode).parquet(f"{path}/{RESULT_TABLE}")
        det.write.mode(mode).parquet(f"{path}/{DETAILS_TABLE}")


def read_results(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read back the parquet layout written by ``write_results``."""
    return (
        spark.read.parquet(f"{path}/{RESULT_TABLE}"),
        spark.read.parquet(f"{path}/{DETAILS_TABLE}"),
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every declared operator from SURVEY.md §2 (dashboard
surface, TPC-H-style analytics, LLM-data-pipeline ops).
``oracle_sql()`` — DuckDB-runnable ANSI SQL per query (omitted for
non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from garmadon_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The hourly date_histogram per event type — the reference's core
    dashboard panel shape (SURVEY §2.7, 329 date_histogram aggs).
    """
    from garmadon_spark.queries.dashboard import ev_date_histogram_hour

    return ev_date_histogram_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in all_queries().items()
        if sql is not None
    }

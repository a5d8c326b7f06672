"""Declared query surface.

Every module exposes ``QUERIES: dict[name -> (fn, oracle_sql | None)]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL for the DuckDB oracle (None ⇒ not SQL-expressible,
driver records a rows-only check).

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL — the driver sorts columns by name before
value-hashing.
"""

from __future__ import annotations

from garmadon_spark.queries import dashboard, datapipe, engine, tpch


def all_queries():
    merged = {}
    for mod in (dashboard, tpch, datapipe, engine):
        for name, pair in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name}")
            merged[name] = pair
    return merged

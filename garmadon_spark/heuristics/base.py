"""Heuristics framework primitives (SURVEY §2.6).

Severity scale NONE..CRITICAL = 0..4 (HeuristicsResultDB.java:14-20).
Result assembly parity with HeuristicHelper.createCounterHeuristic
(HeuristicHelper.java:25-40):

- app severity = max severity over the app's surviving containers;
- ≤ 10 containers → one detail entry per container;
- > 10 containers → a single ``Containers: <n>`` detail
  (MAX_CONTAINERS_PER_HEURISTIC = 10, HeuristicHelper.java:13);
- apps with zero surviving containers produce NO result row.

Results are rows of
``(application_id, attempt_id, heuristic, severity, score, details)``
with ``details: map<string,string>`` — the relational form of the MySQL
result+details tables (readers/heuristics/src/main/resources/init.sql:1-33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Severity:
    NONE = 0
    LOW = 1
    MODERATE = 2
    SEVERE = 3
    CRITICAL = 4


MAX_CONTAINERS_PER_HEURISTIC = 10

RESULT_COLUMNS = ("application_id", "attempt_id", "heuristic", "severity",
                  "score", "details")


def assemble_results(
    per_container: DataFrame, heuristic: str, severity_expr=None
) -> DataFrame:
    """Fold per-container rows ``(application_id, attempt_id, container_id,
    severity, detail)`` into per-app result rows.

    One shuffle on (application_id, attempt_id); the detail map is built
    with map_from_entries over a bounded collect_list (≤ container count
    per app — small by construction)."""
    agg = (
        per_container.groupBy("application_id", "attempt_id")
        .agg(
            F.expr("max(severity)").alias("severity"),
            F.expr("count(1)").alias("n_containers"),
            F.expr("map_from_entries(sort_array(collect_list("
                   "struct(container_id, detail))))")
            .alias("container_details"),
        )
    )
    return agg.selectExpr(
        "application_id",
        "attempt_id",
        f"'{heuristic}' as heuristic",
        "severity",
        "severity as score",
        f"case when n_containers <= {MAX_CONTAINERS_PER_HEURISTIC}"
        " then container_details"
        " else map('Containers', cast(n_containers as string))"
        " end as details",
    )


def assemble_results_by_heuristic(verdicts: DataFrame) -> DataFrame:
    """assemble_results generalized over a ``heuristic`` COLUMN: folds
    per-container verdict rows ``(application_id, attempt_id,
    container_id, heuristic, severity, detail)`` from any number of
    heuristics in one grouped aggregate — the single-shuffle tail of the
    fused plan (batch.jvm_heuristics_fused)."""
    agg = (
        verdicts.groupBy("application_id", "attempt_id", "heuristic")
        .agg(
            F.expr("max(severity)").alias("severity"),
            F.expr("count(1)").alias("n_containers"),
            F.expr("map_from_entries(sort_array(collect_list("
                   "struct(container_id, detail))))")
            .alias("container_details"),
        )
    )
    return agg.selectExpr(
        "application_id",
        "attempt_id",
        "heuristic",
        "severity",
        "severity as score",
        f"case when n_containers <= {MAX_CONTAINERS_PER_HEURISTIC}"
        " then container_details"
        " else map('Containers', cast(n_containers as string))"
        " end as details",
    )

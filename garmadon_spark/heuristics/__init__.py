from garmadon_spark.heuristics.base import Severity, assemble_results  # noqa: F401
from garmadon_spark.heuristics import batch  # noqa: F401

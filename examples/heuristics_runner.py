"""Heuristics analog (reference entry point #4, Heuristics.main):

event streams → explicit-END session engine (built-in + custom
heuristics) → per-app severity results table.
Run: ``python examples/heuristics_runner.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

from garmadon_spark.session import get_spark
from garmadon_spark.sources import fixtures
from garmadon_spark.streaming import sessions


class ShortApp(sessions.SessionHeuristic):
    """Custom heuristic via the register_heuristic extension surface:
    flag apps that finish with fewer than 20 events."""

    name = "ShortApp"

    def new_state(self):
        return {"n": 0}

    def process(self, s, row):
        s["n"] += 1

    def on_app_completed(self, app_id, attempt_id, s):
        sev = 1 if s["n"] < 20 else 0
        return [{"heuristic": "ShortApp", "severity": sev, "score": sev,
                 "details_json": json.dumps({"events": str(s["n"])})}]


def main() -> None:
    spark = get_spark("garmadon-heuristics")
    spark.sparkContext.setLogLevel("ERROR")
    sessions.register_heuristic(ShortApp())

    import tempfile

    # replay the fixture corpus as a STREAM (the engine is stateful
    # streaming, exactly like the reference's Kafka consumer)
    d = tempfile.mkdtemp("garmadon_heur")
    fixtures.write_parquet(spark, d, n_apps=6, seed=9)

    def tbl(name):
        batch = spark.read.parquet(f"{d}/{name}.parquet")
        return spark.readStream.schema(batch.schema).parquet(
            f"{d}/{name}.parquet"
        )

    union = sessions.prepare_session_input(
        jvmstats=tbl("jvmstats_event"),
        fs_events=tbl("fs_event"),
        state_events=tbl("state_event"),
    )
    results = sessions.session_heuristics(union, max_created_files=100)
    q = (
        results.writeStream.format("memory").queryName("heuristic_results")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT heuristic, severity, COUNT(*) AS apps "
        "FROM heuristic_results GROUP BY 1, 2 ORDER BY 1, 2"
    )
    out.show(20, truncate=False)


if __name__ == "__main__":
    main()

"""Measure continuous-aggregate maintenance: folding a one-day
increment into the materialized rollup vs rebuilding from all events
(SCALING.md evidence — the claim is that refresh cost tracks the
increment, not history).

Usage: python tools/scale_rollup.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from garmadon_spark.session import get_spark, load_table
from garmadon_spark.sinks import rollup

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(fn):
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main():
    spark = get_spark("garmadon-scale-rollup")
    spark.sparkContext.setLogLevel("ERROR")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = load_table(spark, SF_DIR, "events")
    # replicate users, keep the same day span: history grows, the
    # one-day increment grows with it — the full/fold divergence is
    # what the measurement isolates
    ev = (
        base.select(
            F.explode(
                F.array(*[F.lit(i) for i in range(copies)])
            ).alias("_c"),
            "*",
        )
        .withColumn("user_id", F.col("user_id") + F.col("_c") * 1_000_000)
        .drop("_c")
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    n = ev.count()
    last_day = ev.agg(F.max(F.to_date("ts"))).head()[0]
    history = ev.filter(F.to_date("ts") < F.lit(str(last_day)))
    increment = ev.filter(F.to_date("ts") == F.lit(str(last_day)))
    n_inc = increment.count()

    work = tempfile.mkdtemp(prefix="garmadon_scale_rollup_")
    try:
        # full rebuild cost (fresh dir each pass)
        i = [0]

        def full():
            i[0] += 1
            rollup.maintain_rollup(spark, ev, f"{work}/full{i[0]}")

        t_full = timed(full)

        # incremental: history folded once, then time the day fold
        rollup.maintain_rollup(spark, history, f"{work}/incr")
        # fold+unfold is not idempotent -> copy the base per pass
        j = [0]

        def incr():
            j[0] += 1
            dst = f"{work}/incr{j[0]}"
            shutil.copytree(f"{work}/incr", dst)
            rollup.maintain_rollup(spark, increment, dst)

        t_incr = timed(incr)
        print(
            f"{n} events, increment {n_inc}: full rebuild {t_full}s, "
            f"one-day fold {t_incr}s ({t_full / t_incr:.1f}x)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

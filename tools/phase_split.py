"""Phase-split profiler: where does one query's wall time go?

Splits a declared query's time into (a) Python-side DataFrame
construction (fn call — includes any driver collects inside the
builder), (b) analysis, (c) optimization, (d) physical planning,
(e) toRdd (codegen + RDD construction), (f) the noop-sink action.

Usage: python tools/phase_split.py [--sf DIR] [--reps N] query [...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmadon_spark.session import get_spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from garmadon_spark.queries import all_queries

    spark = get_spark("phase-split")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = all_queries()
    for name in args.queries:
        fn = qs[name][0]
        for _ in range(args.reps):
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            qe = df._jdf.queryExecution()
            qe.analyzed()
            t2 = time.time()
            qe.optimizedPlan()
            t3 = time.time()
            qe.executedPlan()
            t4 = time.time()
            qe.toRdd()
            t5 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t6 = time.time()
            print(f"{name}: construct={t1-t0:.3f} analyze={t2-t1:.3f} "
                  f"optimize={t3-t2:.3f} physical={t4-t3:.3f} "
                  f"toRdd={t5-t4:.3f} action={t6-t5:.3f} "
                  f"total={t6-t0:.3f}", flush=True)


if __name__ == "__main__":
    main()

"""Per-query profiling harness for the optimization rounds.

Times one or more declared queries with the EXACT bench methodology
(noop sink, memo-on warm reruns) plus an optional memo-off pass, and
dumps ``explain('formatted')`` to ``plans/`` for before/after evidence.

Usage:
    python tools/profile_query.py [--sf DIR] [--reps N] [--nomemo]
        [--explain-dir plans/r14] [--suffix before] query [query ...]
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
    ap.add_argument("--nomemo", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from garmadon_spark.queries import all_queries
    from garmadon_spark.queries.datapipe import (
        purge_result_memo, set_result_memo,
    )

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = all_queries()
    for name in args.queries:
        if name not in qs:
            print(f"unknown query: {name}")
            continue
        fn = qs[name][0]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        for i in range(args.reps):
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        line = f"{name}: " + " ".join(f"{t:.3f}" for t in times)
        if args.nomemo:
            set_result_memo(False)
            try:
                purge_result_memo()
                t0 = time.time()
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                line += f"  nomemo={time.time() - t0:.3f}"
                purge_result_memo()
            finally:
                set_result_memo(True)
        print(line, flush=True)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain_dir,
                    f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

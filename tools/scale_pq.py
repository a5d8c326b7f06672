"""Measure the PQ tier at x1 / x10 / x100 the sf0.1 embeddings corpus
(SCALING.md evidence, same protocol as the IVF scaling table).

The replicated corpus rolls each copy's embedding by `i` positions so
copies quantize to different codes (same distribution, no degenerate
identical-vector corpus).  Three legs per scale:

- train  — fixed-size sample (PQ_TRAIN_SAMPLE cap) -> should stay FLAT
- encode — map-only linear scan -> should scale ~linearly
- search — ADC over 16-byte codes + exact re-rank of the shortlist ->
           linear in codes scanned but ~16x less IO than a float scan

Usage: python tools/scale_pq.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from garmadon_spark.operators import similarity
from garmadon_spark.session import get_spark, load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DIM = 64


def build_kx(spark, src_dir: str, k: int):
    embs = load_table(spark, src_dir, "embeddings")
    parts = []
    for i in range(k):
        roll = i % DIM
        e = F.col("embedding")
        rolled = e if roll == 0 else F.concat(
            F.slice(e, roll + 1, DIM - roll), F.slice(e, 1, roll)
        )
        parts.append(
            embs.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    return big.repartition(spark.sparkContext.defaultParallelism)


def timed(fn) -> tuple[float, object]:
    best, out = None, None
    for _ in range(2):  # min-of-2, matching bench.py methodology
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), out


def main():
    spark = get_spark("garmadon-scale-pq")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "embeddings")
    qrow = base.filter(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in qrow[0]]
    for k in (1, 10, 100):
        embs = build_kx(spark, SF_DIR, k).persist()
        n = embs.count()
        t_train, books = timed(
            lambda: similarity.train_pq(embs, m=16, ksub=64, iterations=5)
        )
        # encode timing: fresh (uncached) evaluation per pass — a cached
        # codes handle would make pass 2 measure the cache scan instead
        t_encode, _ = timed(
            lambda: similarity.pq_encode(embs, books)
            .write.format("noop").mode("overwrite").save()
        )
        codes = similarity.pq_encode(embs, books).persist()
        codes.count()  # materialize outside the search timing
        t_search, top = timed(
            lambda: similarity.pq_topk(
                codes, books, q, k=10, rerank=40, embs=embs
            ).collect()
        )
        print(
            f"x{k}: {n} vectors  train {t_train}s  encode {t_encode}s"
            f"  search {t_search}s  (top1 {top[0].vec_id})"
        )
        codes.unpersist()
        embs.unpersist()


if __name__ == "__main__":
    main()

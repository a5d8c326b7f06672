"""Measure the semantic-dedup tier at x1 / x10 the sf0.1 embeddings
corpus (SCALING.md evidence, same protocol as the PQ/minhash tables).

The replicated corpus rolls each copy's embedding AND offsets its label
space, so every copy keeps the base corpus's within-block near-dup
structure but copies never pair with each other — block sizes stay
constant and the true pair count scales exactly with the copies.  Two
legs per scale:

- pairs   — label-blocked cosine pairs (the O(block^2) tier whose
            per-block cost is CONSTANT here because blocks don't grow)
- semdedup — pairs -> connected components -> per-group max-norm
            representative (the new work this tool isolates: the
            label-propagation rounds + one window over sem_group)

Usage: python tools/scale_semdedup.py [sf_dir]
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
                (F.col("label") + i * 10_000).alias("label"),
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    return big.repartition(spark.sparkContext.defaultParallelism)


def timed(fn):
    best, out = None, None
    for _ in range(2):  # min-of-2, matching bench.py methodology
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), out


def main():
    spark = get_spark("garmadon-scale-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    for k in (1, 10):
        embs = build_kx(spark, SF_DIR, k).persist()
        n = embs.count()
        t_pairs, n_pairs = timed(
            lambda: similarity.neardup_pairs_blocked(
                embs, block_col="label", threshold=0.25
            ).count()
        )
        pairs = similarity.neardup_pairs_blocked(
            embs, block_col="label", threshold=0.25
        ).persist()
        pairs.count()  # materialize outside the semdedup timing
        t_sem, kept = timed(
            lambda: similarity.semantic_dedup(embs, pairs)
            .filter(F.col("keep"))
            .count()
        )
        print(
            f"x{k}: {n} vectors  pairs {t_pairs}s ({n_pairs} pairs)"
            f"  semdedup {t_sem}s ({kept} kept, {n - kept} dropped)"
        )
        pairs.unpersist()
        embs.unpersist()


if __name__ == "__main__":
    main()

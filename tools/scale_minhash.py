"""Measure the declared minhash-family queries end-to-end at 1x and 10x
the sf0.1 documents corpus (SCALING.md evidence).

The 10x corpus preserves the dup-rate SHAPE of the original: each of the
10 copies keeps the corpus's internal near-duplicate structure (so dup
groups scale ~10x in count at constant group size), while a per-copy
vowel rotation makes copies NOT near-duplicates of each other — the
honest "bigger corpus" layout, not the adversarial all-copies-collide
one (that case is measured separately in SCALING.md).

Usage: python tools/scale_minhash.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from garmadon_spark.queries import datapipe
from garmadon_spark.session import get_spark, load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
# 10 letters → 10 DISTINCT rotations (5 vowels would alias copy i with
# copy i+5, making every doc an exact twin — measured and discarded)
ALPHA = "aeiousnrtl"


def build_10x(spark, src_dir: str, out_dir: str) -> int:
    docs = load_table(spark, src_dir, "documents")
    parts = []
    for i in range(10):
        rot = ALPHA[i:] + ALPHA[:i]
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
                F.translate("text", ALPHA, rot).alias("text"),
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    return spark.read.parquet(
        os.path.join(out_dir, "documents.parquet")
    ).count()


def time_query(fn, spark, d: str) -> float:
    best = None
    for _ in range(2):  # min-of-2, matching bench.py methodology
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main():
    spark = get_spark("garmadon-scale-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="garmadon_scale10x_")
    try:
        n10 = build_10x(spark, SF_DIR, tmp)
        n1 = load_table(spark, SF_DIR, "documents").count()
        print(f"corpus: 1x={n1} docs, 10x={n10} docs")
        for name, fn in (
            ("doc_minhash_dedup", datapipe.doc_minhash_dedup),
            ("doc_dup_groups", datapipe.doc_dup_groups),
            ("doc_perplexity", datapipe.doc_perplexity),
        ):
            # untimed warmup: the first execution of the 64-column
            # minhash agg / label-propagation loop pays several seconds
            # of wholestage-JIT that would land on whichever scale runs
            # first and corrupt the ratio
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t1 = time_query(fn, spark, SF_DIR)
            rows1 = fn(spark, SF_DIR).count()
            t10 = time_query(fn, spark, tmp)
            rows10 = fn(spark, tmp).count()
            print(
                f"{name}: 1x {t1}s ({rows1} rows) -> 10x {t10}s"
                f" ({rows10} rows), factor {round(t10 / t1, 1)}x"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

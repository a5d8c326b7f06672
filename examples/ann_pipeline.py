"""Similarity-search tiers side by side — the ANN decision ladder a
deployment actually walks:

  brute force (exact baseline) → IVF (read fewer vectors) →
  PQ (read smaller vectors) → IVF-PQ (both)

For each tier: top-10 for one probe query, recall vs the exact answer,
and the fraction of the corpus BYTES the scan reads — the number that
decides which tier survives at 100 TB.

Run: ``python examples/ann_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from garmadon_spark.operators import similarity
from garmadon_spark.session import get_spark, load_table

DIM = 64
FLOAT_BYTES = 4 * DIM          # raw float32 row payload
N_CENTROIDS, NPROBE = 8, 4
M, KSUB = 16, 64               # PQ: 16 one-byte codes per vector
K, RERANK = 10, 40


def recall(approx, exact) -> float:
    return len(set(approx) & set(exact)) / len(exact)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    embs = load_table(spark, sf_dir, "embeddings")
    n = embs.count()
    q = [float(x) for x in
         embs.filter(F.col("vec_id") == 0).head().embedding]
    rest = embs.filter(F.col("vec_id") != 0)

    exact = [r.vec_id for r in
             similarity.brute_force_topk(rest, q, k=K).collect()]
    print(f"brute force: reads 100% of {n * FLOAT_BYTES} B, recall 1.0")

    cents, assigned = similarity.build_ivf(embs, n_centroids=N_CENTROIDS,
                                           iterations=2)
    ivf = [r.vec_id for r in similarity.ivf_topk(
        assigned.filter(F.col("vec_id") != 0), cents, q, k=K,
        nprobe=NPROBE).collect()]
    frac = NPROBE / N_CENTROIDS
    print(f"IVF nprobe={NPROBE}/{N_CENTROIDS}: reads ~{frac:.0%} of the "
          f"float corpus, recall {recall(ivf, exact)}")

    books = similarity.train_pq(embs, m=M, ksub=KSUB)
    codes = similarity.pq_encode(rest, books)
    pq = [r.vec_id for r in similarity.pq_topk(
        codes, books, q, k=K, rerank=RERANK, embs=rest).collect()]
    print(f"PQ M={M}: reads 100% of {n * M} B codes "
          f"({FLOAT_BYTES // M}x smaller) + {RERANK} raw vectors, "
          f"recall {recall(pq, exact)}")

    # PCA-rotated PQ (the OPQ PCA leg): a PURE rotation (center=False)
    # preserves dot products exactly, so rotated-space neighbors ARE
    # raw-space neighbors — decorrelated axes just stop contiguous
    # subquantizer blocks wasting codebook entropy
    import numpy as np
    mean0, comps, _ = similarity.fit_pca(embs, center=False)
    rot = similarity.pca_project(embs, mean0, comps, out_col="rot") \
        .select("vec_id", F.col("rot").alias("embedding"))
    rest_rot = rot.filter(F.col("vec_id") != 0)
    q_rot = [float(x) for x in np.asarray(q) @ np.asarray(comps).T]
    books_r = similarity.train_pq(rot, m=M, ksub=KSUB)
    codes_r = similarity.pq_encode(rest_rot, books_r)
    pq_r = [r.vec_id for r in similarity.pq_topk(
        codes_r, books_r, q_rot, k=K, rerank=RERANK,
        embs=rest_rot).collect()]
    print(f"PQ M={M} on PCA-rotated axes: same bytes, "
          f"recall {recall(pq_r, exact)} (vs {recall(pq, exact)} raw)")

    c2, b2, codes2 = similarity.build_ivfpq(
        embs, n_centroids=N_CENTROIDS, m=M, ksub=KSUB)
    ivfpq = [r.vec_id for r in similarity.ivfpq_topk(
        codes2.filter(F.col("vec_id") != 0), c2, b2, q, k=K,
        nprobe=NPROBE, rerank=RERANK, embs=rest).collect()]
    print(f"IVF-PQ: reads ~{frac:.0%} of the {FLOAT_BYTES // M}x-smaller "
          f"codes (~{frac / (FLOAT_BYTES // M):.1%} of a raw scan) + "
          f"{RERANK} raw vectors, recall {recall(ivfpq, exact)}")

    # the same index also DEDUPES: IVF cells as the blocking key →
    # near-dup pairs → semantic groups → one survivor per group
    pairs = similarity.neardup_pairs_blocked(
        assigned, block_col="ivf_cell", threshold=0.3
    )
    verdict = similarity.semantic_dedup(embs, pairs)
    kept = verdict.filter(F.col("keep")).count()
    print(f"semantic dedup @0.3 over IVF cells: keep {kept}/{n} "
          f"({n - kept} semantically-redundant vectors dropped)")

    # the index LIFECYCLE a deployment runs: materialize → absorb the
    # daily batch (append, no rebuild) → serve query BATCHES through
    # one plan → compact the append fragments (atomic per-cell swap)
    import tempfile

    path = tempfile.mkdtemp(prefix="garmadon_ann_idx_") + "/idx"
    similarity.write_ivf_index(
        embs.filter(F.col("vec_id") % 2 == 0), path,
        n_centroids=N_CENTROIDS, iterations=1,
    )
    similarity.append_to_ivf_index(
        embs.filter(F.col("vec_id") % 2 == 1), path
    )
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = similarity.ivf_topk_batch(
        spark, path, queries, k=K, nprobe=NPROBE
    )
    # materialize BEFORE compacting: a lazy plan captures the file list
    # at planning time, and the swap replaces those files (new probes
    # re-plan and see the compacted layout; stale plans must re-plan)
    n_before = served.count()
    per_q = served.groupBy("query_id").count().count()
    compacted = similarity.compact_ivf_index(spark, path)
    again = similarity.ivf_topk_batch(
        spark, path, queries, k=K, nprobe=NPROBE
    ).count()
    print(f"serving: {per_q} queries answered in one batched plan; "
          f"compacted {len(compacted)} fragmented cells "
          f"(probe rows before/after: {n_before}/{again})")


if __name__ == "__main__":
    main()

"""Two-level (hierarchical) IVF: the r7 removal of the last scale cap.

Flat IVF assignment is O(n·k·d); with cells ∝ corpus (k = n/250) the
build was quadratic past the r6 4096-cell cap.  The hierarchical
quantizer (√k coarse branches × √k fine centroids each) keeps
assignment at O(n·√k·d).  These tests pin:

- structure: every vector's fine cell belongs to its coarse branch and
  is the argmax among THAT BRANCH's centroids only (the build never
  scores another branch — the n·√k contract);
- exactness at full probe: nprobe = all cells ⇒ identical to brute
  force (the approximation is entirely in the probe budget);
- recall at partial probe on clustered data;
- incremental append routes through the same two-level assignment;
- plan shape: the probe's fine-centroid read pushes the branch filter
  into the centroids scan, and the vector scan partition-prunes on
  ivf_cell exactly like the flat index.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators import similarity


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(30, 16)) * 5
    X = np.vstack([
        centers[i % 30] + rng.normal(size=16) * 0.3 for i in range(2000)
    ])
    rows = [(i, [float(x) for x in X[i]]) for i in range(2000)]
    return (
        X,
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )


@pytest.fixture(scope="module")
def index(spark, clustered, tmp_path_factory):
    _, embs = clustered
    path = str(tmp_path_factory.mktemp("hier")) + "/idx"
    cents = similarity.write_ivf_index(
        embs, path, n_centroids=24, iterations=1, hierarchical=True
    )
    return path, cents


def test_fine_assignment_scores_only_own_branch(spark, clustered, index):
    X, _ = clustered
    path, _ = index
    fine = {
        int(r.ivf_cell): (int(r.ivf_branch), np.asarray(r.centroid))
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    by_branch = {}
    for cid, (b, c) in fine.items():
        by_branch.setdefault(b, []).append((cid, c))
    vecs = spark.read.parquet(f"{path}/vectors").collect()
    assert len(vecs) == 2000
    for r in vecs:
        b, cid = int(r.ivf_branch), int(r.ivf_cell)
        # cell belongs to the row's own branch
        assert fine[cid][0] == b, (cid, b)
        # and is the argmax of cosine-direction among THAT branch only
        v = np.asarray(r.embedding)
        scores = {
            c: float(v @ cvec / (np.linalg.norm(cvec) or 1.0))
            for c, cvec in by_branch[b]
        }
        assert cid == max(scores, key=lambda c: (scores[c], -c)), r.vec_id


def test_full_probe_equals_brute_force(spark, clustered, index):
    X, embs = clustered
    path, cents = index
    for qid in (7, 500, 1999):
        q = [float(x) for x in X[qid]]
        bf = [
            (r.vec_id, r.cosine)
            for r in similarity.brute_force_topk(embs, q, k=5).collect()
        ]
        hv = [
            (r.vec_id, r.cosine)
            for r in similarity.ivf_topk_from_index(
                spark, path, q, k=5,
                nprobe=len(cents), probe_branches=10_000,
            ).collect()
        ]
        assert hv == bf


def test_partial_probe_recall(spark, clustered, index):
    X, embs = clustered
    path, _ = index
    hits = 0
    for qid in (3, 11, 42, 77, 123):
        q = [float(x) for x in X[qid]]
        exact = {
            r.vec_id
            for r in similarity.brute_force_topk(embs, q, k=10).collect()
        }
        got = {
            r.vec_id
            for r in similarity.ivf_topk_from_index(
                spark, path, q, k=10, nprobe=6
            ).collect()
        }
        hits += len(exact & got)
    assert hits >= 0.6 * 50, hits  # same recall floor as emb_ann_ivf_check


def test_append_routes_through_two_levels(spark, clustered, index):
    X, _ = clustered
    path, _ = index
    # new vectors = tight copies of an existing point: must land in its
    # branch/cell and be found by the probe without any rebuild
    base = X[7]
    new_rows = [
        (10_000 + i, [float(x) for x in base + 0.01 * i]) for i in range(3)
    ]
    new = spark.createDataFrame(
        new_rows, "vec_id long, embedding array<double>"
    )
    similarity.append_to_ivf_index(new, path)
    vecs = spark.read.parquet(f"{path}/vectors")
    added = vecs.filter(F.col("vec_id") >= 10_000).collect()
    assert len(added) == 3
    orig = vecs.filter(F.col("vec_id") == 7).head()
    assert all(r.ivf_cell == orig.ivf_cell for r in added)
    q = [float(x) for x in base]
    got = {
        r.vec_id
        for r in similarity.ivf_topk_from_index(
            spark, path, q, k=4, nprobe=4
        ).collect()
    }
    assert {10_000, 10_001, 10_002} <= got


def test_append_skips_branch_without_fine_centroids(
    spark, clustered, index, tmp_path
):
    """A coarse cell that was empty at build time has no fine
    centroids; a new vector whose nearest branch is that one must
    route to its next-nearest POPULATED branch instead of failing."""
    import shutil

    X, _ = clustered
    src, _ = index
    path = str(tmp_path / "idx_ghost")
    shutil.copytree(src, path)
    # plant a ghost branch: a coarse centroid exactly on the new
    # vector's direction, with no fine centroids in the table
    ghost = [float(x) for x in (X[7] * 3.0)]
    coarse = spark.read.parquet(f"{path}/coarse").collect()
    ghost_id = max(int(r.ivf_branch) for r in coarse) + 1
    rows = [(int(r.ivf_branch), list(r.centroid)) for r in coarse]
    rows.append((ghost_id, ghost))
    spark.createDataFrame(
        rows, "ivf_branch int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/coarse")
    new = spark.createDataFrame(
        [(77_000, [float(x) for x in X[7]])],
        "vec_id long, embedding array<double>",
    )
    similarity.append_to_ivf_index(new, path)
    added = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("vec_id") == 77_000).head()
    )
    fine_branches = {
        int(r.ivf_branch)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    assert added is not None
    assert int(added.ivf_branch) in fine_branches
    assert int(added.ivf_branch) != ghost_id


def test_probe_plan_prunes_partitions_and_pushes_branch_filter(
    spark, clustered, index
):
    X, _ = clustered
    path, _ = index
    q = [float(x) for x in X[7]]
    probe = similarity.ivf_topk_from_index(spark, path, q, k=5, nprobe=4)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan = next(
        l for l in plan.split("\n") if "FileScan" in l and "ivf_cell" in l
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
    assert m and "ivf_cell" in m.group(1) and " IN " in m.group(1), scan
    # the fine-centroid read only touches the probed branches: the
    # branch IN-filter reaches the centroids parquet scan
    cent_df = spark.read.parquet(f"{path}/centroids").filter(
        F.col("ivf_branch").isin([0, 1])
    )
    cplan = cent_df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[.*[Ii]n\(ivf_branch", cplan), cplan


def test_cell_balance_regression_pin(spark, clustered, index):
    """Cell-size balance pin: the within-cell pair join is O(cell²), so
    an unbalanced quantizer silently re-creates the quadratic blowup
    the hierarchy removes.  The first cut of this operator (fixed
    per-branch cell counts, id-ordered samples, no full-corpus fine
    refinement) produced max cells 3.3× the mean and a 4.5×-slower
    pair join at the 100× replica — this pin fails on any of those
    regressions."""
    path, cents = index
    sizes = [
        r.n
        for r in spark.read.parquet(f"{path}/vectors")
        .groupBy("ivf_cell").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 3 * mean, (max(sizes), mean)
    # pair work (Σc²) within 2× of the uniform-lower-bound
    sum_sq = sum(s * s for s in sizes)
    uniform = sum(sizes) ** 2 / len(sizes)
    assert sum_sq <= 2 * uniform, (sum_sq, uniform)


def test_flat_small_index_unchanged(spark, clustered, tmp_path):
    """Small corpora keep the r1-r6 flat layout bit-for-bit (no coarse
    table, auto-select stays flat below HIER_IVF_MIN_CELLS)."""
    import os

    _, embs = clustered
    path = str(tmp_path / "flat")
    similarity.write_ivf_index(embs, path, n_centroids=8, iterations=1)
    assert not os.path.isdir(f"{path}/coarse")
    cols = spark.read.parquet(f"{path}/centroids").columns
    assert cols == ["ivf_cell", "centroid"]


def test_batch_probe_matches_single_on_hier_index(spark, clustered, index):
    """ivf_topk_batch's two-level Arrow probe selects the same branches,
    cells, and final top-k as the driver-side single-query probe on a
    hierarchical index (same default probe_branches derivation)."""
    _, embs = clustered
    path, _ = index
    qids = [0, 11, 222]
    queries = embs.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = similarity.ivf_topk_batch(spark, path, queries, k=5, nprobe=3)
    got: dict = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    for qid in qids:
        q = [float(x) for x in
             embs.filter(F.col("vec_id") == qid).head()["embedding"]]
        single = similarity.ivf_topk_from_index(
            spark, path, q, k=5, nprobe=3, exclude_ids=[qid]
        ).collect()
        want = [(i + 1, r.vec_id, r.cosine) for i, r in enumerate(single)]
        assert sorted(got[qid]) == want

"""PCA rotation (similarity.fit_pca / pca_project): reconstruction,
axis ordering, sign determinism, truncation, and the map-only plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators import similarity


def _toy(spark, n=200, seed=5):
    rng = np.random.default_rng(seed)
    # anisotropic: dim0 has 10x the std of the others, so the top
    # principal axis must align with dim0
    X = rng.normal(size=(n, 6))
    X[:, 0] *= 10.0
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), X


def test_fit_pca_axes_and_determinism(spark):
    df, X = _toy(spark)
    mean, comps, evals = similarity.fit_pca(df)
    C = np.asarray(comps)
    assert C.shape == (6, 6)
    # orthonormal, variance-ordered, top axis along dim0
    assert np.allclose(C @ C.T, np.eye(6), atol=1e-10)
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(5))
    assert abs(C[0, 0]) > 0.99
    # sign fix: largest-|coordinate| of each component is positive
    for row in C:
        assert row[int(np.argmax(np.abs(row)))] > 0
    mean2, comps2, evals2 = similarity.fit_pca(df)
    assert np.array_equal(np.asarray(comps), np.asarray(comps2))
    assert np.array_equal(np.asarray(mean), np.asarray(mean2))


def test_pca_project_reconstructs_full_rank(spark):
    df, X = _toy(spark, n=120)
    mean, comps, _ = similarity.fit_pca(df)
    proj = similarity.pca_project(df, mean, comps)
    got = {r.vec_id: np.asarray(r.pca) for r in proj.collect()}
    C = np.asarray(comps)
    for i, x in enumerate(X):
        back = got[i] @ C + np.asarray(mean)
        assert np.allclose(back, x, atol=1e-9)


def test_pca_truncation_keeps_top_variance(spark):
    df, X = _toy(spark)
    mean, comps, evals = similarity.fit_pca(df, dim_out=2)
    assert np.asarray(comps).shape == (2, 6)
    proj = similarity.pca_project(df, mean, comps)
    vals = np.vstack([r.pca for r in proj.collect()])
    assert vals.shape[1] == 2
    # the retained 2 axes carry (almost) all of dim0's inflated variance
    assert vals[:, 0].var() > 50.0


def test_pca_project_plan_is_map_only(spark):
    df, _ = _toy(spark, n=50)
    mean, comps, _ = similarity.fit_pca(df)
    plan = (
        similarity.pca_project(df, mean, comps)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pca_rejects_degenerate_inputs(spark):
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        similarity.fit_pca(one)
    df, _ = _toy(spark, n=30)
    with pytest.raises(ValueError):
        similarity.fit_pca(df, dim_out=0)
    with pytest.raises(ValueError):
        similarity.fit_pca(df, dim_out=7)
    mean, comps, _ = similarity.fit_pca(df)
    with pytest.raises(ValueError):
        similarity.pca_project(df, mean[:3], comps)


def test_pca_pure_rotation_preserves_dot_products(spark):
    """center=False fits a pure rotation: mean pinned at zero and ALL
    pairwise dot products (hence cosines, hence neighbor order)
    preserved exactly — the mode the PQ/IP search tier needs."""
    df, X = _toy(spark, n=80)
    mean0, comps, _ = similarity.fit_pca(df, center=False)
    assert np.allclose(np.asarray(mean0), 0.0)
    got = {r.vec_id: np.asarray(r.pca) for r in
           similarity.pca_project(df, mean0, comps).collect()}
    P = np.vstack([got[i] for i in range(len(X))])
    assert np.allclose(P @ P.T, X @ X.T, atol=1e-8)

"""Distributed PCA tier (operators/linalg): the Gram pass must match a
numpy brute force exactly (integer arithmetic), and the driver-side
eigen + broadcast projection must satisfy the algebraic PCA contracts
(orthonormal basis, diagonalized covariance, variance ordering,
planted-subspace recovery)."""

from __future__ import annotations

import numpy as np
import pytest

from vacancy_gpt_etl_pipeline_spark.operators.linalg import (
    pca_model,
    pca_project,
    quantized_gram,
)


def _vecs_df(spark, m):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(m)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


@pytest.fixture(scope="module")
def planted(spark):
    """120 vectors in R^6 that live (noisily) in a planted 2-D
    subspace: two strong orthogonal directions + tiny isotropic noise.
    float32-rounded like the real embedding column."""
    rng = np.random.default_rng(7)
    basis = np.linalg.qr(rng.normal(size=(6, 2)))[0]  # 6x2 orthonormal
    coeff = rng.normal(scale=[4.0, 2.0], size=(120, 2))
    m = (coeff @ basis.T + rng.normal(scale=0.05, size=(120, 6))).astype(
        np.float32
    )
    return m


def test_gram_matches_numpy_brute_force(spark, planted):
    got = {
        (r.i, r.j): (r.gram, r.sum_i, r.sum_j, r.n_vectors)
        for r in quantized_gram(_vecs_df(spark, planted), scale=1000).collect()
    }
    q = np.floor(planted.astype(np.float64) * 1000).astype(np.int64)
    g = q.T @ q
    s = q.sum(axis=0)
    assert len(got) == 6 * 7 // 2
    for (i, j), (gram, si, sj, n) in got.items():
        assert 1 <= i <= j <= 6
        assert gram == g[i - 1, j - 1]
        assert (si, sj) == (s[i - 1], s[j - 1])
        assert n == len(planted)


def test_gram_partitioning_invariance(spark, planted):
    """The partial-sum merge must make the result independent of how
    rows batch: 1 partition vs 8 give identical frames."""
    df = _vecs_df(spark, planted)
    one = {
        (r.i, r.j): r.gram
        for r in quantized_gram(df.coalesce(1)).collect()
    }
    many = {
        (r.i, r.j): r.gram
        for r in quantized_gram(df.repartition(8)).collect()
    }
    assert one == many


def test_pca_model_contracts(spark, planted):
    gram = quantized_gram(_vecs_df(spark, planted), scale=1000)
    comp, evals, mean = pca_model(gram, k=6, scale=1000)
    # orthonormal basis
    assert np.allclose(comp.T @ comp, np.eye(6), atol=1e-10)
    # eigenvalues descend
    assert all(a >= b for a, b in zip(evals, evals[1:]))
    # diagonalization: W^T C W = diag(evals) for the quantized cov
    q = np.floor(planted.astype(np.float64) * 1000) / 1000
    cov = np.cov(q, rowvar=False, ddof=1)
    assert np.allclose(comp.T @ cov @ comp, np.diag(evals), atol=1e-9)
    # planted 2-D subspace: top-2 carry ~all the variance
    assert evals[:2].sum() / evals.sum() > 0.99
    assert np.allclose(mean, q.mean(axis=0), atol=1e-12)


def test_pca_project_decorrelates(spark, planted):
    df = _vecs_df(spark, planted)
    gram = quantized_gram(df, scale=1000)
    comp, evals, mean = pca_model(gram, k=2, scale=1000)
    out = pca_project(df, comp, mean, out_col="pca")
    assert out.columns == ["vec_id", "pca"]
    rows = {r.vec_id: r.pca for r in out.collect()}
    proj = np.array([rows[i] for i in range(len(planted))])
    assert proj.shape == (120, 2)
    # projection of float32 data ≈ eigen-decomposition of the QUANTIZED
    # cov — variances match within the quantization error
    pcov = np.cov(proj, rowvar=False, ddof=1)
    assert np.allclose(np.diag(pcov), evals, rtol=1e-3)
    assert abs(pcov[0, 1]) < 1e-3 * evals[0]  # decorrelated
    assert np.allclose(proj.mean(axis=0), 0, atol=1e-3)

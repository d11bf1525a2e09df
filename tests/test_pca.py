"""train_pca / project_pca (operators/pca.py): the distributed moment
pass reproduces numpy PCA on the same data, components are
orthonormal with descending eigenvalues, projection is the matmul it
claims, and results are deterministic for a fixed partitioning."""

from __future__ import annotations

import numpy as np
import pytest

from northwind_etl_spark.operators.pca import project_pca, train_pca


def _corpus(rng, n=300, dim=16):
    # anisotropic: variance concentrated in a few directions
    basis = np.linalg.qr(rng.normal(size=(dim, dim)))[0]
    scales = np.linspace(5, 0.1, dim)
    data = rng.normal(size=(n, dim)) * scales @ basis.T + rng.normal(size=dim)
    return data


def _df(spark, data):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )


def numpy_pca(data, k):
    data = data.astype(np.float64)
    mean = data.mean(axis=0)
    cov = (data - mean).T @ (data - mean) / len(data)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_matches_numpy(spark):
    rng = np.random.default_rng(2)
    # float32 storage: quantize the reference input identically
    data = _corpus(rng).astype(np.float32).astype(np.float64)
    k = 5
    model = train_pca(_df(spark, data), k=k)
    mean, comps, evals = numpy_pca(data, k)
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.eigenvalues, evals, atol=1e-9)
    assert np.allclose(model.components, comps, atol=1e-7)
    # projection = (X - mean) @ W.T
    rows = project_pca(_df(spark, data), model).orderBy("vec_id").collect()
    got = np.array([r.pca for r in rows])
    assert np.allclose(got, (data - model.mean) @ model.components.T, atol=1e-9)


def test_orthonormal_descending_and_ratio(spark):
    rng = np.random.default_rng(9)
    data = _corpus(rng, n=200, dim=12)
    model = train_pca(_df(spark, data), k=12)
    w = model.components
    assert np.allclose(w @ w.T, np.eye(12), atol=1e-9)
    assert np.all(np.diff(model.eigenvalues) <= 1e-12)
    # full-rank fit explains (essentially) everything
    assert model.explained_ratio.sum() == pytest.approx(1.0, abs=1e-9)


def test_fixed_partitioning_determinism_and_errors(spark):
    rng = np.random.default_rng(4)
    data = _corpus(rng, n=120, dim=8)
    df = _df(spark, data).repartition(7, "vec_id")
    m1, m2 = train_pca(df, k=3), train_pca(df, k=3)
    assert np.array_equal(m1.components, m2.components)
    assert np.array_equal(m1.eigenvalues, m2.eigenvalues)
    with pytest.raises(ValueError, match="outside"):
        train_pca(_df(spark, data), k=99)
    with pytest.raises(ValueError, match="at least 2"):
        train_pca(_df(spark, data[:1]), k=1)

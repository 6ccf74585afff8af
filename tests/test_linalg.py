"""Distributed PCA vs numpy on the same data (operators/linalg.py)."""

import numpy as np
import pytest

from data_misc_tools_spark.operators.linalg import pca_fit, pca_transform


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from data_misc_tools_spark.session import load_tables

    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return mean, evals[order], evecs[:, order].T


def test_pca_fit_matches_numpy(spark, emb):
    x = np.asarray([np.asarray(r.embedding, dtype=np.float64)
                    for r in emb.collect()])
    model = pca_fit(emb, "embedding", k=6)
    mean, evals, comps = _numpy_pca(x, 6)

    assert model.n_rows == x.shape[0]
    np.testing.assert_allclose(model.mean, mean, atol=1e-10)
    np.testing.assert_allclose(model.explained_variance, evals, rtol=1e-8)
    # components match up to sign
    for got, want in zip(np.asarray(model.components), comps):
        dot = abs(float(got @ want))
        assert dot > 1 - 1e-8, dot
    # orthonormal rows
    c = np.asarray(model.components)
    np.testing.assert_allclose(c @ c.T, np.eye(6), atol=1e-10)
    # sign normalization: largest-|coeff| entry positive
    assert all(c[i, np.abs(c[i]).argmax()] > 0 for i in range(6))


def test_pca_fit_is_partitioning_invariant(spark, emb):
    m1 = pca_fit(emb.repartition(13), "embedding", k=3)
    m2 = pca_fit(emb.coalesce(1), "embedding", k=3)
    np.testing.assert_allclose(m1.mean, m2.mean, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(m1.components), np.asarray(m2.components), atol=1e-9
    )


def test_pca_transform_projects_and_reconstructs(spark, emb):
    model = pca_fit(emb, "embedding", k=6)
    out = pca_transform(emb, model, "embedding", out_col="pca")
    rows = out.select("vec_id", "embedding", "pca").collect()
    comps = np.asarray(model.components)
    mean = np.asarray(model.mean)
    for r in rows[:50]:
        want = (np.asarray(r.embedding, dtype=np.float64) - mean) @ comps.T
        np.testing.assert_allclose(r.pca, want, atol=1e-10)
    # k components capture more variance than any k random directions
    x = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    proj_var = np.asarray([np.asarray(r.pca) for r in rows]).var(axis=0).sum()
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.normal(size=(x.shape[1], 6)))
    rand_var = ((x - mean) @ q).var(axis=0).sum()
    assert proj_var > rand_var


def test_pca_skips_null_vectors(spark):
    rows = [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]), (4, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    model = pca_fit(df, "embedding", k=1)
    assert model.n_rows == 3
    out = {r.id: r.pca for r in pca_transform(df, model, "embedding").collect()}
    assert out[2] is None and out[1] is not None

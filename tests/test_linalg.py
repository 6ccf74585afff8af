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


class TestPcaPowerExact:
    @staticmethod
    def _shu(a: int, b: int) -> int:
        if a < 0:
            return -((2 * (-a) + b) // (2 * b))
        return (2 * a + b) // (2 * b)

    def _int_ref(self, X, iters):
        """Pure-python integer reference of the whole pipeline (float32
        quantization -> half-up means -> scatter -> signed L∞ rounds)."""
        import math
        import struct

        def f32(x):
            return struct.unpack("f", struct.pack("f", float(x)))[0]

        n, d = len(X), len(X[0])
        Q = [[math.floor(f32(x) * 64) for x in row] for row in X]
        T = [sum(Q[r][i] for r in range(n)) for i in range(d)]
        C = [self._shu(T[i], n) for i in range(d)]
        S = [
            [
                sum(Q[r][i] * Q[r][j] for r in range(n))
                - C[i] * T[j] - C[j] * T[i] + n * C[i] * C[j]
                for j in range(d)
            ]
            for i in range(d)
        ]
        v = [10**6] * d
        for _ in range(iters):
            w = [sum(S[i][j] * v[j] for j in range(d)) for i in range(d)]
            mx = max(abs(x) for x in w)
            v = [self._shu(w[i] * 10**6, mx) for i in range(d)]
        return Q, C, v

    def test_component_and_scores_match_integer_reference(self, spark):
        from data_misc_tools_spark.operators.linalg import (
            pca_power_scores_topk,
            pca_top_component_e6,
        )

        rng = np.random.default_rng(1)
        d = 16
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        X = rng.normal(size=(200, d)) * 0.1 + np.outer(
            rng.normal(size=200) * 0.9, u
        )
        rows = [(i, [float(x) for x in X[i]]) for i in range(200)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        Q, C, v = self._int_ref([r[1] for r in rows], iters=3)
        got = {r.dim_i: r.v_e6 for r in pca_top_component_e6(df, iters=3).collect()}
        assert got == {i: v[i] for i in range(d)}
        want = sorted(
            (
                (sum((Q[r][i] - C[i]) * v[i] for i in range(d)), r)
                for r in range(200)
            ),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        sc = pca_power_scores_topk(df, iters=3, top_k=5).collect()
        assert [(x.vec_id, x.score) for x in sc] == [(r, s) for s, r in want]

    def test_direction_matches_numpy_top_eigenvector(self, spark):
        from data_misc_tools_spark.operators.linalg import pca_top_component_e6

        rng = np.random.default_rng(7)
        d = 12
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        X = rng.normal(size=(300, d)) * 0.05 + np.outer(rng.normal(size=300), u)
        rows = [(i, [float(x) for x in X[i]]) for i in range(300)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        comp = pca_top_component_e6(df, iters=3).collect()
        vv = np.zeros(d)
        for r in comp:
            vv[r.dim_i] = r.v_e6
        # the integer scatter's top eigenvector (same quantization)
        Q, C, _ = self._int_ref([r[1] for r in rows], iters=0)
        S = np.array(
            [
                [
                    sum(Q[r][i] * Q[r][j] for r in range(300))
                    - C[i] * sum(Q[r][j] for r in range(300))
                    - C[j] * sum(Q[r][i] for r in range(300))
                    + 300 * C[i] * C[j]
                    for j in range(d)
                ]
                for i in range(d)
            ],
            dtype=float,
        )
        top = np.linalg.eigh(S)[1][:, -1]
        cos = abs(top @ vv) / (np.linalg.norm(top) * np.linalg.norm(vv))
        assert cos > 0.99, cos

    def test_linf_normalization_contract(self, spark):
        from data_misc_tools_spark.operators.linalg import pca_top_component_e6

        rng = np.random.default_rng(3)
        rows = [
            (i, [float(x) for x in rng.normal(size=8)]) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        comp = pca_top_component_e6(df, iters=2).collect()
        assert len(comp) == 8
        assert max(abs(r.v_e6) for r in comp) == 10**6

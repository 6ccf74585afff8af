"""Distributed linear algebra for embedding columns: PCA fit/transform.

Dimensionality reduction is the standard pre-pass over embedding
columns before compressed ANN (PQ on PCA-rotated vectors is the
classic OPQ-lite recipe) and before near-dup thresholding (noise
dimensions dilute cosine margins). No counterpart in the reference
(extension surface, like operators/similarity.py).

Scale shape — the only thing that moves over the wire is d×d:

* ``pca_fit`` computes the Gram matrix X'X, the column sum and the
  row count as PER-PARTITION partials inside an Arrow-batched
  ``mapInPandas`` (one numpy GEMM per batch — the same trick as
  similarity.py's GEMM twin), then sums the tiny (d², d, 1) partials
  driver-side. One corpus scan, no shuffle at all; the driver never
  sees a row, only ≤ num_partitions d×d matrices (d=64 → 32 KB each).
  Eigendecomposition of the d×d covariance happens on the driver with
  numpy — at embedding dimensionalities (d ≤ a few thousand) that is
  microseconds and needs no distributed solver.
* ``pca_transform`` broadcasts the (k×d) component matrix through the
  UDF closure and projects each batch with one GEMM — map-only,
  zero shuffle.

Determinism: eigenvector SIGN is mathematically arbitrary; to make
runs and engines reproducible each component is sign-normalized so
its largest-|coefficient| entry is positive (ties cannot occur at
float precision in practice; documented, not load-bearing).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    mean: "object"  # np.ndarray (d,)
    components: "object"  # np.ndarray (k, d) — rows are components
    explained_variance: "object"  # np.ndarray (k,)
    n_rows: int

    def explained_variance_ratio(self):
        import numpy as np

        total = float(self.total_variance)
        return np.asarray(self.explained_variance) / total if total else None

    total_variance: float = 0.0


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> PCAModel:
    """Fit a k-component PCA on an array<float>/array<double> column.

    One scan; driver-side reduction of per-partition (n, Σx, X'X)
    partials; numpy ``eigh`` on the d×d covariance. Rows with null
    vectors are skipped; all vectors must share one dimensionality.
    """
    import numpy as np

    def partials(batches):
        import pandas as pd

        n = 0
        s = None
        g = None
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    ).collect()
    if not rows:
        raise ValueError("pca_fit: no non-null vectors")
    n = sum(r.n for r in rows)
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r.g).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    # covariance from the Gram matrix: (X'X - n·μμ') / (n-1)
    denom = max(n - 1, 1)
    cov = (g - n * np.outer(mean, mean)) / denom
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign-normalize: largest-|coeff| entry of each component positive
    flip = np.sign(comps[np.arange(comps.shape[0]), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
        n_rows=n,
        total_variance=float(np.maximum(evals, 0.0).sum()),
    )


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project the vector column onto the fitted components — map-only
    Arrow-batched GEMM per batch, components shipped via closure.
    Output keeps every input column and appends ``out_col``
    (array<double>, length k); null vectors project to null.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(model.mean, dtype=np.float64)
    comps = np.asarray(model.components, dtype=np.float64)

    @pandas_udf("array<double>", F.PandasUDFType.SCALAR)
    def project(vs):
        import pandas as pd

        vals = list(vs)
        idx = [i for i, v in enumerate(vals) if v is not None]
        out = [None] * len(vals)
        if idx:
            x = np.asarray([np.asarray(vals[i], dtype=np.float64) for i in idx])
            proj = (x - mean) @ comps.T
            for j, i in enumerate(idx):
                out[i] = proj[j].tolist()
        return pd.Series(out)

    return df.withColumn(out_col, project(F.col(vec_col)))

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

    import pandas as pd

    def project(vs):
        vals = list(vs)
        idx = [i for i, v in enumerate(vals) if v is not None]
        out = [None] * len(vals)
        if idx:
            x = np.asarray([np.asarray(vals[i], dtype=np.float64) for i in idx])
            proj = (x - mean) @ comps.T
            for j, i in enumerate(idx):
                out[i] = proj[j].tolist()
        return pd.Series(out)

    # real annotation objects (inline hints are unresolvable strings
    # under `from __future__ import annotations` with pd closure-local)
    project.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    project = pandas_udf(project, "array<double>")

    return df.withColumn(out_col, project(F.col(vec_col)))


def _signed_half_up(num: str, den: str) -> str:
    """SQL for sign-split round-half-away-from-zero integer division:
    the repo's (2A + B) div (2B) half-up pattern extended to signed
    numerators (Spark `div` truncates toward zero while DuckDB `//`
    floors, so the pattern is only engine-portable on nonnegative
    operands — split the sign out first). ``den`` must be positive."""
    return (
        f"CASE WHEN {num} < 0"
        f" THEN -((2 * (-({num})) + {den}) div (2 * ({den})))"
        f" ELSE (2 * ({num}) + {den}) div (2 * ({den})) END"
    )


def _pca_power_parts(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    iters: int,
    scale: int,
):
    """Shared plumbing for the exact power-iteration PCA: returns
    (q, cmean, component) frames — SQ codes, half-up integer dim
    means, and the L∞-normalized e6 top component."""
    from pyspark.sql.window import Window

    from data_misc_tools_spark.operators.similarity import sq_quantize

    q = df.select(
        F.col(id_col).alias("__vid"),
        sq_quantize(F.col(vec_col), scale).alias("__qc"),
    ).localCheckpoint(eager=True)
    ex = q.select("__vid", F.posexplode("__qc").alias("__i", "__qi"))
    t = ex.groupBy("__i").agg(
        F.sum("__qi").cast("long").alias("t"),
        F.count("*").cast("long").alias("n"),
    )
    cmean = t.selectExpr(
        "__i", "t", "n", _signed_half_up("t", "n") + " AS c"
    ).localCheckpoint(eager=True)
    # Gram over the upper triangle: the double-posexplode emits
    # dim*(dim+1)/2 rows per vector that collapse map-side into
    # <= 2080 keys — the shuffle is CONSTANT-width however many rows
    # scan (the scatter matrix is the only thing that moves).
    pairs = (
        q.select("__qc")
        .select(F.posexplode("__qc").alias("__i", "__qi"), "__qc")
        .select("__i", "__qi", F.posexplode("__qc").alias("__j", "__qj"))
        .filter(F.col("__j") >= F.col("__i"))
    )
    gm = pairs.groupBy("__i", "__j").agg(
        F.sum(F.col("__qi") * F.col("__qj")).cast("long").alias("g")
    )
    ca = cmean.select(
        F.col("__i").alias("__i"), F.col("c").alias("ca"),
        F.col("t").alias("ta"), F.col("n").alias("n"),
    )
    cb = cmean.select(
        F.col("__i").alias("__j"), F.col("c").alias("cb"),
        F.col("t").alias("tb"),
    )
    # centered scatter from raw sums: S = G − cᵢTⱼ − cⱼTᵢ + n·cᵢcⱼ
    # (c is the half-up integer mean — exact arithmetic, documented
    # quantized centering)
    sfull = (
        gm.join(ca, "__i")
        .join(cb, "__j")
        .select(
            "__i", "__j",
            (
                F.col("g") - F.col("ca") * F.col("tb")
                - F.col("cb") * F.col("ta") + F.col("n") * F.col("ca") * F.col("cb")
            ).cast("long").alias("s"),
        )
    )
    smat = sfull.unionByName(
        sfull.filter(F.col("__i") != F.col("__j")).select(
            F.col("__j").alias("__i"), F.col("__i").alias("__j"), F.col("s")
        )
    ).localCheckpoint(eager=True)
    v = cmean.select("__i", F.lit(1_000_000).cast("long").alias("v"))
    # dim rows: single-partition by design (the constant key quiets
    # WindowExec's no-partition warning without changing the plan)
    w_all = Window.partitionBy(F.lit(0))
    for _ in range(iters):
        mv = (
            smat.join(v.select(F.col("__i").alias("__j"), "v"), "__j")
            .groupBy("__i")
            .agg(F.sum(F.col("s") * F.col("v")).cast("long").alias("w"))
            .select("__i", "w", F.max(F.abs(F.col("w"))).over(w_all).alias("mx"))
            .filter(F.col("mx") > 0)
        )
        v = mv.selectExpr(
            "__i", _signed_half_up("w * 1000000", "mx") + " AS v"
        ).localCheckpoint(eager=True)
    return q, cmean, v


def pca_top_component_e6(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    scale: int = 64,
) -> DataFrame:
    """Top principal direction by ENGINE-EXACT integer power iteration
    — the oracle-checkable twin of :func:`pca_fit`'s top component
    (pca_fit stays the production path: numpy ``eigh`` gives all k
    components at float precision; this one is hash-reproducible by a
    SQL engine, the pagerank_exact promotion pattern applied to
    linear algebra).

    Pipeline, all exact integers: SQ codes floor(x·scale) → per-dim
    half-up integer means (quantized centering, documented) → centered
    scatter matrix via the raw-sums expansion S = G − cᵢTⱼ − cⱼTᵢ +
    n·cᵢcⱼ (G from ONE double-posexplode aggregate whose shuffle is a
    constant ≤ dim² keys) → ``iters`` rounds of matvec + signed
    half-up L∞ normalization (max |w| via a single-partition window
    over the dim-row frame, so each round references the previous
    vector exactly ONCE — the unrolled-CTE plan rule). Sign-split
    half-up keeps Spark ``div`` == DuckDB ``//`` on the signed
    components.

    Overflow bound: |matvec| <= n·(2·scale)²·1e6·dim — inside int64 up
    to n ~ 2e6 rows at scale=64, dim=64; shrink ``scale`` (or drop the
    e6 to e3) beyond that.

    Output: (dim_i 0-based, v_e6) — L∞-normalized (max |v| = 1e6).
    """
    _, _, v = _pca_power_parts(df, id_col, vec_col, iters, scale)
    return v.select(F.col("__i").alias("dim_i"), F.col("v").alias("v_e6"))


def pca_power_scores_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    scale: int = 64,
    top_k: int = 20,
) -> DataFrame:
    """Project every vector onto the exact power-iteration top
    component (:func:`pca_top_component_e6`) and return the ``top_k``
    most-positive scores — "the documents most aligned with the
    corpus's dominant direction of variation", a standard curation
    diagnostic (the dominant direction is usually a language/template
    axis worth inspecting). Scores are exact BIGINTs:
    Σ_d (q_d − c_d)·v_d over centered integer codes; top-k is
    TakeOrderedAndProject. Output: (id_col, score)."""
    q, cmean, v = _pca_power_parts(df, id_col, vec_col, iters, scale)
    ex = q.select("__vid", F.posexplode("__qc").alias("__i", "__qi"))
    return (
        ex.join(cmean.select("__i", "c"), "__i")
        .join(v.select("__i", "v"), "__i")
        .groupBy("__vid")
        .agg(
            F.sum((F.col("__qi") - F.col("c")) * F.col("v"))
            .cast("long")
            .alias("score")
        )
        .orderBy(F.desc("score"), "__vid")
        .limit(top_k)
        .select(F.col("__vid").alias(id_col), "score")
    )

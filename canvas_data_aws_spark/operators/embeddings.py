"""Embedding-matrix operators: distributed PCA (fit + project).

The scale contract mirrors the engine's k-means driver (plans/llm_q.py::
_kmeans_assign): executors never hold more than a batch, the DRIVER never
holds more than O(dim^2) — the d x d second-moment matrix — regardless of
corpus size. The eigendecomposition of that d x d matrix is driver-side
numpy by design (d is 64-4096 for real embedding models; the matrix is
KB-MB, data-independent), exactly how Spark MLlib's own PCA computes it
(Gramian aggregate + local eigh). Projection is an Arrow-batched GEMM.

Second moments, not raw vectors, cross the wire: each Arrow batch emits
one partial-moment row (count, sum-vector, flattened X^T X), partials are
reduced by a (pos, value) element-wise sum — a shuffle of
O(partitions * d^2) skinny rows, bounded by cluster width times dimension,
never by row count.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class PcaModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) orthonormal rows, deterministic sign
    explained_variance: np.ndarray  # (k,) descending


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 4) -> PcaModel:
    """Fit PCA on an embedding column.

    One pass over the data: mapInPandas turns each Arrow batch into a single
    partial-moment row; the partials reduce via posexplode + groupBy(pos) —
    a fully distributed element-wise sum whose key space is d^2 + d + 1.
    The driver materializes only the reduced moments (O(d^2) doubles), forms
    the covariance, and runs a local symmetric eigendecomposition.

    Sign convention (eigenvectors are sign-ambiguous): each component is
    flipped so its largest-|coordinate| entry is positive — deterministic
    whenever eigenvalues are distinct, making results reproducible across
    runs and cluster layouts.
    """
    moment_schema = T.StructType(
        [T.StructField("m", T.ArrayType(T.DoubleType()), False)]
    )

    def _partial_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n = float(len(x))
            s = x.sum(axis=0)
            g = x.T @ x
            yield pd.DataFrame(
                {"m": [np.concatenate(([n], s, g.ravel())).tolist()]}
            )

    partials = df.select(vec_col).mapInPandas(_partial_moments, moment_schema)
    reduced = (
        partials.select(F.posexplode("m").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()  # d^2 + d + 1 rows — dimension-bounded, data-independent
    )
    flat = np.zeros(max(r["pos"] for r in reduced) + 1)
    for r in reduced:
        flat[r["pos"]] = r["val"]
    n = flat[0]
    d = int(round((-1 + np.sqrt(1 + 4 * (len(flat) - 1))) / 2))
    mean = flat[1 : 1 + d] / n
    gram = flat[1 + d :].reshape(d, d)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for j in range(comps.shape[0]):
        if comps[j, np.argmax(np.abs(comps[j]))] < 0:
            comps[j] = -comps[j]
    return PcaModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
    )


def pca_project(
    df: DataFrame, model: PcaModel, vec_col: str = "embedding", out_col: str = "pca"
) -> DataFrame:
    """Project vectors onto the fitted components: (x - mean) @ C^T as one
    Arrow-batched GEMM per batch. The (k, d) component matrix ships in the
    UDF closure (KBs); no shuffle — projection is row-local."""
    comps_t = model.components.T.copy()  # (d, k)
    mu = model.mean.copy()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(vs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        out = (x - mu) @ comps_t
        return pd.Series(list(out))

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def pca_whiten(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "white",
    eps: float = 1e-9,
) -> DataFrame:
    """PCA-whitening projection: ``(x - mean) @ C^T / sqrt(var + eps)`` —
    the projected coordinates rescaled to unit variance per component.
    Whitened embeddings are the standard preprocessing for cosine-based
    semantic dedup and retrieval (dominant directions stop swamping the
    similarity; see e.g. the post-processing in SimCSE/whitening-BERT
    literature). Same execution shape as :func:`pca_project`: the (k, d)
    components and the k scale factors ship in the Arrow UDF closure, the
    transform is one row-local GEMM per batch, zero exchanges."""
    comps_t = model.components.T.copy()  # (d, k)
    mu = model.mean.copy()
    scale = 1.0 / np.sqrt(model.explained_variance + eps)  # (k,)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _whiten(vs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        out = ((m - mu) @ comps_t) * scale
        return pd.Series(list(out))

    return df.withColumn(out_col, _whiten(F.col(vec_col)))


@dataclass(frozen=True)
class RidgeModel:
    weights: np.ndarray  # (d,) feature weights
    bias: float
    lam: float


def ridge_fit(
    df: DataFrame,
    target_col: str,
    vec_col: str = "embedding",
    lam: float = 1.0,
) -> RidgeModel:
    """Closed-form ridge regression of a scalar target on an embedding
    column — the "linear probe" evaluation of representation quality.

    Same execution contract as :func:`pca_fit`: ONE moment pass. Each Arrow
    batch emits a single partial row holding (n, X'^T X', X'^T y) for the
    bias-augmented design matrix X' = [X, 1]; partials reduce element-wise
    via posexplode + groupBy(pos) (key space (d+1)^2 + (d+1) + 1 —
    dimension-bounded, data-independent), and the driver solves the
    (d+1) x (d+1) normal equations (gram + n*lam*I') w = X'^T y with numpy
    (the bias row/col is not regularized). Executors never hold more than a
    batch; the driver never holds more than O(d^2) regardless of corpus
    size."""

    moment_schema = T.StructType(
        [T.StructField("m", T.ArrayType(T.DoubleType()), False)]
    )

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            xa = np.hstack([x, np.ones((len(x), 1))])
            y = pdf[target_col].to_numpy(dtype=np.float64)
            g = xa.T @ xa
            b = xa.T @ y
            yield pd.DataFrame(
                {"m": [np.concatenate(([float(len(x))], g.ravel(), b)).tolist()]}
            )

    partials = df.select(vec_col, target_col).mapInPandas(_partials, moment_schema)
    reduced = (
        partials.select(F.posexplode("m").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()  # (d+1)^2 + (d+1) + 1 rows — dimension-bounded
    )
    if not reduced:
        raise ValueError("ridge_fit: input has no rows")
    flat = np.zeros(max(r["pos"] for r in reduced) + 1)
    for r in reduced:
        flat[r["pos"]] = r["val"]
    n = flat[0]
    da = int(round((-1 + np.sqrt(1 + 4 * (len(flat) - 1))) / 2))  # d + 1
    if lam <= 0 and n < da:
        # Unregularized fit with fewer rows than unknowns: the gram matrix
        # is rank-deficient (rank <= n < d+1) — surface a clear error
        # instead of a numpy LinAlgError deep in solve(). With lam > 0 the
        # system (gram + n*lam*I, bias unregularized) is positive definite
        # for ANY n >= 1 — v'(G+reg)v = ||X'v||^2 + n*lam*||w||^2 vanishes
        # only at v = 0 because the all-ones bias column forces b = 0 once
        # w = 0 — so underdetermined ridge fits (d >> n) solve fine and are
        # a core legitimate use case.
        raise ValueError(
            f"ridge_fit: lam<=0 needs at least d+1={da} rows to identify "
            f"d weights + bias, got {int(n)}; pass lam > 0 for an "
            "underdetermined (regularized) fit"
        )
    gram = flat[1 : 1 + da * da].reshape(da, da)
    xty = flat[1 + da * da :]
    reg = np.eye(da) * (n * lam)
    reg[-1, -1] = 0.0  # never regularize the bias
    w = np.linalg.solve(gram + reg, xty)
    return RidgeModel(weights=w[:-1], bias=float(w[-1]), lam=lam)


def ridge_predict(
    df: DataFrame,
    model: RidgeModel,
    vec_col: str = "embedding",
    out_col: str = "pred",
) -> DataFrame:
    """Score rows with a fitted ridge model: x @ w + b as one Arrow-batched
    GEMV per batch. Weights ship in the UDF closure (KBs); row-local, no
    shuffle."""
    w = model.weights.copy()
    b = model.bias

    @F.pandas_udf(T.DoubleType())
    def _score(vs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series(x @ w + b)

    return df.withColumn(out_col, _score(F.col(vec_col)))


@dataclass(frozen=True)
class LogisticModel:
    weights: np.ndarray  # (d,) feature weights
    bias: float
    lam: float
    iterations: int


def logistic_fit(
    df: DataFrame,
    target_col: str,
    vec_col: str = "embedding",
    lam: float = 1e-3,
    iterations: int = 4,
) -> LogisticModel:
    """L2-regularized logistic regression by IRLS (Newton) — the
    classification probe next to :func:`ridge_fit`'s regression probe,
    and the shape of every model-based quality-classifier stage (DCLM /
    FineWeb-edu style) once labels are binary.

    Per iteration ONE distributed moment pass: each Arrow batch scores the
    CURRENT beta (shipped in the UDF closure, KBs) and emits a single
    partial (n, X'^T W X', X'^T (y - p)) for the bias-augmented design
    with W = diag(p(1-p)); partials reduce element-wise via the same
    dimension-bounded posexplode + groupBy(pos) as ridge_fit, and the
    driver applies the Newton step
        beta += (X'^T W X' + n*lam*I')^{-1} (X'^T(y-p) - n*lam*[w; 0])
    (bias unregularized). Driver state is O(d^2) per iteration; total
    exchange across the fit is iterations x (d+1)^2 rows — never
    data-sized. Iteration count is FIXED (no data-dependent convergence
    test), so the job graph is deterministic.
    """
    moment_schema = T.StructType(
        [T.StructField("m", T.ArrayType(T.DoubleType()), False)]
    )
    beta: np.ndarray | None = None  # None => zeros (p = 0.5 everywhere)

    for _ in range(iterations):
        beta_c = None if beta is None else beta.copy()

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                xa = np.hstack([x, np.ones((len(x), 1))])
                y = pdf[target_col].to_numpy(dtype=np.float64)
                if beta_c is None:
                    p = np.full(len(xa), 0.5)
                else:
                    # clip z: exp(-z) overflows past ~709 and saturated
                    # p=0/1 would zero the Hessian's bias row (bias is
                    # deliberately unregularized) — perfectly separable
                    # labels with large-norm embeddings hit exactly that
                    z = np.clip(xa @ beta_c, -30.0, 30.0)
                    p = 1.0 / (1.0 + np.exp(-z))
                w = np.maximum(p * (1.0 - p), 1e-9)
                g = xa.T @ (xa * w[:, None])
                r = xa.T @ (y - p)
                yield pd.DataFrame(
                    {
                        "m": [
                            np.concatenate(
                                ([float(len(x))], g.ravel(), r)
                            ).tolist()
                        ]
                    }
                )

        partials = df.select(vec_col, target_col).mapInPandas(
            _partials, moment_schema
        )
        reduced = (
            partials.select(F.posexplode("m").alias("pos", "val"))
            .groupBy("pos")
            .agg(F.sum("val").alias("val"))
            .collect()  # (d+1)^2 + (d+1) + 1 rows — dimension-bounded
        )
        if not reduced:
            raise ValueError("logistic_fit: input has no rows")
        flat = np.zeros(max(r["pos"] for r in reduced) + 1)
        for r in reduced:
            flat[r["pos"]] = r["val"]
        n = flat[0]
        da = int(round((-1 + np.sqrt(1 + 4 * (len(flat) - 1))) / 2))
        hess = flat[1 : 1 + da * da].reshape(da, da)
        grad = flat[1 + da * da :].copy()
        if beta is None:
            beta = np.zeros(da)
        reg = np.eye(da) * (n * lam)
        reg[-1, -1] = 0.0  # never regularize the bias
        grad -= reg @ beta  # penalty gradient (zero on the bias row)
        # hess + reg is positive definite in practice (W floored at 1e-9
        # after z-clipping keeps every diagonal strictly positive), but a
        # pathological fit can still be numerically singular — least-squares
        # is the safety net, not the hot path
        try:
            step = np.linalg.solve(hess + reg, grad)
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(hess + reg, grad, rcond=None)[0]
        beta = beta + step

    return LogisticModel(
        weights=beta[:-1], bias=float(beta[-1]), lam=lam, iterations=iterations
    )


def logistic_predict(
    df: DataFrame,
    model: LogisticModel,
    vec_col: str = "embedding",
    out_col: str = "p_hat",
) -> DataFrame:
    """Score rows with a fitted logistic model: sigmoid(x @ w + b) as one
    Arrow-batched GEMV per batch; weights in the closure, row-local."""
    w = model.weights.copy()
    b = model.bias

    @F.pandas_udf(T.DoubleType())
    def _score(vs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series(1.0 / (1.0 + np.exp(-(x @ w + b))))

    return df.withColumn(out_col, _score(F.col(vec_col)))

"""Distributed dimensionality reduction (PCA) over embedding columns.

The classic two-sided scale split: the DATA is unboundedly large but the
MODEL is dim-bounded, so the fit reduces the corpus to a (d + d^2)-value
moment summary in ONE map-combined pass (sums and co-moment sums), the
eigendecomposition happens on the driver over a d x d matrix (d = the
embedding dim, 64 here — microseconds, independent of corpus size), and
the projection is a map-only Arrow pass with the tiny component matrix
closed over. Nothing ever shuffles data-sized state; the only driver
traffic is the d^2 + d + 1 moment scalars.

Used in a training-data pipeline for embedding compaction before ANN
(PQ/SQ8 friends), cluster visualization, and drift monitoring in a
lower-rank space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel:
    """Fitted PCA state: ``mean`` (d,), ``components`` (k, d) rows =
    principal axes (orthonormal, deterministic sign: each axis's
    largest-|entry| coordinate is positive), ``explained_variance``
    (k,) descending, ``n`` observations."""

    def __init__(self, mean, components, explained_variance, n):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.components = np.asarray(components, dtype=np.float64)
        self.explained_variance = np.asarray(
            explained_variance, dtype=np.float64
        )
        self.n = int(n)


def _moment_partials(dim: int):
    """mapInPandas fn emitting per-batch moment partials as flat rows:
    idx -1 -> count, 0..d-1 -> sum x_i, d..d+d*d-1 -> sum x_i x_j
    (row-major). Per batch the emitted frame is d^2+d+1 rows regardless
    of batch size — the map-combine shape groupBy(idx).sum() needs."""

    def fn(batches):
        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            if mat.size == 0:
                continue
            if mat.shape[1] != dim:
                raise ValueError(
                    f"pca_fit: ragged embedding dim {mat.shape[1]} != {dim}"
                )
            s = mat.sum(axis=0)
            g = (mat.T @ mat).ravel()
            idx = np.concatenate(
                ([-1], np.arange(dim), dim + np.arange(dim * dim))
            )
            val = np.concatenate(([float(mat.shape[0])], s, g))
            yield pd.DataFrame({"idx": idx.astype("int64"), "val": val})

    return fn


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAModel:
    """Fit PCA in one distributed pass: Arrow moment partials ->
    map-combined sum per moment index -> d^2+d+1 scalars to the driver
    (bounded by DIM squared, never by rows) -> covariance eigh ->
    top-k axes, deterministic sign. Raises on empty input and ragged
    dims; k is clamped to d."""
    df = df.filter(F.col(vec_col).isNotNull())
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None or first["d"] is None:
        raise ValueError("pca_fit: empty input or null embeddings")
    dim = int(first["d"])
    k = min(k, dim)
    partials = df.select(F.col(vec_col).alias("vec")).mapInPandas(
        _moment_partials(dim), schema="idx long, val double"
    )
    rows = (
        partials.groupBy("idx").agg(F.sum("val").alias("val")).collect()
    )  # bounded: d^2 + d + 1 rows (d = embedding dim)
    acc = {int(r["idx"]): float(r["val"]) for r in rows}
    n = acc[-1]
    mean = np.array([acc[i] for i in range(dim)]) / n
    gram = np.array(
        [acc[dim + i] for i in range(dim * dim)]
    ).reshape(dim, dim) / n
    cov = gram - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize float slop before eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean, comps, np.maximum(evals[order], 0.0), n)


def pca_fit_fixed(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 24,
    quantize_dp: int = 9,
) -> PCAModel:
    """Deterministic, externally-replayable PCA fit — the r12
    attestation companion to :func:`pca_fit`: the same ONE-pass moment
    reduction, but the driver-side eigensolve is a DEFLATED POWER
    ITERATION with a fixed round count and scaled-integer quantization
    (floor(x*10^dp + 0.5)/10^dp — the hits_scores/quality_classifier
    replay discipline) applied to the covariance, every iterate, the
    eigenvalue, and each deflation. Both engines re-sync to the exact
    same quantized state at every step, so an external SQL replay
    (matvec + Gram-Schmidt correction + norm + quantize per round,
    argmax-|entry| first-index sign fix, rank-1 deflation) reproduces
    the components bit-for-bit — np.linalg.eigh cannot be replayed, a
    quantized power iteration can. Each round Gram-Schmidt-corrects
    against the already-extracted components (w -= C^T (C w)) so the
    basis stays orthonormal even when the spectrum is near-degenerate
    and a fixed round count cannot fully converge any single
    eigenvector; the pinned quality claim is Rayleigh-quotient
    near-optimality + orthonormality (per-component cosine vs eigh is
    ill-conditioned under near-degeneracy, by the Davis-Kahan bound).
    The unquantized eigh fit stays the production default."""
    df = df.filter(F.col(vec_col).isNotNull())
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None or first["d"] is None:
        raise ValueError("pca_fit_fixed: empty input or null embeddings")
    dim = int(first["d"])
    k = min(k, dim)
    partials = df.select(F.col(vec_col).alias("vec")).mapInPandas(
        _moment_partials(dim), schema="idx long, val double"
    )
    rows = (
        partials.groupBy("idx").agg(F.sum("val").alias("val")).collect()
    )  # bounded: d^2 + d + 1 rows
    acc = {int(r["idx"]): float(r["val"]) for r in rows}
    n = acc[-1]
    scale = 10.0 ** quantize_dp

    def q(a):
        return np.floor(np.asarray(a) * scale + 0.5) / scale

    mean_raw = np.array([acc[i] for i in range(dim)]) / n
    gram = np.array(
        [acc[dim + i] for i in range(dim * dim)]
    ).reshape(dim, dim) / n
    cov = gram - np.outer(mean_raw, mean_raw)
    cov = (cov + cov.T) / 2.0
    a_mat = q(cov)
    comps = []
    evs = []
    for _ in range(k):
        v = q(np.full(dim, 1.0 / np.sqrt(dim)))
        for _ in range(max(1, iters)):
            w = a_mat @ v
            if comps:
                cm = np.array(comps)
                w = w - cm.T @ (cm @ w)
            nrm = np.linalg.norm(w)
            v = q(w / nrm) if nrm else v
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        w = a_mat @ v
        lam = float(np.floor(float(v @ w) * scale + 0.5) / scale)
        comps.append(v)
        evs.append(lam)
        a_mat = q(a_mat - lam * np.outer(v, v))
    return PCAModel(
        q(mean_raw), np.array(comps), np.maximum(np.array(evs), 0.0), n
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project onto the fitted axes: map-only Arrow pass, (x - mean) @
    W^T per batch (one BLAS matmul), every other column carried
    through. Adds ``out_col`` array<double> of length k."""
    mean = model.mean
    comps = model.components

    @F.pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if mat.size == 0:
            return pd.Series([], dtype=object)
        out = (mat - mean) @ comps.T
        return pd.Series(list(out))

    return df.withColumn(out_col, proj(F.col(vec_col)))

"""r17: _lloyd's chunked/threaded assignment + segmented reduceat must
reproduce the single-call formulation exactly — chunking only changes
which rows share a BLAS call (per-row distances and argmin are
row-independent) and the in-place d build rounds identically
((g * -2) + c2 == c2 - 2*g in IEEE). Pinned bitwise on this
environment's BLAS for both the pooled (n*k >= _LLOYD_POOL_MIN) and the
serial small-fit path."""

import numpy as np

from indexlab_spark.operators.knn import _lloyd


def _lloyd_reference(train: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """The pre-r17 single-call shape (full d matrix, one reduceat)."""
    train = train.astype(np.float32, copy=False)
    centers = train[rng.choice(len(train), size=k, replace=False)].copy()
    for _ in range(iters):
        d = (centers * centers).sum(1)[None, :] - 2.0 * (train @ centers.T)
        a = d.argmin(1)
        order = np.argsort(a, kind="stable")
        xs, asort = train[order], a[order]
        counts = np.bincount(asort, minlength=k)
        nz = np.flatnonzero(counts)
        starts = np.zeros(k, dtype=np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        centers[nz] = np.add.reduceat(xs, starts[nz], axis=0) / counts[nz, None]
    return centers


def test_pooled_path_matches_reference():
    # 40003 x 64, k=250: n*k ~ 10M >> pool threshold; odd n exercises the
    # ragged last chunk, k=250 leaves empty cells most iterations
    train = np.random.default_rng(42).normal(size=(40003, 64))
    ref = _lloyd_reference(train, 250, 8, np.random.default_rng(11))
    got = _lloyd(train, 250, 8, np.random.default_rng(11))
    assert np.array_equal(ref, got)


def test_serial_small_fit_matches_reference():
    # PQ-codebook shape (n*k under the pool threshold -> single call)
    train = np.random.default_rng(1).normal(size=(2048, 8))
    ref = _lloyd_reference(train, 64, 8, np.random.default_rng(3))
    got = _lloyd(train, 64, 8, np.random.default_rng(3))
    assert np.array_equal(ref, got)

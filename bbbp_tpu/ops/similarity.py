"""Tanimoto similarity on the MXU: bit-set intersections as matmuls.

The reference has no similarity search; its kNN legs use Euclidean distance
on scaled features (Models/model_opt_20250130.py:413-457 KNeighbors*). For
binary fingerprints the chemistry-standard metric is Tanimoto
|A∩B| / |A∪B|; on TPU the [Nq, Nr] intersection matrix is ONE matmul of the
0/1 fingerprint matrices (popcounts are row sums), so the whole
neighbor search runs on the MXU with a single lax.top_k at the end.
Used as the regression stack's similarity leg and available for screening
nearest-neighbor lookups.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def tanimoto_topk(q: jnp.ndarray, r: jnp.ndarray, k: int):
    """(similarities [Nq, k], indices [Nq, k]) of the k most similar
    reference rows per query. q, r are 0/1 float32 [N, d] matrices."""
    inter = q @ r.T                                    # [Nq, Nr] on the MXU
    pop_q = q.sum(axis=1, keepdims=True)
    pop_r = r.sum(axis=1)[None, :]
    union = pop_q + pop_r - inter
    sim = inter / jnp.maximum(union, 1e-9)
    return jax.lax.top_k(sim, k)


class TanimotoKNNRegressor:
    """Similarity-weighted k-nearest-neighbor regression over binary
    fingerprints: pred = Σ sim_i·y_i / Σ sim_i over the top-k Tanimoto
    neighbors. sklearn-style fit/predict."""

    def __init__(self, n_neighbors: int = 10, power: float = 2.0):
        self.n_neighbors = n_neighbors
        self.power = power              # sim^power sharpens the weighting
        self._x: Optional[jnp.ndarray] = None
        self._y: Optional[jnp.ndarray] = None

    def fit(self, x, y) -> "TanimotoKNNRegressor":
        self._x = jnp.asarray((np.asarray(x) > 0), jnp.float32)
        self._y = jnp.asarray(y, jnp.float32)
        return self

    def predict(self, x) -> np.ndarray:
        q = jnp.asarray((np.asarray(x) > 0), jnp.float32)
        k = min(self.n_neighbors, self._x.shape[0])
        sim, idx = tanimoto_topk(q, self._x, k)
        w = jnp.maximum(sim, 1e-6) ** self.power
        return np.asarray((w * self._y[idx]).sum(1) / w.sum(1))


@jax.jit
def tanimoto_matrix(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Full [Nq, Nr] Tanimoto similarity matrix (one MXU matmul)."""
    inter = q @ r.T
    union = q.sum(1, keepdims=True) + r.sum(1)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


class TanimotoKernelRidge:
    """Kernel ridge regression with the Tanimoto kernel (a valid PSD kernel
    on bit sets — Gower/Tanimoto). Unlike the top-k kNN leg this uses the
    FULL similarity structure: alpha = (K + lam*I)^-1 (y - mean),
    pred = K(q, X) @ alpha + mean. On TPU the gram matrix is one bit-matmul
    and the solve is a tiny Cholesky — N is ~1k in the B3DB regression set."""

    def __init__(self, lam: float = 0.1):
        self.lam = lam
        self._x = None
        self._alpha = None
        self._mean = 0.0

    def fit(self, x, y) -> "TanimotoKernelRidge":
        self._x = jnp.asarray((np.asarray(x) > 0), jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        self._mean = float(y.mean())
        k = tanimoto_matrix(self._x, self._x)
        n = k.shape[0]
        self._alpha = jax.scipy.linalg.solve(
            k + self.lam * jnp.eye(n, dtype=k.dtype), y - self._mean,
            assume_a="pos")
        return self

    def predict(self, x) -> np.ndarray:
        q = jnp.asarray((np.asarray(x) > 0), jnp.float32)
        return np.asarray(tanimoto_matrix(q, self._x) @ self._alpha
                          + self._mean)


class TanimotoKNNClassifier(TanimotoKNNRegressor):
    def fit(self, x, y):
        return super().fit(x, np.asarray(y, np.float32))

    def predict_proba(self, x) -> np.ndarray:
        p = np.clip(super().predict(x), 0.0, 1.0)
        return np.stack([1 - p, p], axis=1)

    def predict(self, x) -> np.ndarray:
        return (super().predict(x) > 0.5).astype(np.int32)

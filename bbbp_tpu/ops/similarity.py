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


class TanimotoKNNClassifier(TanimotoKNNRegressor):
    def fit(self, x, y):
        return super().fit(x, np.asarray(y, np.float32))

    def predict_proba(self, x) -> np.ndarray:
        p = np.clip(super().predict(x), 0.0, 1.0)
        return np.stack([1 - p, p], axis=1)

    def predict(self, x) -> np.ndarray:
        return (super().predict(x) > 0.5).astype(np.int32)

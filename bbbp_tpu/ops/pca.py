"""PCA as XLA linear algebra: covariance eigendecomposition fit, matmul transform.

Replaces sklearn ``PCA`` (reference: Models/model_opt_20250130.py:379-386 —
PCA(30) on fingerprints; Models/model_train_bert.py:194-212 — PCA(100);
Models/model_opt.py — PCA(0.95) variance mode). Components carry sklearn's
sign convention (largest-|.|. element positive) so results are comparable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PCA:
    n_components: Union[int, float, None] = None
    mean_: Optional[jnp.ndarray] = None
    components_: Optional[jnp.ndarray] = None          # [k, d]
    explained_variance_: Optional[jnp.ndarray] = None  # [k]
    explained_variance_ratio_: Optional[jnp.ndarray] = None

    def fit(self, x) -> "PCA":
        x = jnp.asarray(x, dtype=jnp.float32)
        n, d = x.shape
        self.mean_ = jnp.mean(x, axis=0)
        xc = x - self.mean_
        if d <= n:
            # primal: eigendecompose the d×d covariance
            cov = (xc.T @ xc) / jnp.maximum(n - 1, 1)
            w, v = jnp.linalg.eigh(cov)          # ascending
            w = w[::-1]
            v = v[:, ::-1]
        else:
            # dual (d ≫ n, e.g. 49k-dim flattened images over ~1k molecules):
            # eigendecompose the n×n Gram matrix; right singular vectors are
            # recovered as V = Xᵀ U Σ⁻¹ — avoids the d×d covariance entirely
            gram = xc @ xc.T                      # [n, n]
            wg, u = jnp.linalg.eigh(gram)         # ascending
            wg = wg[::-1]
            u = u[:, ::-1]
            sigma = jnp.sqrt(jnp.maximum(wg, 1e-12))
            v = xc.T @ (u / sigma[None, :])       # [d, n], orthonormal cols
            w = wg / jnp.maximum(n - 1, 1)
        total_var = jnp.sum(jnp.clip(w, 0.0))
        ratio = jnp.clip(w, 0.0) / jnp.maximum(total_var, 1e-12)
        if self.n_components is None:
            k = min(n, d)
        elif isinstance(self.n_components, float):
            csum = np.cumsum(np.asarray(ratio))
            k = int(np.searchsorted(csum, self.n_components) + 1)
        else:
            k = int(min(self.n_components, min(n, d)))
        comp = v[:, :k].T                         # [k, d]
        # sklearn-style deterministic sign: max-|.| element of each comp >= 0
        idx = jnp.argmax(jnp.abs(comp), axis=1)
        signs = jnp.sign(comp[jnp.arange(k), idx])
        signs = jnp.where(signs == 0, 1.0, signs)
        self.components_ = comp * signs[:, None]
        self.explained_variance_ = w[:k]
        self.explained_variance_ratio_ = ratio[:k]
        return self

    def transform(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32)
        return (x - self.mean_) @ self.components_.T

    def fit_transform(self, x) -> jnp.ndarray:
        return self.fit(x).transform(x)

    def inverse_transform(self, z) -> jnp.ndarray:
        return jnp.asarray(z) @ self.components_ + self.mean_


def pca_per_batch(x: np.ndarray, n_components: int, batch_size: int = 100) -> np.ndarray:
    """Compat mode: PCA re-fit per consecutive 100-row batch (reference quirk,
    Descriptors/multi_input_data_preprocess_maccs_opt_IsolationForest_fixed_2.py:103-114)."""
    x = np.asarray(x, dtype=np.float32)
    out = np.zeros((len(x), n_components), dtype=np.float32)
    for start in range(0, len(x), batch_size):
        blk = x[start : start + batch_size]
        k = min(n_components, blk.shape[0], blk.shape[1])
        p = PCA(k).fit(blk)
        z = np.asarray(p.transform(blk))
        out[start : start + batch_size, :k] = z
    return out

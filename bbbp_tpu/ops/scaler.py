"""Standardization with global and per-batch (compat) fitting.

Replaces sklearn ``StandardScaler`` use throughout the reference. The final
reference preprocessors fit a scaler **per 100-row batch**
(reference: Descriptors/multi_input_data_preprocess_maccs_opt_IsolationForest_fixed_1.py:86-103)
— statistically dubious but it produced the published artifacts, so a
``batch_size`` compat mode reproduces it; the default fits globally.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclass
class StandardScaler:
    mean_: Optional[jnp.ndarray] = None
    scale_: Optional[jnp.ndarray] = None

    def fit(self, x) -> "StandardScaler":
        x = jnp.asarray(x, dtype=jnp.float32)
        self.mean_ = jnp.mean(x, axis=0)
        std = jnp.std(x, axis=0)
        self.scale_ = jnp.where(std < 1e-12, 1.0, std)
        return self

    def transform(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32)
        return (x - self.mean_) / self.scale_

    def fit_transform(self, x) -> jnp.ndarray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x) -> jnp.ndarray:
        return jnp.asarray(x) * self.scale_ + self.mean_


def standardize_per_batch(x: np.ndarray, batch_size: int = 100) -> np.ndarray:
    """Compat mode: independent fit per consecutive batch (reference quirk,
    Descriptors/..._fixed_1.py:86-103)."""
    x = np.asarray(x, dtype=np.float32)
    out = np.empty_like(x)
    for start in range(0, len(x), batch_size):
        blk = x[start : start + batch_size]
        mean = blk.mean(0)
        std = blk.std(0)
        std[std < 1e-12] = 1.0
        out[start : start + batch_size] = (blk - mean) / std
    return out

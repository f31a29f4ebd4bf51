"""Degree-2 interaction-only polynomial features as one XLA outer product.

Replaces ``PolynomialFeatures(degree=2, interaction_only=True,
include_bias=False)`` applied to the concatenated 30+30 PCA blocks
(reference: Descriptors/multi_input_data_preprocess_maccs_opt_IsolationForest_fixed_1.py:117-125).
Output layout matches sklearn: [x_1..x_d, x_1 x_2, x_1 x_3, ..., x_{d-1} x_d].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interaction_features(x) -> jnp.ndarray:
    """[N, d] → [N, d + d(d-1)/2] interaction-only degree-2 features."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n, d = x.shape
    iu, ju = np.triu_indices(d, k=1)
    outer = x[:, :, None] * x[:, None, :]          # [N, d, d] — fused by XLA
    pairs = outer[:, iu, ju]                        # [N, d(d-1)/2]
    return jnp.concatenate([x, pairs], axis=1)


def interaction_dim(d: int) -> int:
    return d + d * (d - 1) // 2

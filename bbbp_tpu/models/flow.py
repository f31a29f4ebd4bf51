"""Flow-MLP classifier (model family D / FL1-FL2).

Stack of Linear+ReLU+Dropout blocks with an inverse path, CE classifier head
(reference: Descriptors/model_train_flow.py:30-75 FlowLayer/FlowModel). The
reference's ``reverse`` path is unused in training but part of the API; here
each FlowLayer keeps square weight matrices so the reverse is a true
(pseudo-)inverse mapping.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class FlowLayer(nn.Module):
    dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, reverse: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.dim, self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if reverse:
            # inverse of y = relu(xW+b) on the active set: x ≈ (y−b)W⁻¹
            w_inv = jnp.linalg.pinv(kernel)
            return ((x.astype(jnp.float32) - bias) @ w_inv).astype(self.dtype)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        y = nn.relu(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class FlowModel(nn.Module):
    hidden_dim: int = 128
    n_layers: int = 3
    n_classes: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")(
            x.astype(self.dtype))
        for i in range(self.n_layers):
            x = FlowLayer(self.hidden_dim, self.dropout, self.dtype,
                          name=f"flow{i}")(x, train)
        logits = nn.Dense(self.n_classes, dtype=jnp.float32, name="head")(
            x.astype(jnp.float32))
        return logits

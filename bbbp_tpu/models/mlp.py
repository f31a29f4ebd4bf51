"""Dual-branch MLP regressor (model family B1/B3/B5).

Fingerprint branch fp→512→256→128, image branch flat→1024→256→128, fused head
concat(256)→256→128→64→1 with BatchNorm + Dropout
(reference: Models/multi_input_data_regression_opt.py:41-85). bfloat16 compute.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class _Branch(nn.Module):
    dims: Sequence[int]
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DualBranchMLP(nn.Module):
    fp_dims: Sequence[int] = (512, 256, 128)
    img_dims: Sequence[int] = (1024, 256, 128)
    head_dims: Sequence[int] = (256, 128, 64)
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fp, img_flat, train: bool = False):
        f = _Branch(self.fp_dims, self.dropout, self.dtype, name="fp_branch")(fp, train)
        g = _Branch(self.img_dims, self.dropout, self.dtype, name="img_branch")(
            img_flat, train)
        x = jnp.concatenate([f, g], axis=-1)
        for d in self.head_dims:
            x = nn.Dense(d, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out = nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
        return out[..., 0]

"""Attention-fusion heads joining the fingerprint and image branches.

Three fusion variants, matching the reference's evolution (SURVEY.md §2.5):

- ``MultiHeadAttentionFusion`` — 4 additive-attention heads over the
  concatenated branch embeddings, softmax over heads, weighted sum
  (reference: Models/multi_input_data_regression_opt_transformer_cnn_20250113.py:48-65).
- ``AttentionFusion`` — single additive gate, elementwise reweighting
  (reference: Models/multi_input_data_regression_opt_transformer_cnn_rdkit.py:59-66).
- ``MultiModalAttentionFusion`` — per-modality attention scalars + cross-modal
  projection, softmax over the two modality weights, concat(fp_w, img_w, cross)
  (reference: Models/..._opt_20250107_network.py:51-107).

All are small dense blocks — XLA fuses them into the surrounding matmuls;
computation runs in bfloat16 with f32 parameters.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class MultiHeadAttentionFusion(nn.Module):
    """heads × (Linear→tanh→Linear→scalar) over concat embedding; softmax over
    heads; output = Σ_h w_h · (V_h @ concat)."""

    num_heads: int = 4
    out_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fp_emb: jnp.ndarray, img_emb: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([fp_emb, img_emb], axis=-1).astype(self.dtype)
        # head scores: [B, H]
        scores = []
        values = []
        for h in range(self.num_heads):
            s = nn.Dense(64, dtype=self.dtype, name=f"score{h}_1")(x)
            s = jnp.tanh(s)
            s = nn.Dense(1, dtype=self.dtype, name=f"score{h}_2")(s)
            scores.append(s)
            values.append(nn.Dense(self.out_dim, dtype=self.dtype, name=f"value{h}")(x))
        w = nn.softmax(jnp.concatenate(scores, axis=-1), axis=-1)   # [B, H]
        v = jnp.stack(values, axis=1)                                # [B, H, D]
        return jnp.einsum("bh,bhd->bd", w.astype(self.dtype), v)


class AttentionFusion(nn.Module):
    """Single additive gate: sigmoid(W2·tanh(W1·x)) elementwise reweight."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fp_emb: jnp.ndarray, img_emb: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([fp_emb, img_emb], axis=-1).astype(self.dtype)
        g = nn.Dense(x.shape[-1], dtype=self.dtype)(jnp.tanh(
            nn.Dense(64, dtype=self.dtype)(x)))
        return x * nn.sigmoid(g)


class MultiModalAttentionFusion(nn.Module):
    """Per-modality scalar attention + cross projection:
    softmax([a_fp, a_img]) weights each modality; a cross-modal projection of
    the concat is appended → concat(w_fp·fp, w_img·img, cross)."""

    cross_dim: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fp_emb: jnp.ndarray, img_emb: jnp.ndarray) -> jnp.ndarray:
        fp_emb = fp_emb.astype(self.dtype)
        img_emb = img_emb.astype(self.dtype)
        a_fp = nn.Dense(1, dtype=self.dtype, name="attn_fp")(jnp.tanh(fp_emb))
        a_img = nn.Dense(1, dtype=self.dtype, name="attn_img")(jnp.tanh(img_emb))
        w = nn.softmax(jnp.concatenate([a_fp, a_img], axis=-1), axis=-1)
        cross = nn.Dense(self.cross_dim, dtype=self.dtype, name="cross")(
            jnp.concatenate([fp_emb, img_emb], axis=-1))
        return jnp.concatenate(
            [fp_emb * w[:, :1], img_emb * w[:, 1:2], cross], axis=-1)

"""Packed-bit fingerprint ops: 32× smaller host→device transfers + a Pallas
kernel fusing bit-unpack into the projection matmul.

The screening path ships fingerprints host→TPU each chunk; dense f32 2048-bit
vectors are 8 KB/molecule. Packed uint32 words are 256 B/molecule — the
unpack happens ON the TPU inside the same kernel that performs the
scaler+PCA projection (algebra: for x ∈ {0,1},
z = ((x−μ)/σ − μ_p)·C = x·C′ + c0 with C′ = C/σ, c0 = −(μ/σ + μ_p)·C —
one matmul over unpacked bits plus a constant).

`packed_project` dispatches to the Pallas TPU kernel; a pure-jnp fallback
covers CPU tests and is the numerical reference.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_bits(dense: np.ndarray) -> np.ndarray:
    """[N, n_bits] {0,1} float/int → [N, n_bits/32] uint32 (little-endian bits)."""
    n, d = dense.shape
    assert d % 32 == 0, "bit width must be a multiple of 32"
    b = (np.asarray(dense) > 0.5).astype(np.uint8)
    # little-bit-order pack into uint32 words
    packed = np.packbits(b.reshape(n, d // 8, 8)[:, :, ::-1], axis=-1)
    return np.ascontiguousarray(packed.reshape(n, d // 8)).view(np.uint32)


def unpack_bits_jnp(packed: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """[N, W] uint32 → [N, n_bits] f32 (numerical reference)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(packed.shape[0], -1)[:, :n_bits].astype(jnp.float32)


def project_weights(scaler_mean: np.ndarray, scaler_scale: np.ndarray,
                    pca_mean: np.ndarray, pca_components: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Fold scaler+PCA into (W' [d, k], c0 [k]) for binary inputs."""
    c = pca_components.T                               # [d, k]
    w = c / scaler_scale[:, None]
    c0 = -((scaler_mean / scaler_scale + pca_mean) @ c)
    return w.astype(np.float32), c0.astype(np.float32)


def _packed_project_jnp(packed, w, c0):
    x = unpack_bits_jnp(packed, w.shape[0])
    return x @ w + c0


def _packed_project_pallas(packed, w, c0, block_rows: int = 256):
    """Pallas TPU kernel: unpack uint32 words → bf16 bits in VMEM → MXU matmul
    with the folded projection weights; weights stay resident per grid step.

    Tile hygiene for Mosaic: the output/lane dimension is padded to 128, the
    bias rides as a (1, k_pad) row, and the unpack produces exactly
    words×32 == d bit columns (weights pre-padded when d is narrower)."""
    from jax.experimental import pallas as pl

    n, words = packed.shape
    d, k = w.shape
    d_full = words * 32
    if d < d_full:
        w = jnp.pad(w, ((0, d_full - d), (0, 0)))
    k_pad = max(128, (k + 127) // 128 * 128)
    if k < k_pad:
        w = jnp.pad(w, ((0, 0), (0, k_pad - k)))
        c0 = jnp.pad(c0, (0, k_pad - k))
    c0_2d = c0.reshape(1, k_pad)
    # pltpu.repeat TILES the word vector ([w0..wW, w0..wW, ...]); lane c of
    # the unpacked row is then bit (c // words) of word (c % words), i.e.
    # dense bit (c % words)*32 + c // words — permute the weight rows to match
    lanes = np.arange(d_full)
    perm = (lanes % words) * 32 + lanes // words
    w = w[jnp.asarray(perm), :]
    pad_rows = (-n) % block_rows
    if pad_rows:
        packed = jnp.pad(packed, ((0, pad_rows), (0, 0)))
    n_pad = packed.shape[0]

    def kernel(p_ref, w_ref, c0_ref, o_ref):
        from jax.experimental.pallas import tpu as pltpu

        pk = p_ref[:]                                   # [block, words] uint32
        # 2-D unpack (Mosaic-friendly, no 3-D intermediates): repeat each word
        # 32× along lanes, then shift by (lane % 32) and mask the low bit
        rep = pltpu.repeat(pk, 32, axis=1)              # [block, words*32] tiled
        lane = jax.lax.broadcasted_iota(jnp.uint32, rep.shape, 1)
        bits = (rep >> (lane // jnp.uint32(words))) & jnp.uint32(1)
        x = bits.astype(jnp.int32).astype(jnp.bfloat16)
        o_ref[:] = (
            jnp.dot(x, w_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + c0_ref[:]
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, words), lambda i: (i, 0)),
            pl.BlockSpec((d_full, k_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, k_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
    )(packed, w, c0_2d)
    return out[:n, :k]


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def packed_project(packed: jnp.ndarray, w: jnp.ndarray, c0: jnp.ndarray,
                   use_pallas: bool = True) -> jnp.ndarray:
    """[N, W] uint32 packed bits → [N, k] projected features."""
    if use_pallas and jax.devices()[0].platform != "cpu":
        return _packed_project_pallas(packed, w, c0)
    return _packed_project_jnp(packed, w, c0)

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
    with the folded projection weights; weights stay resident per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, words = packed.shape
    d, k = w.shape
    pad_rows = (-n) % block_rows
    if pad_rows:
        packed = jnp.pad(packed, ((0, pad_rows), (0, 0)))
    n_pad = packed.shape[0]

    def kernel(p_ref, w_ref, c0_ref, o_ref):
        pk = p_ref[:]                                   # [block, words] uint32
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
        bits = (pk[:, :, None] >> shifts) & jnp.uint32(1)
        x = bits.reshape(pk.shape[0], words * 32)[:, :d].astype(jnp.bfloat16)
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
            pl.BlockSpec((d, k), lambda i: (0, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
    )(packed, w, c0)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def packed_project(packed: jnp.ndarray, w: jnp.ndarray, c0: jnp.ndarray,
                   use_pallas: bool = True) -> jnp.ndarray:
    """[N, W] uint32 packed bits → [N, k] projected features."""
    if use_pallas and jax.devices()[0].platform != "cpu":
        return _packed_project_pallas(packed, w, c0)
    return _packed_project_jnp(packed, w, c0)

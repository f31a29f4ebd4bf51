"""Class-imbalance resampling: SMOTE, Tomek-link removal, SMOTETomek.

Replaces ``imblearn.combine.SMOTETomek`` (not in the image) used by the final
classification pipeline (reference: Models/model_opt_20250130.py:393-394) and
the plain SMOTE of the earlier variant (reference: Models/model_opt.py:109-130).
kNN searches run as one JAX distance matmul — O(N²d) on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1)
    return jnp.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)


def smote(x: np.ndarray, y: np.ndarray, k: int = 5, seed: int = 0
          ) -> Tuple[np.ndarray, np.ndarray]:
    """Oversample the minority class to parity by kNN interpolation."""
    x = np.asarray(x, dtype=np.float32)
    y = np.asarray(y).astype(np.int32)
    classes, counts = np.unique(y, return_counts=True)
    maj = classes[np.argmax(counts)]
    rng = np.random.default_rng(seed)
    new_x, new_y = [x], [y]
    for c in classes:
        if c == maj:
            continue
        need = int(counts.max() - (y == c).sum())
        if need <= 0:
            continue
        xc = x[y == c]
        if len(xc) < 2:
            continue
        d = np.array(_pairwise_sq_dists(jnp.asarray(xc), jnp.asarray(xc)))
        np.fill_diagonal(d, np.inf)
        kk = min(k, len(xc) - 1)
        nn = np.argsort(d, axis=1)[:, :kk]          # [nc, kk]
        base = rng.integers(0, len(xc), size=need)
        pick = nn[base, rng.integers(0, kk, size=need)]
        gap = rng.random((need, 1), dtype=np.float32)
        synth = xc[base] + gap * (xc[pick] - xc[base])
        new_x.append(synth.astype(np.float32))
        new_y.append(np.full(need, c, dtype=np.int32))
    return np.concatenate(new_x), np.concatenate(new_y)


def tomek_links(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask removing majority members of Tomek links
    (mutual nearest neighbors of opposite class)."""
    x = np.asarray(x, dtype=np.float32)
    y = np.asarray(y).astype(np.int32)
    d = np.array(_pairwise_sq_dists(jnp.asarray(x), jnp.asarray(x)))
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    classes, counts = np.unique(y, return_counts=True)
    maj = classes[np.argmax(counts)]
    keep = np.ones(len(x), dtype=bool)
    for i in range(len(x)):
        j = nn[i]
        if nn[j] == i and y[i] != y[j]:
            # remove only the majority-class member (imblearn default)
            if y[i] == maj:
                keep[i] = False
            elif y[j] == maj:
                keep[j] = False
    return keep


def smote_tomek(x: np.ndarray, y: np.ndarray, k: int = 5, seed: int = 0
                ) -> Tuple[np.ndarray, np.ndarray]:
    """SMOTE to parity then Tomek-link cleaning
    (reference: Models/model_opt_20250130.py:393-394)."""
    xs, ys = smote(x, y, k=k, seed=seed)
    keep = tomek_links(xs, ys)
    return xs[keep], ys[keep]

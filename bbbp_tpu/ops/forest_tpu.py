"""Fully on-device GBDT / random-forest TRAINING — histograms on the MXU.

The reference trains XGBoost/CatBoost/RF on host CPUs
(Models/multi_input_data_regression_opt_transformer_cnn_20250113.py:262-391);
this image has a single CPU core, so host training is the bottleneck. Here the
entire boosting loop runs in ONE jit on the TPU:

- features are quantile-binned once on host (uint8, ≤64 bins);
- per level, gradient/hessian histograms are computed as one-hot **matmuls**
  — einsum('np,nq->pq') of the node-assignment one-hot against the
  (feature×bin) one-hot — i.e. the MXU does the split search;
- trees use an implicit full-binary layout (level l = 2^l nodes) so every
  shape is static; dead nodes degrade to always-go-left;
- the scan over trees updates predictions in-place via the final node
  assignment (no traversal needed during training);
- row subsampling = Bernoulli mask on (g, h); RF bootstrap = Poisson(1)
  sample weights; column subsampling = per-tree feature mask on the gains;
  oblivious (CatBoost-style) mode sums gains over the level before argmax.

Inference reuses the same implicit layout: D gather/compare steps, batch-
parallel, mesh-shardable. Estimator classes mirror bbbp_tpu.ops.forest's API.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bbbp_tpu.ops.forest import BinMapper, MAX_BINS


@dataclass
class DenseTreeEnsemble:
    """Implicit-layout forest: level-l internal nodes at flat [2^l-1, 2^{l+1}-1)."""

    feat: jnp.ndarray     # [T, 2^D - 1] int32
    thr: jnp.ndarray      # [T, 2^D - 1] f32 — go right iff x[f] > thr
    leaf: jnp.ndarray     # [T, 2^D] f32
    depth: int
    base_score: float
    tree_scale: float

    def raw_predict(self, x: jnp.ndarray) -> jnp.ndarray:
        """Gather-free routing evaluation (MXU-friendly): one-hot feature
        selection as a matmul, then level-wise route products — profiling on
        v5e showed the position-gather traversal 25× slower (gathers over
        [n, T] dominate); this form is pure matmul + elementwise."""
        return _dense_predict_route(self.feat, self.thr, self.leaf,
                                    jnp.asarray(x, jnp.float32), self.depth,
                                    self.base_score, self.tree_scale)

    def raw_predict_gather(self, x: jnp.ndarray) -> jnp.ndarray:
        return _dense_predict(self.feat, self.thr, self.leaf,
                              jnp.asarray(x, jnp.float32), self.depth,
                              self.base_score, self.tree_scale)


@functools.partial(jax.jit, static_argnums=(4,))
def _dense_predict(feat, thr, leaf, x, depth, base_score, tree_scale):
    n = x.shape[0]
    T = feat.shape[0]
    pos = jnp.zeros((n, T), dtype=jnp.int32)
    t_idx = jnp.arange(T)[None, :]
    for l in range(depth):
        flat = (1 << l) - 1 + pos
        f = feat[t_idx, flat]                        # [n, T]
        t = thr[t_idx, flat]
        xv = jnp.take_along_axis(x, f, axis=1)
        pos = 2 * pos + (xv > t).astype(jnp.int32)
    vals = leaf[t_idx, pos]
    return base_score + tree_scale * jnp.sum(vals, axis=1)


@functools.partial(jax.jit, static_argnums=(4,))
def _dense_predict_route(feat, thr, leaf, x, depth, base_score, tree_scale):
    """Evaluate every internal node's comparison via one one-hot matmul, then
    route probabilities down the implicit tree with aligned slices — no
    gathers anywhere. Row-chunked to bound the [rows, T, 2^D] route tensor."""
    n, F = x.shape
    T, n_internal = feat.shape
    sel = jax.nn.one_hot(feat.reshape(-1), F, dtype=jnp.float32)  # [T*I, F]

    def eval_rows(xr):
        rows = xr.shape[0]
        # HIGHEST precision: the default TPU bf16 matmul truncates x, flipping
        # comparisons for values near thresholds (quantile edges ARE data
        # values); full-f32 selection keeps parity with the gather traversal
        xg = jnp.matmul(xr, sel.T,
                        precision=jax.lax.Precision.HIGHEST
                        ).reshape(rows, T, n_internal)
        go_right = (xg > thr[None]).astype(jnp.float32)     # [rows, T, I]
        route = jnp.ones((rows, T, 1), jnp.float32)
        off = 0
        for l in range(depth):
            width = 1 << l
            d = go_right[:, :, off:off + width]
            off += width
            route = jnp.stack([route * (1 - d), route * d], axis=-1
                              ).reshape(rows, T, 2 * width)
        vals = jnp.einsum("ntl,tl->nt", route, leaf)
        return base_score + tree_scale * jnp.sum(vals, axis=1)

    chunk = 4096
    if n <= chunk:
        return eval_rows(x)
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    out = jax.lax.map(eval_rows, xp.reshape(-1, chunk, F))
    return out.reshape(-1)[:n]


def _grow_level(pos, flat_bin_keys, g, h, l, F, B, lam, min_child, col_mask,
                oblivious):
    """One level of split search for all current nodes.

    pos: [n] node position within level (0..2^l)
    flat_bin_keys: [n, F] int32 = f*B + bin(x_f), precomputed once
    returns (feat_l [2^l], bin_l [2^l], has_split [2^l])
    """
    nodes = 1 << l
    # exact f32 histograms via segment_sum over [n*Fc] scatter keys — O(n·F)
    # work regardless of level width (a one-hot matmul would be
    # O(n·nodes·F·B) and explode at deep levels). Features are processed in
    # chunks: very wide single scatters (~2k features × deep levels) crash
    # the TPU worker, and chunking also caps the segment-buffer size.
    F_CHUNK = 256
    hg_parts, hh_parts = [], []
    for f0 in range(0, F, F_CHUNK):
        fc = min(F_CHUNK, F - f0)
        # chunk-local keys: subtract the chunk's bin-key offset
        keys = (pos[:, None] * (fc * B)
                + (flat_bin_keys[:, f0:f0 + fc] - f0 * B)).ravel()
        vg = jnp.broadcast_to(g[:, None], (g.shape[0], fc)).ravel()
        vh = jnp.broadcast_to(h[:, None], (h.shape[0], fc)).ravel()
        hg_parts.append(jax.ops.segment_sum(
            vg, keys, num_segments=nodes * fc * B).reshape(nodes, fc, B))
        hh_parts.append(jax.ops.segment_sum(
            vh, keys, num_segments=nodes * fc * B).reshape(nodes, fc, B))
    hg = jnp.concatenate(hg_parts, axis=1) if len(hg_parts) > 1 else hg_parts[0]
    hh = jnp.concatenate(hh_parts, axis=1) if len(hh_parts) > 1 else hh_parts[0]
    gl = jnp.cumsum(hg, axis=2)
    hl = jnp.cumsum(hh, axis=2)
    tg = gl[:, :, -1:]
    th = hl[:, :, -1:]
    gr = tg - gl
    hr = th - hl
    gain = (gl ** 2 / (hl + lam) + gr ** 2 / (hr + lam)
            - tg ** 2 / (th + lam))
    valid = (hl >= min_child) & (hr >= min_child) & col_mask[None, :, None]
    gain = jnp.where(valid, gain, -jnp.inf)
    if oblivious:
        total = jnp.where(jnp.isfinite(gain), gain, 0.0).sum(axis=0) \
            + jnp.where(jnp.isinf(gain).any(axis=0), -jnp.inf, 0.0)
        best = jnp.argmax(total)
        f_best = jnp.full((nodes,), best // B, dtype=jnp.int32)
        b_best = jnp.full((nodes,), best % B, dtype=jnp.int32)
        has_split = jnp.full((nodes,), jnp.isfinite(total.reshape(-1)[best]))
    else:
        flat_gain = gain.reshape(nodes, F * B)
        best = jnp.argmax(flat_gain, axis=1)                      # [nodes]
        best_gain = jnp.take_along_axis(flat_gain, best[:, None], axis=1)[:, 0]
        f_best = (best // B).astype(jnp.int32)
        b_best = (best % B).astype(jnp.int32)
        has_split = jnp.isfinite(best_gain) & (best_gain > 0)
    # dead nodes: everything goes left (bin threshold = B-1)
    f_best = jnp.where(has_split, f_best, 0)
    b_best = jnp.where(has_split, b_best, B - 1)
    return f_best, b_best, has_split


def _fit_forest_device(xb, edge_vals, y, lr, lam, min_child, subsample,
                       colsample, base_score, key, *, task: str,
                       n_trees: int, depth: int, oblivious: bool, rf: bool):
    """One jit: scan over trees, python-unrolled levels (static depth).

    Hyperparameters (lr, lam, ..., base_score, key) are TRACED so per-fold /
    per-seed refits reuse one compilation — only (task, n_trees, depth,
    oblivious, rf) and array shapes trigger recompiles.
    """
    n, F = xb.shape
    B = MAX_BINS
    n_internal = (1 << depth) - 1
    n_leaves = 1 << depth

    xb_i = xb.astype(jnp.int32)
    flat_bin_keys = jnp.arange(F, dtype=jnp.int32)[None, :] * B + xb_i  # [n, F]
    y = jnp.asarray(y, jnp.float32)

    def tree_step(carry, key):
        preds = carry
        k1, k2, k3 = jax.random.split(key, 3)
        if rf:
            w = jax.random.poisson(k1, 1.0, (n,)).astype(jnp.float32)
            g = -y * w
            h = w
        else:
            if task == "reg":
                g = preds - y
                h = jnp.ones_like(y)
            else:
                p = jax.nn.sigmoid(preds)
                g = p - y
                h = jnp.maximum(p * (1 - p), 1e-6)
            # traced subsample rate: rate >= 1.0 keeps every row
            m = (jax.random.uniform(k2, (n,)) < subsample).astype(jnp.float32)
            g = g * m
            h = h * m
        col_mask = jax.random.uniform(k3, (F,)) < colsample
        col_mask = col_mask.at[jnp.argmax(col_mask)].set(True)  # ≥1 feature

        feat_flat = jnp.zeros((n_internal,), jnp.int32)
        bin_flat = jnp.zeros((n_internal,), jnp.int32)
        pos = jnp.zeros((n,), jnp.int32)
        for l in range(depth):
            f_l, b_l, _ = _grow_level(pos, flat_bin_keys, g, h, l, F, B, lam,
                                      min_child, col_mask, oblivious)
            off = (1 << l) - 1
            feat_flat = jax.lax.dynamic_update_slice(feat_flat, f_l, (off,))
            bin_flat = jax.lax.dynamic_update_slice(bin_flat, b_l, (off,))
            xf = jnp.take_along_axis(xb_i, f_l[pos][:, None], axis=1)[:, 0]
            pos = 2 * pos + (xf > b_l[pos]).astype(jnp.int32)

        gs = jax.ops.segment_sum(g, pos, num_segments=n_leaves)
        hs = jax.ops.segment_sum(h, pos, num_segments=n_leaves)
        leaf = -gs / (hs + lam)
        if not rf:
            preds = preds + lr * leaf[pos]
        thr_flat = edge_vals[feat_flat, bin_flat]
        return preds, (feat_flat, thr_flat, leaf)

    keys = jax.random.split(key, n_trees)
    preds0 = jnp.full((n,), 1.0, jnp.float32) * base_score
    _, (feats, thrs, leaves) = jax.lax.scan(tree_step, preds0, keys)
    return feats, thrs, leaves


# jit once per (task, n_trees, depth, oblivious, rf, shapes); hyperparameters
# and the PRNG key are traced, so per-fold refits hit the compile cache
_fit_forest_jit = jax.jit(
    _fit_forest_device,
    static_argnames=("task", "n_trees", "depth", "oblivious", "rf"),
)


def dense_to_tree_arrays(ens: DenseTreeEnsemble, background: np.ndarray):
    """Convert the implicit layout to explicit _TreeArrays (for exact
    TreeSHAP). Node cover comes from routing a background sample through each
    tree (interventional-style weighting; the dense layout stores no training
    hessian mass)."""
    from bbbp_tpu.ops.forest import _TreeArrays

    feat = np.asarray(ens.feat)
    thr = np.asarray(ens.thr)
    leaf = np.asarray(ens.leaf)
    T = feat.shape[0]
    D = ens.depth
    bg = np.asarray(background, np.float32)
    trees = []
    n_internal = (1 << D) - 1
    n_total = n_internal + (1 << D)
    for t in range(T):
        feature = np.full(n_total, -1, np.int32)
        threshold = np.zeros(n_total, np.float32)
        left = np.full(n_total, -1, np.int32)
        right = np.full(n_total, -1, np.int32)
        value = np.zeros(n_total, np.float32)
        # implicit flat index: internal node i at level l occupies 2^l-1+pos;
        # leaves come after all internals
        feature[:n_internal] = feat[t]
        threshold[:n_internal] = thr[t]
        for i in range(n_internal):
            l = int(np.floor(np.log2(i + 1)))
            pos = i - ((1 << l) - 1)
            if l + 1 < D:
                child_base = (1 << (l + 1)) - 1
                left[i] = child_base + 2 * pos
                right[i] = child_base + 2 * pos + 1
            else:
                left[i] = n_internal + 2 * pos
                right[i] = n_internal + 2 * pos + 1
        value[n_internal:] = leaf[t]
        # cover by routing the background
        counts = np.zeros(n_total, np.float64)
        node = np.zeros(len(bg), np.int64)
        counts[0] = len(bg)
        for l in range(D):
            f = feature[node]
            go_left = bg[np.arange(len(bg)), np.maximum(f, 0)] <= threshold[node]
            node = np.where(go_left, left[node], right[node])
            np.add.at(counts, node, 1)
        trees.append(_TreeArrays(feature, threshold, left, right, value,
                                 np.maximum(counts, 1e-6).astype(np.float32)))
    return trees


class _TPUBase:
    def __init__(self, n_estimators=300, max_depth=6, learning_rate=0.1,
                 reg_lambda=1.0, min_child_weight=1.0, subsample=1.0,
                 colsample=1.0, oblivious=False, seed=0):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.reg_lambda = reg_lambda
        self.min_child_weight = min_child_weight
        self.subsample = subsample
        self.colsample = colsample
        self.oblivious = oblivious
        self.seed = seed
        self.ensemble_: Optional[DenseTreeEnsemble] = None

    def _prepare(self, x):
        x = np.asarray(x, dtype=np.float32)
        self.mapper_ = BinMapper().fit(x)
        xb = self.mapper_.transform(x)
        F = x.shape[1]
        edge_vals = np.full((F, MAX_BINS), np.inf, dtype=np.float32)
        for f, e in enumerate(self.mapper_.edges_):
            if len(e):
                edge_vals[f, : len(e)] = e
                edge_vals[f, len(e):] = np.inf
        return jnp.asarray(xb), jnp.asarray(edge_vals)

    def _fit(self, x, y, task: str, rf: bool, base_score: float):
        xb, edge_vals = self._prepare(x)
        feats, thrs, leaves = _fit_forest_jit(
            xb, edge_vals, np.asarray(y, np.float32),
            jnp.float32(self.learning_rate), jnp.float32(self.reg_lambda),
            jnp.float32(self.min_child_weight), jnp.float32(self.subsample),
            jnp.float32(self.colsample), jnp.float32(base_score),
            jax.random.PRNGKey(self.seed), task=task,
            n_trees=self.n_estimators, depth=self.max_depth,
            oblivious=self.oblivious, rf=rf)
        scale = (1.0 / self.n_estimators) if rf else self.learning_rate
        self.ensemble_ = DenseTreeEnsemble(feats, thrs, leaves, self.max_depth,
                                           base_score, scale)
        return self

    def get_params(self, deep=True):
        return {k: getattr(self, k) for k in
                ("n_estimators", "max_depth", "learning_rate", "reg_lambda",
                 "min_child_weight", "subsample", "colsample", "oblivious", "seed")}

    def set_params(self, **p):
        for k, v in p.items():
            setattr(self, k, v)
        return self


class TPUGBDTRegressor(_TPUBase):
    def fit(self, x, y):
        return self._fit(x, y, "reg", rf=False,
                         base_score=float(np.mean(y)))

    def predict(self, x) -> np.ndarray:
        return np.asarray(self.ensemble_.raw_predict(jnp.asarray(x, jnp.float32)))


class TPUGBDTClassifier(_TPUBase):
    def fit(self, x, y):
        p0 = float(np.clip(np.mean(y), 1e-6, 1 - 1e-6))
        return self._fit(x, y, "cls", rf=False,
                         base_score=float(np.log(p0 / (1 - p0))))

    def decision_function(self, x) -> np.ndarray:
        return np.asarray(self.ensemble_.raw_predict(jnp.asarray(x, jnp.float32)))

    def predict_proba(self, x) -> np.ndarray:
        p = 1.0 / (1.0 + np.exp(-self.decision_function(x)))
        return np.stack([1 - p, p], axis=1)

    def predict(self, x) -> np.ndarray:
        return (self.decision_function(x) > 0).astype(np.int32)


class TPURandomForestRegressor(_TPUBase):
    def __init__(self, n_estimators=300, max_depth=10, colsample=1.0,
                 min_child_weight=1.0, **kw):
        kw.setdefault("reg_lambda", 1e-6)
        super().__init__(n_estimators=n_estimators, max_depth=max_depth,
                         colsample=colsample,
                         min_child_weight=min_child_weight, **kw)

    def fit(self, x, y):
        return self._fit(x, y, "reg", rf=True, base_score=0.0)

    def predict(self, x) -> np.ndarray:
        return np.asarray(self.ensemble_.raw_predict(jnp.asarray(x, jnp.float32)))


class TPURandomForestClassifier(TPURandomForestRegressor):
    def __init__(self, n_estimators=300, max_depth=10, colsample=0.5, **kw):
        super().__init__(n_estimators=n_estimators, max_depth=max_depth,
                         colsample=colsample, **kw)

    def predict_proba(self, x) -> np.ndarray:
        p = np.clip(super().predict(x), 0.0, 1.0)
        return np.stack([1 - p, p], axis=1)

    def predict(self, x) -> np.ndarray:
        return (np.clip(super(TPURandomForestClassifier, self).predict(x), 0, 1)
                > 0.5).astype(np.int32)

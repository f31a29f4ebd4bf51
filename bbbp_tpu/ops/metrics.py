"""Evaluation metrics as pure JAX — the reference's full metric set.

Classification: the 8 metrics computed by ``evaluate_model``
(reference: Models/model_opt_20250130.py:47-97 — accuracy, precision, recall,
F1, balanced accuracy, MCC, Cohen's kappa, ROC AUC). Regression: MSE and R²
(reference: Models/multi_input_data_regression_opt_transformer_cnn_20250113.py:411-415).
All differentiably-safe and jit-compatible (ROC AUC via rank statistic).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _confusion(y_true, y_pred):
    y_true = jnp.asarray(y_true).astype(jnp.float32)
    y_pred = jnp.asarray(y_pred).astype(jnp.float32)
    tp = jnp.sum(y_true * y_pred)
    tn = jnp.sum((1 - y_true) * (1 - y_pred))
    fp = jnp.sum((1 - y_true) * y_pred)
    fn = jnp.sum(y_true * (1 - y_pred))
    return tp, tn, fp, fn


def accuracy(y_true, y_pred):
    return jnp.mean(jnp.asarray(y_true) == jnp.asarray(y_pred))


def precision(y_true, y_pred):
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    return tp / jnp.maximum(tp + fp, 1e-12)


def recall(y_true, y_pred):
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    return tp / jnp.maximum(tp + fn, 1e-12)


def f1_score(y_true, y_pred):
    p = precision(y_true, y_pred)
    r = recall(y_true, y_pred)
    return 2 * p * r / jnp.maximum(p + r, 1e-12)


def balanced_accuracy(y_true, y_pred):
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    tpr = tp / jnp.maximum(tp + fn, 1e-12)
    tnr = tn / jnp.maximum(tn + fp, 1e-12)
    return 0.5 * (tpr + tnr)


def mcc(y_true, y_pred):
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    num = tp * tn - fp * fn
    den = jnp.sqrt(
        jnp.maximum((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn), 1e-12)
    )
    return num / den


def cohen_kappa(y_true, y_pred):
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    n = tp + tn + fp + fn
    po = (tp + tn) / jnp.maximum(n, 1e-12)
    pe = ((tp + fp) * (tp + fn) + (tn + fn) * (tn + fp)) / jnp.maximum(n * n, 1e-12)
    return (po - pe) / jnp.maximum(1 - pe, 1e-12)


def roc_auc(y_true, y_score):
    """Mann-Whitney U / rank statistic, tie-aware (average ranks)."""
    y_true = jnp.asarray(y_true).astype(jnp.float32)
    y_score = jnp.asarray(y_score).astype(jnp.float32)
    n = y_score.shape[0]
    order = jnp.argsort(y_score)
    sorted_scores = y_score[order]
    ranks_ord = jnp.arange(1, n + 1, dtype=jnp.float32)
    # average ranks over ties: group by equal score
    is_new = jnp.concatenate([jnp.ones(1), (sorted_scores[1:] != sorted_scores[:-1]).astype(jnp.float32)])
    group_id = jnp.cumsum(is_new) - 1
    group_sum = jax.ops.segment_sum(ranks_ord, group_id.astype(jnp.int32), num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones(n), group_id.astype(jnp.int32), num_segments=n)
    avg_rank_per_group = group_sum / jnp.maximum(group_cnt, 1.0)
    avg_ranks = avg_rank_per_group[group_id.astype(jnp.int32)]
    ranks = jnp.zeros(n).at[order].set(avg_ranks)
    n_pos = jnp.sum(y_true)
    n_neg = n - n_pos
    sum_pos = jnp.sum(ranks * y_true)
    u = sum_pos - n_pos * (n_pos + 1) / 2
    return u / jnp.maximum(n_pos * n_neg, 1e-12)


def mse(y_true, y_pred):
    y_true = jnp.asarray(y_true, dtype=jnp.float32)
    y_pred = jnp.asarray(y_pred, dtype=jnp.float32)
    return jnp.mean((y_true - y_pred) ** 2)


def r2_score(y_true, y_pred):
    y_true = jnp.asarray(y_true, dtype=jnp.float32)
    y_pred = jnp.asarray(y_pred, dtype=jnp.float32)
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true)) ** 2)
    return 1.0 - ss_res / jnp.maximum(ss_tot, 1e-12)


def classification_report(y_true, y_pred, y_score=None) -> Dict[str, float]:
    """The reference's 8-metric set (Models/model_opt_20250130.py:66-97)."""
    out = {
        "accuracy": float(accuracy(y_true, y_pred)),
        "precision": float(precision(y_true, y_pred)),
        "recall": float(recall(y_true, y_pred)),
        "f1": float(f1_score(y_true, y_pred)),
        "balanced_accuracy": float(balanced_accuracy(y_true, y_pred)),
        "mcc": float(mcc(y_true, y_pred)),
        "cohen_kappa": float(cohen_kappa(y_true, y_pred)),
    }
    if y_score is not None:
        out["roc_auc"] = float(roc_auc(y_true, y_score))
    return out


def regression_report(y_true, y_pred) -> Dict[str, float]:
    return {"mse": float(mse(y_true, y_pred)), "r2": float(r2_score(y_true, y_pred))}

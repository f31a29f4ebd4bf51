"""Checkpoint / resume via Orbax.

The reference persists only final artifacts (joblib/pickle/torch.save/HF
save_pretrained — SURVEY.md §5 checkpoint/resume: 'no mid-training checkpoints
and no resume logic'). Here any pytree (params, batch_stats, optimizer state,
step counters) checkpoints mid-training and restores for resume; per-fold
stacked states checkpoint as one tree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state: Any, step: Optional[int] = None,
                    overwrite: bool = True) -> str:
    """Save a pytree checkpoint; returns the checkpoint path."""
    ocp = _ocp()
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    state = jax.tree.map(np.asarray, state)
    ckptr = ocp.StandardCheckpointer()
    if overwrite and os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (matching structure) guides dtypes/shapes."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        target = jax.tree.map(np.asarray, target)
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def latest_step(root: str) -> Optional[int]:
    """Largest step_N subdirectory under root, or None."""
    if not os.path.isdir(root):
        return None
    steps = []
    for d in os.listdir(root):
        if d.startswith("step_"):
            try:
                steps.append(int(d[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None

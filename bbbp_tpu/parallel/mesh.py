"""Device-mesh construction and sharding rules.

The reference has no distributed execution at all (SURVEY.md §2.9: single
process, sklearn n_jobs process pools). Here parallelism is a first-class mesh
design: a 2-D ``(data, model)`` mesh; batch axes shard over ``data``, the
ensemble/fold/trial axes also map onto ``data`` (they are embarrassingly
parallel), and wide layers may shard over ``model``. Collectives (psum for
loss/metric reductions, all_gather for OOF assembly) are inserted by XLA from
sharding annotations — riding ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """(data, model) mesh over available devices (data-major)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    n = min(n, len(devices))
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with batch sharding (pads nothing: callers pass
    batch sizes divisible by the data axis)."""
    out = []
    for a in arrays:
        out.append(jax.device_put(a, batch_sharding(mesh, a.ndim)))
    return tuple(out) if len(out) > 1 else out[0]

"""Device mesh + sharding rules.

The reference's parallelism surface is data-parallel only (Lightning DDP over
NCCL; SURVEY §2.4). The TPU-native equivalent: a ``jax.sharding.Mesh`` with a
``data`` axis over ICI, batch arrays sharded on it, parameters replicated, and
XLA inserting the gradient all-reduces (the `reduce_mean`/`sync_dist` plumbing
of the reference becomes implicit in the global-view jit). A ``model`` axis is
reserved for spatial/tensor sharding of the large BEV grids (2048x256 cells) —
mesh plumbing is in place even though parity needs only ``data``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'batch_sharding', 'replicated', 'shard_batch',
           'DATA_AXIS', 'MODEL_AXIS']

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over all (or given) devices.

    Data parallelism rides the fastest-varying axis so gradient all-reduces
    stay on ICI neighbors; the model axis is outermost (DCN-friendly for
    multi-slice later).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(model_parallel, n // model_parallel)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, stacked: bool = False):
    """Device-put a host batch dict with batch-dim sharding (non-arrays pass
    through untouched). With ``stacked`` the arrays carry a leading K
    (steps-per-dispatch) axis and the batch dim is axis 1."""
    sh = (NamedSharding(mesh, P(None, DATA_AXIS)) if stacked
          else batch_sharding(mesh))

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(put, batch)

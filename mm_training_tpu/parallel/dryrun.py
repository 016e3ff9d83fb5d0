"""Shared one-train-step harness for multi-device equality checks.

Used by the driver contract (__graft_entry__.dryrun_multichip) and
tests/test_parallel/test_dp_equivalence.py — one implementation so a fix to
the mesh/optimizer plumbing cannot silently apply to only one of them.

The equality contract (the reference's DDP contract, bev_depth_head.py:274,
300): training over an n-device mesh on a global batch must equal 1-device
training on the SAME global batch up to float reassociation. For that to
hold the effective learning rate must also match: cfg.learning_rate scales
with the per-device batch (base/64 * batch_size), so the optimizer is built
with ``global_batch_scale=dp`` — without it the compared runs train with
learning rates differing by a factor of dp and Adam's first step alone
differs by (dp-1)*lr per parameter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['run_one_train_step', 'max_param_diff']


def run_one_train_step(devices, model_parallel: int, global_batch: int,
                       modalities=None, batch_np=None, num_slices: int = 1):
    """One full jitted train step (preprocess + forward + loss + grads +
    optimizer update) over a mesh of ``devices``.

    Returns (params_numpy, metrics_float_dict). Deterministic in
    (global_batch, modalities, seed): two calls with different meshes see
    the same global batch, init, and effective learning rate.
    """
    from ..configs import tiny_test_config
    from ..data.fake_batch import make_fake_batch
    from ..models import BEVDepthLiDAR
    from ..training.optim import make_optimizer
    from ..training.train_step import create_train_state, make_train_step
    from .mesh import MODEL_AXIS, make_mesh, replicated, shard_batch

    modalities = modalities or dict(use_cam=True, use_lidar=True,
                                    use_radar=True)
    mesh = make_mesh(devices, model_parallel=model_parallel,
                     num_slices=num_slices)
    dp = len(devices) // model_parallel
    cfg = tiny_test_config(batch_size=global_batch // dp,
                           model_parallel=model_parallel, **modalities)
    model = BEVDepthLiDAR(
        cfg, spatial_axis=MODEL_AXIS if model_parallel > 1 else None)
    tx = make_optimizer(cfg, steps_per_epoch=10, global_batch_scale=dp)

    if batch_np is None:
        batch_np = make_fake_batch(cfg, batch_size=global_batch, seed=0)
    batch = shard_batch(mesh, batch_np)
    model_batch = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    model_batch['flipped'] = jnp.zeros((b * s * n,), bool)

    with mesh:
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   model_batch)
        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(cfg, model, tx)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics)
    return (jax.tree_util.tree_map(np.asarray, new_state.params),
            {k: float(v) for k, v in metrics.items()})


def max_param_diff(a, b) -> float:
    return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(x - y))), a, b)))

"""Multi-device numerics: sharded training must EQUAL single-device training.

The reference's DDP contract is that gradient all-reduce + reduce_mean
normalizers make N-GPU training equivalent to large-batch 1-GPU training
(bev_depth_head.py:274,300). Here the same contract holds by construction —
global-view jit over the mesh — and these tests pin it numerically on the
8-device CPU mesh: same global batch, same rng, identical losses/params up to
float reassociation (XLA inserts different reduction trees per sharding).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR
from mm_training_tpu.parallel import MODEL_AXIS, make_mesh, replicated, shard_batch
from mm_training_tpu.training.optim import make_optimizer
from mm_training_tpu.training.train_step import (create_train_state,
                                                 make_train_step)

GLOBAL_BATCH = 8


def _run_one_step(devices, model_parallel, batch_np, modalities):
    mesh = make_mesh(devices, model_parallel=model_parallel)
    dp = len(devices) // model_parallel
    cfg = tiny_test_config(batch_size=GLOBAL_BATCH // dp,
                           model_parallel=model_parallel, **modalities)
    model = BEVDepthLiDAR(
        cfg, spatial_axis=MODEL_AXIS if model_parallel > 1 else None)
    tx = make_optimizer(cfg, steps_per_epoch=10)
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


@pytest.mark.parametrize('modalities', [
    dict(use_cam=False, use_lidar=True, use_radar=True),
    dict(use_cam=True, use_lidar=True, use_radar=True),
])
def test_dp8_matches_dp1(modalities):
    cfg = tiny_test_config(batch_size=GLOBAL_BATCH, **modalities)
    batch_np = make_fake_batch(cfg, batch_size=GLOBAL_BATCH, seed=0)

    devices = jax.devices()
    assert len(devices) >= 8, 'conftest must provide the 8-device CPU mesh'
    p1, m1 = _run_one_step(devices[:1], 1, batch_np, modalities)
    p8, m8 = _run_one_step(devices[:8], 1, batch_np, modalities)

    # losses: global-batch means, identical up to reduction-tree rounding
    assert abs(m1['train_loss'] - m8['train_loss']) < 1e-4 * max(
        1.0, abs(m1['train_loss'])), (m1, m8)
    # updated params: Adam normalizes grads to O(lr); atol dominates
    max_diff = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), p1, p8)))
    assert max_diff < 5e-4, f'dp=8 vs dp=1 param max-diff {max_diff}'


def test_model_parallel2_matches_dp1():
    modalities = dict(use_cam=True, use_lidar=True, use_radar=True)
    cfg = tiny_test_config(batch_size=GLOBAL_BATCH, **modalities)
    batch_np = make_fake_batch(cfg, batch_size=GLOBAL_BATCH, seed=0)

    devices = jax.devices()
    p1, m1 = _run_one_step(devices[:1], 1, batch_np, modalities)
    pmp, mmp = _run_one_step(devices[:8], 2, batch_np, modalities)

    assert abs(m1['train_loss'] - mmp['train_loss']) < 1e-4 * max(
        1.0, abs(m1['train_loss'])), (m1, mmp)
    max_diff = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), p1, pmp)))
    assert max_diff < 5e-4, f'model=2 vs dp=1 param max-diff {max_diff}'

"""Multi-device numerics: sharded training must EQUAL single-device training.

The reference's DDP contract is that gradient all-reduce + reduce_mean
normalizers make N-GPU training equivalent to large-batch 1-GPU training
(bev_depth_head.py:274,300). Here the same contract holds by construction —
global-view jit over the mesh — and these tests pin it numerically on the
8-device CPU mesh: same global batch, same rng, identical losses/params up to
float reassociation (XLA inserts different reduction trees per sharding).
"""
import jax
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.parallel.dryrun import run_one_train_step

GLOBAL_BATCH = 8


def _run_one_step(devices, model_parallel, batch_np, modalities):
    # shared harness (also the driver's dryrun_multichip): includes the
    # global_batch_scale=dp learning-rate equalization without which the
    # compared runs would train at lrs differing by a factor of dp
    return run_one_train_step(devices, model_parallel, GLOBAL_BATCH,
                              modalities=modalities, batch_np=batch_np)


@pytest.mark.parametrize('modalities', [
    dict(use_cam=False, use_lidar=True, use_radar=True),
    dict(use_cam=True, use_lidar=True, use_radar=True),
])
@pytest.mark.slow
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


@pytest.mark.slow
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

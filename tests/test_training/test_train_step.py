"""End-to-end jitted train/eval step tests on the tiny config (CPU mesh).

Covers the reference's training_step/eval_step hot path
(exps/mm_training_aim.py:252-342) for the lidar+radar and full-fusion
modality combos.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR
from mm_training_tpu.training.optim import make_optimizer
from mm_training_tpu.training.train_step import (create_train_state,
                                                 make_eval_step,
                                                 make_train_step)


def _setup(cfg):
    model = BEVDepthLiDAR(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_fake_batch(cfg, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model_batch = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    model_batch['flipped'] = jnp.zeros((b * s * n,), bool)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               model_batch)
    return model, tx, state, batch


@pytest.mark.parametrize('modalities', [
    dict(use_cam=False, use_lidar=True, use_radar=False),  # lidar_only
    dict(use_cam=False, use_lidar=True, use_radar=True),   # lidar_radar
    dict(use_cam=True, use_lidar=True, use_radar=True),    # full fusion
])
def test_train_step_runs_and_learns(modalities):
    cfg = tiny_test_config(**modalities)
    model, tx, state, batch = _setup(cfg)
    train_step = make_train_step(cfg, model, tx)

    # the train step donates its input state — snapshot params first
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    rng = jax.random.PRNGKey(1)
    state1, metrics = train_step(state, batch, rng)
    assert np.isfinite(float(metrics['train_loss']))
    assert float(metrics['train_detection_loss']) > 0
    assert np.isfinite(float(metrics['grad_norm']))
    if cfg.use_cam:
        assert float(metrics['train_depth_loss']) > 0
    assert int(state1.step) == 1

    # params actually moved
    moved = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + float(jnp.abs(leaf).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state1.params, params0),
        0.0)
    assert moved > 0

    state2, metrics2 = train_step(state1, batch, rng)
    assert np.isfinite(float(metrics2['train_loss']))
    assert int(state2.step) == 2


def test_eval_step_decodes_fixed_shapes():
    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True)
    model, tx, state, batch = _setup(cfg)
    eval_step = make_eval_step(cfg, model)
    metrics, (boxes, scores, labels, valid) = eval_step(state, batch)
    assert np.isfinite(float(metrics['detection_loss']))
    n_tasks = len(cfg.get_head_conf().tasks)
    cap = cfg.get_head_conf().test_cfg.post_max_size * n_tasks
    assert boxes.shape == (cfg.batch_size, cap, 9)
    assert scores.shape == labels.shape == valid.shape == (cfg.batch_size, cap)

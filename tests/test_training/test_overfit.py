"""End-to-end learning test: overfitting one batch must reach mAP 1.0.

The strongest coherence check of targets -> losses -> optimizer -> decode ->
NMS -> evaluator: if any link disagrees about geometry or parameterization,
the model cannot reproduce its own training boxes. ~300 steps; marked slow
(runs in ~80 s on a TPU chip, minutes on CPU — kept small here).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.evaluation import MAPCalculator
from mm_training_tpu.models import BEVDepthLiDAR
from mm_training_tpu.training.train_step import (create_train_state,
                                                 make_eval_step,
                                                 make_train_step)


def _overfit_and_score(cfg, n_steps, lr=2e-3, score_thr=0.1, batch=None):
    model = BEVDepthLiDAR(cfg)
    tx = optax.chain(optax.clip_by_global_norm(2.0),
                     optax.adamw(lr, weight_decay=1e-7))
    if batch is None:
        batch = make_fake_batch(cfg, seed=0, n_objects=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mb = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    mb['flipped'] = jnp.zeros((b * s * n,), bool)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), mb)
    step = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(1)
    for _ in range(n_steps):
        state, m = step(state, batch, rng)

    _, (boxes, scores, labels, valid), _ = make_eval_step(cfg, model)(
        state, batch)
    calc = MAPCalculator()
    gts, preds = [], []
    for i in range(cfg.batch_size):
        v = np.asarray(valid[i]) & (np.asarray(scores[i]) > score_thr)
        preds.append([np.asarray(boxes[i])[v], np.asarray(scores[i])[v],
                      np.asarray(labels[i])[v]])
        gm = np.asarray(batch['gt_mask'][i])
        gts.append([np.asarray(batch['gt_boxes'][i])[gm],
                    np.asarray(batch['gt_labels'][i])[gm]])
    calc.update(gts, preds)
    return float(m['train_loss']), calc.compute_bev(iou_thr=0.3, x_range=25.6)


@pytest.mark.slow
def test_camera_branch_overfits_one_batch():
    """Camera-only branch (LSSFPN -> lift-splat -> head) must reproduce its
    own training boxes — the claim BASELINE.md makes, now reproducible.
    Objects are placed inside the two camera frustums (outside them the cam
    BEV is empty and nothing can localize, exactly like the reference)."""
    cfg = tiny_test_config(use_cam=True, use_lidar=False, use_radar=False,
                           batch_size=1)
    batch = make_fake_batch(cfg, seed=0, n_objects=8)
    rng = np.random.default_rng(3)
    k = 8
    xs = np.linspace(8, 22, k) * np.where(np.arange(k) % 2, 1.0, -1.0)
    batch['gt_boxes'][0, :k, 0] = xs
    batch['gt_boxes'][0, :k, 1] = 0.2 * np.abs(xs) * rng.uniform(-1, 1, k)
    batch['gt_boxes'][0, :k, 2] = 0.0
    loss, res = _overfit_and_score(cfg, n_steps=400, lr=1e-3, batch=batch)
    assert res['ap_auc'] > 0.9, (loss, res)
    assert res['recall_2d'] > 0.9


@pytest.mark.slow
def test_overfit_one_batch_reaches_full_map():
    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           batch_size=2)
    model = BEVDepthLiDAR(cfg)
    tx = optax.chain(optax.clip_by_global_norm(2.0),
                     optax.adamw(2e-3, weight_decay=1e-7))
    batch = {k: jnp.asarray(v)
             for k, v in make_fake_batch(cfg, seed=0, n_objects=8).items()}
    mb = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    mb['flipped'] = jnp.zeros((b * s * n,), bool)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), mb)
    step = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(1)
    for _ in range(300):
        state, m = step(state, batch, rng)
    assert float(m['train_loss']) < 1.0

    _, (boxes, scores, labels, valid), _ = make_eval_step(cfg, model)(state, batch)
    calc = MAPCalculator()
    gts, preds = [], []
    for i in range(2):
        v = np.asarray(valid[i]) & (np.asarray(scores[i]) > 0.1)
        preds.append([np.asarray(boxes[i])[v], np.asarray(scores[i])[v],
                      np.asarray(labels[i])[v]])
        gm = np.asarray(batch['gt_mask'][i])
        gts.append([np.asarray(batch['gt_boxes'][i])[gm],
                    np.asarray(batch['gt_labels'][i])[gm]])
    calc.update(gts, preds)
    res = calc.compute_bev(iou_thr=0.3, x_range=25.6)
    assert res['ap_auc'] > 0.95
    assert res['recall_2d'] > 0.95
    assert res['cls_accuracy_bev'] > 0.95


@pytest.mark.slow
def test_trained_model_survives_reference_checkpoint_roundtrip():
    """Train -> export to a reference-format torch state_dict -> re-import
    as if it were a released checkpoint -> evaluate: mAP must survive.

    The task-level complement to the per-leaf bitexact and forward-identity
    roundtrip tests (test_torch_export.py): proves the import path preserves
    detection quality end-to-end through decode + NMS + the evaluator, on
    REAL trained weights rather than randomized trees. Uses the
    import-compatible sparse lidar encoder — the only variant with a
    reference-format serialization (torch_export.py:277-282)."""
    from mm_training_tpu.configs import LidarEncoderConf, VoxelizationConf
    from mm_training_tpu.models import torch_export as te
    from mm_training_tpu.models import torch_import as ti

    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           batch_size=1)
    cfg = cfg.replace(lidar_conf=LidarEncoderConf(
        variant='sparse_import',
        voxelization=VoxelizationConf(max_num_points=8, max_voxels=1024)))
    model = BEVDepthLiDAR(cfg)
    tx = optax.chain(optax.clip_by_global_norm(2.0),
                     optax.adamw(2e-3, weight_decay=1e-7))
    batch = {k: jnp.asarray(v)
             for k, v in make_fake_batch(cfg, seed=0, n_objects=8).items()}
    mb = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    mb['flipped'] = jnp.zeros((b * s * n,), bool)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), mb)
    step = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(1)
    for _ in range(250):
        state, m = step(state, batch, rng)

    def score(params, stats):
        s2 = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params),
                           batch_stats=jax.tree_util.tree_map(
                               jnp.asarray, stats))
        _, (boxes, scores, labels, valid), _ = make_eval_step(cfg, model)(
            s2, batch)
        calc = MAPCalculator()
        v = np.asarray(valid[0]) & (np.asarray(scores[0]) > 0.1)
        gm = np.asarray(batch['gt_mask'][0])
        calc.update([[np.asarray(batch['gt_boxes'][0])[gm],
                      np.asarray(batch['gt_labels'][0])[gm]]],
                    [[np.asarray(boxes[0])[v], np.asarray(scores[0])[v],
                      np.asarray(labels[0])[v]]])
        return calc.compute_bev(iou_thr=0.3, x_range=25.6)

    before = score(state.params, state.batch_stats)
    assert before['ap_auc'] > 0.9, before  # trained to quality first

    sd = te.export_reference_checkpoint(state.params, state.batch_stats, cfg)
    sd = {k[len('model.'):]: v for k, v in sd.items()}
    p2, s2 = ti.convert_reference_checkpoint(sd, cfg)
    after = score(p2, s2)
    assert after['ap_auc'] > 0.9, (before, after)
    assert abs(after['ap_auc'] - before['ap_auc']) < 1e-3, (before, after)
    assert abs(after['recall_2d'] - before['recall_2d']) < 1e-3

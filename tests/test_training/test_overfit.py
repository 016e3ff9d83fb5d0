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

    _, (boxes, scores, labels, valid) = make_eval_step(cfg, model)(state, batch)
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

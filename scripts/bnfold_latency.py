"""Measure the serving-latency effect of deploy-time conv-BN folding
(models/bn_fold.py) at production shapes on the attached TPU chip.

Prints two JSON lines: predict p50 with plain eval BN and with folded BN
(same random weights; the folded forward is numerically equivalent, see
tests/test_models/test_bn_fold.py). Run: python scripts/bnfold_latency.py

This is a controlled A/B micro-probe on a bare forward+decode program —
it skips the production predict step's camera-input prep, so its absolute
numbers differ slightly from the served latency. For the real serving
measurement use ``exps.inference --latency [--fold-bn]``, which drives
Trainer._predict_step.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mm_training_tpu.configs import variants
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR, decode_boxes
from mm_training_tpu.models.bn_fold import fold_conv_bn
from mm_training_tpu.training.train_step import (cast_floating,
                                                 normalize_images)


def measure(cfg, variables, iters=30):
    model = BEVDepthLiDAR(cfg)
    head_conf = cfg.get_head_conf()
    bf16 = cfg.precision == 'bf16'
    batch = {kk: jnp.asarray(v) for kk, v in make_fake_batch(
        cfg, batch_size=1, seed=0).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)
    for kk in ('gt_boxes', 'gt_labels', 'gt_mask'):
        batch.pop(kk, None)

    @jax.jit
    def fn(variables, batch):
        model_batch = dict(batch)
        model_batch['imgs'] = normalize_images(batch['imgs'])
        v = cast_floating(variables, jnp.bfloat16) if bf16 else variables
        preds, _, _, _ = model.apply(v, model_batch, None, False)
        return decode_boxes(head_conf, cast_floating(preds, jnp.float32))

    jax.device_get(fn(variables, batch))  # compile + first fetch
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(fn(variables, batch))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    return {'p50_ms': round(float(np.percentile(lat, 50)), 2),
            'p90_ms': round(float(np.percentile(lat, 90)), 2)}


def main():
    cfg = variants.lidar_cam_radar(batch_size=1,
                                   max_points_per_frame=100_000)
    model = BEVDepthLiDAR(cfg)
    batch = {kk: jnp.asarray(v) for kk, v in make_fake_batch(
        cfg, batch_size=1, seed=0).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)
    init_batch = dict(batch)
    init_batch['imgs'] = normalize_images(batch['imgs'])
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), init_batch, None, False)

    res = measure(cfg, variables)
    print(json.dumps({'case': 'eval_bn', **res}))

    p2, s2, nf = fold_conv_bn(variables['params'], variables['batch_stats'])
    # folded-ness travels with the params: measure() retraces automatically
    res = measure(cfg, {'params': p2, 'batch_stats': s2})
    print(json.dumps({'case': 'folded_bn', 'n_folded': nf, **res}))


if __name__ == '__main__':
    main()

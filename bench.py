"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: training throughput (samples/sec/chip) of the flagship
LiDAR+radar+camera fusion model at production shapes (704x1280 x4 cameras,
100k points, 2048x256 BEV grid) on the attached TPU chip, using the
production K-step dispatch (Config.steps_per_dispatch: lax.scan over stacked
micro-batches amortizes the fixed per-dispatch host cost of the
remote-attached backend).

The same line carries an ``extra`` dict with the other modality configs and
the serving latency, so a regression in any of them shows up in the driver's
BENCH artifact (VERDICT r3 #6), not just in BASELINE.md archaeology:
  - train_sps_lidar_only      (L,   batch 2, K=8)
  - train_sps_lidar_radar     (L+R, batch 2, K=8)
  - train_sps_lidar_cam       (L+C, batch 2, K=8 — the 4th released combo)
  - predict_p50_ms            (B=1 L+R+C forward + decode + circle NMS +
                               bundled host fetch — the serving path)
  - predict_p50_folded_ms     (same, with deploy-time conv-BN folding —
                               the `inference --fold-bn` program)
  - loader_sps                (host data pipeline: decode + virtualize +
                               pack + collate samples/s at production
                               shapes — must be >= the train rate)
  - loader_sps_laz            (same, with real LASzip lidar decode in the
                               hot loop via the native codec — the
                               on-disk format of the real dataset)

Baseline: the reference repo publishes no numbers (BASELINE.md). The
``vs_baseline`` ratio is computed against the BASELINE.md target proxy of
2.0 samples/sec/A100 for the reference's L+R+C training config (documented
estimate; the north-star target is >= 2x that, i.e. vs_baseline >= 2.0).
"""
from __future__ import annotations

import json
import time
import traceback

A100_BASELINE_SAMPLES_PER_SEC = 2.0
K_STEPS = 16  # steps per dispatch (sweep: 4->8.00, 8->8.28, 16->8.36, 32->8.40 samples/s)


def _train_sps(cfg, k: int, dispatches: int) -> float:
    """Measured training samples/s for one config: K-step scan dispatches
    with a per-dispatch metric fetch (matches how the trainer consumes
    metrics; queueing a second large program behind an uncompleted one
    stalls the remote-attached backend indefinitely — measured)."""
    import jax
    import jax.numpy as jnp

    from mm_training_tpu.data.fake_batch import make_fake_batch
    from mm_training_tpu.models import BEVDepthLiDAR
    from mm_training_tpu.training.optim import make_optimizer
    from mm_training_tpu.training.train_step import (create_train_state,
                                                     make_train_step_multi)

    model = BEVDepthLiDAR(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    batch = {kk: jnp.asarray(v) for kk, v in make_fake_batch(
        cfg, batch_size=cfg.batch_size, seed=0).items()}
    model_batch = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    model_batch['flipped'] = jnp.zeros((b * s * n,), bool)

    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               model_batch)
    stacked = {kk: jnp.broadcast_to(v[None], (k,) + v.shape)
               for kk, v in batch.items()}
    train_step = make_train_step_multi(cfg, model, tx, k)
    rng = jax.random.PRNGKey(1)

    # warmup: compile + 2 dispatches
    for _ in range(2):
        state, metrics = train_step(state, stacked, rng)
        _ = float(metrics['train_loss'])

    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, metrics = train_step(state, stacked, rng)
        _ = float(metrics['train_loss'])
    dt = time.perf_counter() - t0
    return cfg.batch_size * k * dispatches / dt


def _predict_p50_ms(cfg, iters: int = 30, fold_bn: bool = False) -> float:
    """B=1 serving latency: forward + decode + circle NMS + ONE bundled
    device->host fetch (serial per-array fetches would each pay the ~30 ms
    tunnel round-trip — BASELINE.md round-3 pitfall). fold_bn=True measures
    the deploy path (`inference --fold-bn`): conv-BN-folded weights, whose
    tree shape makes batch_norm trace bias-only FoldedBN modules."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mm_training_tpu.data.fake_batch import make_fake_batch
    from mm_training_tpu.models import BEVDepthLiDAR, decode_boxes
    from mm_training_tpu.models.bn_fold import fold_conv_bn
    from mm_training_tpu.training.train_step import (cast_floating,
                                                     normalize_images)

    model = BEVDepthLiDAR(cfg)
    head_conf = cfg.get_head_conf()
    bf16 = cfg.precision == 'bf16'
    batch = {kk: jnp.asarray(v) for kk, v in make_fake_batch(
        cfg, batch_size=1, seed=0).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)
    for kk in ('gt_boxes', 'gt_labels', 'gt_mask'):
        batch.pop(kk, None)

    init_batch = dict(batch)
    init_batch['imgs'] = normalize_images(batch['imgs'])
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), init_batch, None, False)
    if fold_bn:
        p2, s2, _ = fold_conv_bn(variables['params'],
                                 variables['batch_stats'])
        variables = {'params': p2, 'batch_stats': s2}

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
    return float(np.percentile(np.asarray(lat), 50))


def main():
    import jax

    from mm_training_tpu.configs import tiny_test_config, variants

    on_tpu = jax.default_backend() in ('tpu', 'axon')
    if on_tpu:
        cfg = variants.lidar_cam_radar(batch_size=2,
                                       max_points_per_frame=100_000,
                                       steps_per_dispatch=K_STEPS)
        sps = _train_sps(cfg, K_STEPS, dispatches=6)
    else:  # CPU smoke fallback so the harness always emits a line
        cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True,
                               batch_size=1, steps_per_dispatch=K_STEPS)
        sps = _train_sps(cfg, K_STEPS, dispatches=2)

    # secondary metrics — never allowed to kill the headline line
    extra = {}
    if on_tpu:
        for name, factory in (('train_sps_lidar_only', variants.lidar_only),
                              ('train_sps_lidar_radar',
                               variants.lidar_radar),
                              ('train_sps_lidar_cam', variants.lidar_cam)):
            try:
                c = factory(batch_size=2, max_points_per_frame=100_000,
                            steps_per_dispatch=8)
                extra[name] = round(_train_sps(c, 8, dispatches=4), 4)
            except Exception as e:
                traceback.print_exc()
                extra[name] = f'error: {type(e).__name__}: {e}'
        # host data pipeline: the device rate is unreachable in real
        # training unless the loader sustains it (VERDICT r4 #1)
        root = None
        try:
            from mm_training_tpu.data.loader_bench import (build_fixture,
                                                           measure_loader_sps)
            root = build_fixture('/tmp/loader_bench_ds')
            extra['loader_sps'] = round(
                measure_loader_sps(root, batches=10), 3)
        except Exception as e:
            traceback.print_exc()
            extra['loader_sps'] = f'error: {type(e).__name__}: {e}'
        try:
            # same pipeline with real LASzip lidar decode in the hot loop
            # (the on-disk format of the real dataset; native codec)
            from mm_training_tpu.data.loader_bench import mirror_fixture_as_laz
            laz_root = mirror_fixture_as_laz(root, '/tmp/loader_bench_ds_laz')
            extra['loader_sps_laz'] = round(
                measure_loader_sps(laz_root, batches=10), 3)
        except Exception as e:
            traceback.print_exc()
            extra['loader_sps_laz'] = f'error: {type(e).__name__}: {e}'
        for name, fold in (('predict_p50_ms', False),
                           ('predict_p50_folded_ms', True)):
            try:
                c = variants.lidar_cam_radar(batch_size=1,
                                             max_points_per_frame=100_000)
                extra[name] = round(_predict_p50_ms(c, fold_bn=fold), 2)
            except Exception as e:
                traceback.print_exc()
                extra[name] = f'error: {type(e).__name__}: {e}'

    # the CPU smoke fallback must be distinguishable from the real chip
    # benchmark: tiny-geometry CPU throughput vs the A100 baseline is
    # meaningless, and a silent TPU-attach failure must not be recorded as
    # a perf regression under the TPU metric name
    metric = 'train_samples_per_sec_lidar_cam_radar'
    if not on_tpu:
        metric += '_cpu_smoke'
    print(json.dumps({
        'metric': metric,
        'value': round(sps, 4),
        'unit': 'samples/s/chip',
        'vs_baseline': round(sps / A100_BASELINE_SAMPLES_PER_SEC, 4),
        'backend': jax.default_backend(),
        'extra': extra,
    }))


if __name__ == '__main__':
    main()

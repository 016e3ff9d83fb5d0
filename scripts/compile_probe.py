"""Compile-time probe for the production train-step program (VERDICT r3 #2).

Round-3 BASELINE.md records that the full-fusion train step at batch 4
combined with K=8 steps/dispatch never finished compiling within 25 min,
while B=2 K=16 compiles in ~2-5 min. This probe times `.lower().compile()`
for one (B, K, ablation) point per invocation so the explosion can be
bisected without a 25-minute all-in run:

    python scripts/compile_probe.py --batch 4 --k 8 [--no-dcn] [--no-cam]
        [--remat] [--points 100000] [--timeout 900]

Prints one JSON line: {"B":..., "K":..., "ablation":..., "lower_s":...,
"compile_s":..., "ok":...}. A SIGALRM bounds the compile so a pathological
point reports "timeout" instead of hanging the session.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import signal
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--k', type=int, default=8)
    p.add_argument('--no-dcn', action='store_true')
    p.add_argument('--no-cam', action='store_true')
    p.add_argument('--no-lidar', action='store_true')
    p.add_argument('--remat', action='store_true',
                   help='jax.checkpoint the model apply (tests the '
                        'memory-pressure hypothesis: if B=4 K=8 only '
                        'compiles with remat, the explosion is the '
                        'rematerialization pass searching for a fit)')
    p.add_argument('--points', type=int, default=100_000)
    p.add_argument('--timeout', type=int, default=900)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mm_training_tpu.configs import variants
    from mm_training_tpu.data.fake_batch import make_fake_batch
    from mm_training_tpu.models import BEVDepthLiDAR
    from mm_training_tpu.training.optim import make_optimizer
    from mm_training_tpu.training.train_step import (create_train_state,
                                                     make_train_step_multi)

    cfg = variants.lidar_cam_radar(batch_size=args.batch,
                                   max_points_per_frame=args.points,
                                   steps_per_dispatch=args.k)
    if args.no_cam:
        cfg = dataclasses.replace(cfg, use_cam=False, use_depth_loss=False)
    if args.no_lidar:
        cfg = dataclasses.replace(cfg, use_lidar=False)
    if args.no_dcn:
        bb = cfg.get_backbone_conf()
        cfg = dataclasses.replace(cfg, backbone_conf=dataclasses.replace(
            bb, depth_net_conf=dataclasses.replace(
                bb.depth_net_conf, use_dcn=False)))
    if args.remat:
        import os
        os.environ['MMT_REMAT'] = '1'  # consumed by BEVDepthLiDAR if wired

    ablation = {k: getattr(args, k.replace('-', '_'))
                for k in ('no_dcn', 'no_cam', 'no_lidar', 'remat')}
    rec = {'B': args.batch, 'K': args.k, 'points': args.points,
           'ablation': {k: v for k, v in ablation.items() if v}}

    model = BEVDepthLiDAR(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    batch = {kk: jnp.asarray(v) for kk, v in make_fake_batch(
        cfg, batch_size=cfg.batch_size, seed=0).items()}
    model_batch = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    model_batch['flipped'] = jnp.zeros((b * s * n,), bool)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               model_batch)
    stacked = {kk: jnp.broadcast_to(v[None], (args.k,) + v.shape)
               for kk, v in batch.items()}
    step = make_train_step_multi(cfg, model, tx, args.k)

    t0 = time.perf_counter()
    lowered = step.lower(state, stacked, jax.random.PRNGKey(1))
    rec['lower_s'] = round(time.perf_counter() - t0, 1)

    def on_alarm(signum, frame):
        rec.update(compile_s=f'>{args.timeout}', ok=False, error='timeout')
        print(json.dumps(rec), flush=True)
        raise SystemExit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(args.timeout)
    t0 = time.perf_counter()
    try:
        compiled = lowered.compile()
        signal.alarm(0)
        rec['compile_s'] = round(time.perf_counter() - t0, 1)
        mem = compiled.memory_analysis()
        if mem is not None:
            for field in ('temp_size_in_bytes', 'argument_size_in_bytes',
                          'output_size_in_bytes', 'generated_code_size_in_bytes'):
                v = getattr(mem, field, None)
                if v is not None:
                    rec[field.replace('_in_bytes', '_mb')] = round(v / 2**20)
        rec['ok'] = True
    except SystemExit:
        raise
    except Exception as e:  # OOM during compile, backend errors, ...
        signal.alarm(0)
        rec.update(compile_s=round(time.perf_counter() - t0, 1), ok=False,
                   error=f'{type(e).__name__}: {e}'[:300])
    print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()

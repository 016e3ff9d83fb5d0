"""Import a reference (torch) checkpoint into this framework.

Converts a released aimotive/mm_training checkpoint (README.md:65-72; torch
state_dict with mmdet/mmdet3d naming) into this framework's parameter trees
via models/torch_import, grafts it onto a freshly initialized model, runs a
forward smoke test, and (optionally) writes an orbax checkpoint that
``Trainer.restore`` / ``Config.ckpt_path`` can load directly.

By default the import selects the import-compatible lidar encoder
(LidarEncoderConf.variant='sparse_import', models/sparse_encoder.py) so ALL
reference modules — including the spconv SparseEncoder — convert with zero
skipped weights. Pass --lidar-variant dense to keep the TPU-first dense
encoder instead (lidar branch then starts from init; retrain/distill).

Usage:
    python -m mm_training_tpu.scripts.import_checkpoint \
        --ckpt lidar_camera.ckpt --config lidar_cam_radar \
        [--out /path/to/converted] [key=value overrides...]
"""
from __future__ import annotations

import argparse
import json

import numpy as np

__all__ = ['import_checkpoint', 'main']


def import_checkpoint(ckpt_path: str, cfg, out: str = None,
                      smoke: bool = True) -> dict:
    """Convert + graft + smoke-test; returns a coverage report dict."""
    import jax
    import jax.numpy as jnp

    from ..data.fake_batch import make_fake_batch
    from ..models import BEVDepthLiDAR
    from ..models.torch_import import (convert_reference_checkpoint,
                                       load_torch_state_dict, merge_subtree)

    sd = load_torch_state_dict(ckpt_path)
    params, stats = convert_reference_checkpoint(sd, cfg)

    lidar_imported = (cfg.use_lidar
                      and cfg.get_lidar_conf().variant == 'sparse_import')
    known = ('backbone.', 'head.', 'bev_fuse.')
    report = {
        'checkpoint': ckpt_path,
        'source_keys': len(sd),
        'converted_leaves': len(jax.tree_util.tree_leaves((params, stats))),
        'lidar_encoder': 'converted (sparse_import)' if lidar_imported
                         else 'skipped (dense TPU encoder)',
        'skipped_lidar_encoder_keys':
            0 if lidar_imported
            else sum(k.startswith('lidar_encoder.') for k in sd),
        'skipped_dead_context_se_keys':
            sum('.context_se.' in k for k in sd),
        'unrecognized_keys': sorted(
            k for k in sd
            if not k.startswith(known + ('lidar_encoder.',))),
    }

    model = BEVDepthLiDAR(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_fake_batch(cfg, batch_size=1, seed=0).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch, None, False)
    merged = merge_subtree(variables, params, stats)

    if smoke:
        preds, depth_pred, _, _ = model.apply(merged, batch, None, False)
        finite = all(bool(np.isfinite(np.asarray(p[k], np.float32)).all())
                     for p in preds for k in p)
        report['forward_smoke'] = 'ok' if finite else 'NON-FINITE OUTPUTS'

    if out:
        import orbax.checkpoint as ocp

        from ..training.optim import make_optimizer
        tx = make_optimizer(cfg, steps_per_epoch=1000)
        tree = {'step': jnp.zeros((), jnp.int32),
                'params': merged['params'],
                'batch_stats': merged.get('batch_stats', {}),
                'opt_state': tx.init(merged['params'])}
        if cfg.use_ema:  # Trainer.restore targets include EMA shadows then
            tree['ema_params'] = merged['params']
            tree['ema_batch_stats'] = merged.get('batch_stats', {})
        import os
        path = os.path.abspath(os.path.join(out, '0', 'default'))
        # StandardCheckpointer is an AsyncCheckpointer: save() returns
        # before the atomic directory-rename commit. Block until the
        # checkpoint is durable — callers (exps/parity, tests) restore it
        # immediately, and an un-waited temporary checkpointer races its
        # own GC (observed as flaky "No structure could be identified").
        ckptr = ocp.StandardCheckpointer()
        try:
            ckptr.save(path, tree)
            ckptr.wait_until_finished()
        finally:
            ckptr.close()
        report['saved'] = path
    return report


def main(argv=None):
    from ..exps.common import build_config, parse_args
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--ckpt', required=True)
    p.add_argument('--config', default='lidar_cam_radar')
    p.add_argument('--out', default=None,
                   help='write an orbax checkpoint loadable via ckpt_path')
    p.add_argument('--no-smoke', action='store_true')
    p.add_argument('--lidar-variant', default='sparse_import',
                   choices=['sparse_import', 'dense'],
                   help='lidar encoder: sparse_import converts the reference '
                        'SparseEncoder weights exactly; dense keeps the '
                        'TPU-first encoder (lidar branch from init)')
    p.add_argument('overrides', nargs='*')
    args = p.parse_args(argv)

    cli = parse_args(['--config', args.config] + list(args.overrides))
    cfg = build_config(cli)
    if cfg.use_lidar:
        import dataclasses as _dc
        prev = cfg.get_lidar_conf().variant
        if prev != args.lidar_variant:
            # a checkpoint written with one variant cannot restore into a
            # model built with the other (different params subtree) — make
            # the override loud so training configs stay consistent
            print(f'NOTE: lidar encoder variant {prev!r} (from the config) '
                  f'-> {args.lidar_variant!r} for this import; train/eval '
                  f'configs that load the result must also set '
                  f'LidarEncoderConf.variant={args.lidar_variant!r}')
        cfg = cfg.replace(lidar_conf=_dc.replace(
            cfg.get_lidar_conf(), variant=args.lidar_variant))
    report = import_checkpoint(args.ckpt, cfg, out=args.out,
                               smoke=not args.no_smoke)
    print(json.dumps(report, indent=2))
    return report


if __name__ == '__main__':
    main()

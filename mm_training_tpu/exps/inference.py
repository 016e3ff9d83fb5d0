"""Inference entry point (re-design of exps/inference.py): load a checkpoint,
run predict over the split, export aiMotive-format JSONs only (no metrics).

``--latency`` instead benchmarks the serving path: repeated single-batch
predict dispatches with a forced bundled fetch per call (block_until_ready
does not synchronize on remote-attached backends), reporting p50/p90/p99.
"""
from __future__ import annotations

import time

import numpy as np

from ..training.trainer import Trainer
from .common import build_config, parse_args


def benchmark_latency(trainer: Trainer, iters: int = 50) -> dict:
    """End-to-end predict latency (forward + decode + NMS + host fetch)."""
    from ..parallel import local_batches_numpy
    batch, device_batch, _ = next(iter(
        trainer._device_batches(trainer.loader('val'))))
    with trainer.mesh:
        out = trainer._predict_step(trainer.state, device_batch)  # compile
    local_batches_numpy(*out)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        with trainer.mesh:
            out = trainer._predict_step(trainer.state, device_batch)
        local_batches_numpy(*out)  # single bundled fetch = the real latency
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    return {'p50_ms': float(np.percentile(lat, 50)),
            'p90_ms': float(np.percentile(lat, 90)),
            'p99_ms': float(np.percentile(lat, 99)),
            'batch_size': int(batch['points'].shape[0])}


def main(argv=None):
    args = parse_args(argv, description='Run inference + JSON export',
                      extra_flags=('latency', 'fold-bn'))
    cfg = build_config(args)
    trainer = Trainer(cfg)
    trainer.setup(steps_per_epoch=1)
    first = next(iter(trainer.loader('val')))
    trainer.init_state(first)
    if getattr(args, 'fold_bn', False):
        trainer.fold_bn_for_inference()
    if getattr(args, 'latency', False):
        stats = benchmark_latency(trainer)
        print('predict latency (fwd+decode+NMS+fetch): '
              + '  '.join(f'{k}={v:.1f}' if isinstance(v, float) else
                          f'{k}={v}' for k, v in stats.items()))
        return
    trainer.predict(split='val', max_batches=args.max_batches)
    print(f'results written under {trainer.out_path / "outputs"}')


if __name__ == '__main__':
    main()

"""Training entry point (re-design of exps/mm_training_aim.py:main_train).

fit (with val each epoch, early stopping, best/latest checkpoints), then a
final test pass with the best checkpoint's weights — the reference's
``trainer.fit(...); trainer.test(ckpt='best')`` (mm_training_aim.py:633-643).
"""
from __future__ import annotations

import json

from ..training.trainer import Trainer
from .common import build_config, parse_args


def main(argv=None):
    args = parse_args(argv, description='Train a BEV detector',
                      extra_flags=('profile',))
    cfg = build_config(args)
    trainer = Trainer(cfg)
    trainer.setup()
    if getattr(args, 'profile', False):
        # capture a device trace of a few train steps and exit (view in
        # Perfetto / TensorBoard; the per-op attribution workflow behind
        # BASELINE.md's tables)
        path = trainer.profile(n_steps=args.max_steps or 5)
        print(f'device trace written under {path}')
        return {}
    trainer.fit(max_epochs=args.max_epochs, max_steps=args.max_steps)
    # reload best checkpoint and run the test pass (mm_training_aim.py:639)
    best = trainer.out_path / 'saved_models' / 'best'
    if best.is_dir():
        trainer.restore(str(best))
    metrics = trainer.test(max_batches=args.max_batches)
    print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))
    return metrics


if __name__ == '__main__':
    main()

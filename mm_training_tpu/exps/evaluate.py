"""Evaluation entry point (re-design of exps/eval.py): load a checkpoint,
run the test pass (losses + BEV mAP + aiMotive-JSON export)."""
from __future__ import annotations

import json

from ..training.trainer import Trainer
from .common import build_config, parse_args


def main(argv=None):
    args = parse_args(argv, description='Evaluate a checkpoint')
    cfg = build_config(args)
    trainer = Trainer(cfg)
    trainer.setup(steps_per_epoch=1)
    first = next(iter(trainer.loader('val')))
    trainer.init_state(first)  # restores cfg.ckpt_path if set
    metrics = trainer.test(max_batches=args.max_batches)
    print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))
    return metrics


if __name__ == '__main__':
    main()

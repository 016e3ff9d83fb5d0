"""Inference entry point (re-design of exps/inference.py): load a checkpoint,
run predict over the split, export aiMotive-format JSONs only (no metrics)."""
from __future__ import annotations

from ..training.trainer import Trainer
from .common import build_config, parse_args


def main(argv=None):
    args = parse_args(argv, description='Run inference + JSON export')
    cfg = build_config(args)
    trainer = Trainer(cfg)
    trainer.setup(steps_per_epoch=1)
    first = next(iter(trainer.loader('val')))
    trainer.init_state(first)
    trainer.predict(split='val', max_batches=args.max_batches)
    print(f'results written under {trainer.out_path / "outputs"}')


if __name__ == '__main__':
    main()

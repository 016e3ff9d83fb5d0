"""Optimizer / LR schedule factory.

Parity with the reference (mm_training_aim.py:524-531,626): AdamW
(weight decay 1e-7), MultiStepLR with epoch milestones [19, 23] and gamma
0.1, global-norm gradient clipping at 2.0, and the linear LR scaling rule
lr = base/64 * batch (conf_aim.py:14).
"""
from __future__ import annotations

import optax

from ..configs import Config

__all__ = ['make_optimizer', 'multistep_schedule']


def multistep_schedule(base_lr: float, milestones_epochs, gamma: float,
                       steps_per_epoch: int):
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000,
                   global_batch_scale: int = 1) -> optax.GradientTransformation:
    lr = cfg.learning_rate * global_batch_scale
    schedule = multistep_schedule(lr, cfg.lr_milestones, cfg.lr_gamma,
                                  steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )

"""Experiment entry points (re-design of the reference's exps/ scripts).

Usage:
    python -m mm_training_tpu.exps.train --config lidar_radar [key=value ...]
    python -m mm_training_tpu.exps.evaluate --config eval_lidar_radar ckpt_path=...
    python -m mm_training_tpu.exps.inference --config lidar_radar ckpt_path=...

Configs are named variants (mm_training_tpu.configs.variants) overridden with
key=value pairs — data, not file copies (the reference's "override by
replacing conf_aim.py", README.md:49, is replaced by dataclass replace).
"""
from .common import build_config, parse_args

__all__ = ['build_config', 'parse_args']

"""Metrics logging: JSONL + optional TensorBoard, plus profiling hooks.

Replaces the reference's Lightning self.log / WandbLogger-or-
TensorBoardLogger wiring (mm_training_aim.py:286-288,587). wandb is not in
the TPU image; when available it can be enabled with Config.log_wandb.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None

try:
    import wandb
except ImportError:  # pragma: no cover
    wandb = None

__all__ = ['MetricsLogger']


class NullLogger:
    """Rank>0 logger in multi-process runs: metrics are identical on every
    process (global-view jit), so only rank 0 writes (Lightning's
    rank_zero_only logging equivalent)."""

    def log_step(self, step, metrics):
        pass

    def log_scalar(self, step, name, value):
        pass

    def log_eval(self, step, metrics):
        pass

    def log_image(self, step, name, image):
        pass


class MetricsLogger:
    def __init__(self, out_path, experiment_name: str, log_every: int = 50,
                 use_tensorboard: bool = True, use_wandb: bool = False):
        self.out_path = Path(out_path)
        self.out_path.mkdir(parents=True, exist_ok=True)
        self.log_every = log_every
        self.jsonl = open(self.out_path / 'metrics.jsonl', 'a')
        self.tb = (SummaryWriter(str(self.out_path / 'tb' / experiment_name))
                   if use_tensorboard and SummaryWriter is not None else None)
        self.wandb_run = None
        if use_wandb and wandb is not None:  # pragma: no cover
            self.wandb_run = wandb.init(project='mm_training_exp',
                                        name=experiment_name)
        self._t_last = time.time()
        self._step_last = 0

    def _emit(self, step: int, metrics: Dict[str, float]):
        rec = {'step': step, 'time': time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)
        if self.wandb_run is not None:  # pragma: no cover
            self.wandb_run.log(dict(metrics), step=step)

    def log_step(self, step: int, metrics):
        if step % self.log_every:
            return
        now = time.time()
        sps = (step - self._step_last) / max(now - self._t_last, 1e-9)
        self._t_last, self._step_last = now, step
        m = {k: float(np.asarray(v)) for k, v in metrics.items()}
        m['steps_per_sec'] = sps
        self._emit(step, m)

    def log_scalar(self, step: int, name: str, value: float):
        self._emit(step, {name: value})

    def log_eval(self, step: int, metrics: Dict[str, float]):
        self._emit(step, metrics)

    def log_image(self, step: int, name: str, image: np.ndarray):
        """HWC uint8 image panel (the reference logged wandb heatmap/depth
        panels every 200 steps, mm_training_aim.py:270-284,491-499). Also
        dumped as a PNG under out_path/panels/ so runs without TB/wandb
        still get inspectable artifacts."""
        if self.tb is not None:
            self.tb.add_image(name, image.transpose(2, 0, 1), step)
        if self.wandb_run is not None:  # pragma: no cover
            self.wandb_run.log({name: wandb.Image(image)}, step=step)
        try:
            import cv2
            panels = self.out_path / 'panels'
            panels.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(panels / f'{name}_{step:07d}.png'), image)
        except Exception:  # pragma: no cover - best-effort artifact
            pass

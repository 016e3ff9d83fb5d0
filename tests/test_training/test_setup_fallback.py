"""Trainer.setup steps_per_epoch inference (VERDICT r3 weak #3 / next #7).

The LR milestones ([19, 23] epochs, conf_aim.py:16) are scheduled in STEPS,
so a silently-wrong steps_per_epoch corrupts the schedule. Contract:
  * a dataset without __len__ (the only case where a default is meaningful)
    falls back to 1000 with a LOUD UserWarning;
  * any other loader failure propagates — training must not start against a
    mis-scheduled optimizer.
"""
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.training.trainer import Trainer


class _NoLenDataset:
    """Iterable-style dataset a user might inject via the datasets dict."""

    def __getitem__(self, i):  # pragma: no cover - never reached in setup
        raise IndexError


class _BrokenDataset:
    def __len__(self):
        raise ValueError('corrupt index file')


def _trainer(tmp_path, dataset):
    cfg = tiny_test_config(use_cam=False, use_radar=False,
                           out_path=str(tmp_path))
    return Trainer(cfg, datasets={'train': dataset})


def test_no_len_dataset_warns_and_defaults(tmp_path):
    tr = _trainer(tmp_path, _NoLenDataset())
    with pytest.warns(UserWarning, match='no __len__'):
        tr.setup()
    assert tr.steps_per_epoch == 1000


def test_broken_loader_propagates(tmp_path):
    tr = _trainer(tmp_path, _BrokenDataset())
    with pytest.raises(ValueError, match='corrupt index file'):
        tr.setup()


def test_explicit_steps_per_epoch_skips_loader(tmp_path):
    # an explicit value must not touch the (broken) loader at all
    tr = _trainer(tmp_path, _BrokenDataset())
    tr.setup(steps_per_epoch=250)
    assert tr.steps_per_epoch == 250

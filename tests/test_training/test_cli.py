"""CLI plumbing tests: variant resolution + key=value overrides."""
import pytest

from mm_training_tpu.exps.common import build_config, parse_args


def test_variant_and_overrides():
    args = parse_args(['--config', 'lidar_cam_radar', '--seed', '7',
                       'batch_size=2', 'use_tta=True',
                       'data_root=/data/x', 'base_learning_rate=1e-4'])
    cfg = build_config(args)
    assert cfg.use_cam and cfg.use_lidar and cfg.use_radar
    assert cfg.batch_size == 2
    assert cfg.seed == 7
    assert cfg.use_tta is True
    assert cfg.data_root == '/data/x'
    assert cfg.base_learning_rate == pytest.approx(1e-4)


def test_unknown_variant_errors():
    args = parse_args(['--config', 'nope'])
    with pytest.raises(SystemExit):
        build_config(args)


def test_bad_override_errors():
    args = parse_args(['--config', 'lidar_only', 'oops'])
    with pytest.raises(SystemExit):
        build_config(args)


def test_string_values_pass_through():
    args = parse_args(['--config', 'eval_lidar_radar',
                       'eval_split=night'])
    cfg = build_config(args)
    assert cfg.eval_split == 'night'
    assert cfg.experiment_name == 'lidar_radar_eval'

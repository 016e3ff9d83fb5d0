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


def test_extra_flags():
    args = parse_args(['--config', 'lidar_only', '--latency'],
                      extra_flags=('latency',))
    assert args.latency is True
    args = parse_args(['--config', 'lidar_only'], extra_flags=('latency',))
    assert args.latency is False


@pytest.mark.slow
def test_inference_latency_benchmark(tmp_path):
    """--latency drives the real predict step and reports percentiles."""
    import numpy as np
    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    from mm_training_tpu.exps.inference import benchmark_latency
    from mm_training_tpu.training.trainer import Trainer

    root = str(tmp_path / 'ds')
    generate_synthetic_dataset(root, splits=('val',), sequences_per_odd=1,
                               frames_per_sequence=2, img_hw=(64, 128))
    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           batch_size=1, num_workers=1,
                           out_path=str(tmp_path / 'out'))
    tr = Trainer(cfg, data_root=root)
    tr.setup(steps_per_epoch=1)
    tr.init_state(next(iter(tr.loader('val'))))
    stats = benchmark_latency(tr, iters=3)
    # loader yields GLOBAL batches: per-device batch x data-parallel size
    assert stats['batch_size'] == cfg.batch_size * tr.data_parallel_size
    assert 0 < stats['p50_ms'] <= stats['p90_ms'] <= stats['p99_ms']
    assert np.isfinite(stats['p99_ms'])


@pytest.mark.slow
def test_train_profile_flag(tmp_path):
    """--profile captures a device trace of a few steps and exits."""
    import pathlib
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    from mm_training_tpu.exps.train import main

    root = str(tmp_path / 'ds')
    # global batch = batch_size x 8 virtual devices -> need >= 8 train frames
    generate_synthetic_dataset(root, splits=('train', 'val'),
                               sequences_per_odd=1, frames_per_sequence=8,
                               img_hw=(64, 128))
    out = main(['--config', 'tiny_test_config', '--profile',
                '--max-steps', '1', '--data-root', root,
                'use_cam=False', 'use_lidar=True', 'use_radar=True',
                'batch_size=1', 'num_workers=1',
                f'out_path={tmp_path / "out"}'])
    assert out == {}
    traces = list(pathlib.Path(tmp_path / 'out' / 'profile').rglob(
        '*.trace.json.gz'))
    assert traces, 'no trace file written'


def test_string_values_pass_through():
    args = parse_args(['--config', 'eval_lidar_radar',
                       'eval_split=night'])
    cfg = build_config(args)
    assert cfg.eval_split == 'night'
    assert cfg.experiment_name == 'lidar_radar_eval'


@pytest.mark.slow
def test_inference_fold_bn_matches_unfolded(tmp_path):
    """Trainer.fold_bn_for_inference (the --fold-bn path): folded predict
    decodes the same boxes as the unfolded predict on the same weights —
    and folding one Trainer must not leak into another Trainer in the
    same process (folded-ness lives in the params, not process state)."""
    import numpy as np
    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    from mm_training_tpu.training.trainer import Trainer

    root = str(tmp_path / 'ds')
    generate_synthetic_dataset(root, splits=('val',), sequences_per_odd=1,
                               frames_per_sequence=2, img_hw=(64, 128))
    # fp32: this test pins the fold/flag/rebuild orchestration invariant —
    # at bf16 the kernel-rescale rounding would loosen the decode compare
    # (bf16 numerics are covered at model level in test_bn_fold.py)
    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           batch_size=1, num_workers=1, precision='fp32',
                           out_path=str(tmp_path / 'out'))
    tr = Trainer(cfg, data_root=root)
    tr.setup(steps_per_epoch=1)
    batch = next(iter(tr.loader('val')))
    tr.init_state(batch)
    _, device_batch, _ = next(iter(tr._device_batches(tr.loader('val'))))
    unfolded_state = tr.state
    with tr.mesh:
        ref = [np.asarray(x) for x in
               tr._predict_step(tr.state, device_batch)]
    tr.fold_bn_for_inference()
    with tr.mesh:
        got = [np.asarray(x) for x in
               tr._predict_step(tr.state, device_batch)]
    # boxes/scores: tolerance (fold reorders float ops); labels/valid exact
    np.testing.assert_allclose(ref[0], got[0], atol=2e-3)
    np.testing.assert_allclose(ref[1], got[1], atol=2e-3)
    np.testing.assert_array_equal(ref[2], got[2])
    np.testing.assert_array_equal(ref[3], got[3])

    # a second, UNFOLDED Trainer in the same process: its traces must emit
    # real BatchNorm modules (the round-4 process-global flag would have
    # silently traced FoldedBN against unfolded weights here)
    tr2 = Trainer(cfg.replace(out_path=str(tmp_path / 'out2')),
                  data_root=root)
    tr2.setup(steps_per_epoch=1)
    tr2.init_state(batch)
    tr2.state = tr2.state.replace(params=unfolded_state.params,
                                  batch_stats=unfolded_state.batch_stats)
    with tr2.mesh:
        got2 = [np.asarray(x) for x in
                tr2._predict_step(tr2.state, device_batch)]
    for r, g in zip(ref, got2):
        np.testing.assert_array_equal(r, g)
    # and training on FOLDED weights must refuse at trace time
    import pytest as _pytest
    tr.state = tr.state.replace(step=tr.state.step * 0)
    with _pytest.raises(ValueError, match='inference-only'), tr.mesh:
        tr._train_step(tr.state, device_batch,
                       __import__('jax').random.PRNGKey(0))

"""The one-command accuracy-parity runbook (exps/parity) end-to-end on the
synthetic fixture with a converted-random reference-format checkpoint.

The real aiMotive data + released checkpoints don't exist in CI; this pins
that the day they do, ``python -m mm_training_tpu.exps.parity --data-root ...
--ckpt-dir ...`` is a working single command: checkpoint discovery ->
torch_import conversion (zero skipped weights) -> per-ODD eval -> report
table (reference protocol: exps/mm_training_aim.py:416-422 per ODD via
exps/configs/eval_*.py)."""
import json

import pytest

from mm_training_tpu.configs import (LidarEncoderConf, VoxelizationConf,
                                     tiny_test_config)
from mm_training_tpu.exps.parity import find_checkpoint, run_parity

_MODALITIES = {
    'lidar_only': dict(use_cam=False, use_radar=False),
    'lidar_radar': dict(use_cam=False, use_radar=True),
    'lidar_cam': dict(use_cam=True, use_radar=False),
    'lidar_cam_radar': dict(use_cam=True, use_radar=True),
}


def _tiny_factory(variant, **kw):
    cfg = tiny_test_config(use_lidar=True, batch_size=1, num_workers=1,
                           **_MODALITIES[variant], **kw)
    return cfg.replace(lidar_conf=LidarEncoderConf(
        variant='sparse_import',
        voxelization=VoxelizationConf(max_num_points=8, max_voxels=1024)))


def test_find_checkpoint_maps_stems_to_variants(tmp_path):
    d = tmp_path / 'ckpts'
    d.mkdir()
    for name in ('lidar.ckpt', 'lidar_camera.ckpt', 'lidar_radar-v2.pth',
                 'lidar_cam_radar_epoch23.ckpt', 'readme.txt'):
        (d / name).write_bytes(b'x')
    assert find_checkpoint(str(d), 'lidar_only').endswith('lidar.ckpt')
    assert find_checkpoint(str(d), 'lidar_cam').endswith('lidar_camera.ckpt')
    assert find_checkpoint(str(d), 'lidar_radar').endswith(
        'lidar_radar-v2.pth')
    assert find_checkpoint(str(d), 'lidar_cam_radar').endswith(
        'lidar_cam_radar_epoch23.ckpt')


@pytest.mark.slow
def test_parity_runbook_end_to_end(tmp_path):
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    from tests.test_data.test_import_checkpoint import _reference_ckpt

    root = generate_synthetic_dataset(
        str(tmp_path / 'ds'), splits=('val',), odds=('highway', 'urban'),
        sequences_per_odd=1, frames_per_sequence=2, img_hw=(64, 128))

    # one random reference-format checkpoint (full module tree — the
    # reference's Lightning checkpoints carry every branch regardless of
    # modality flags); the other three variants stay missing to pin the
    # skip-with-note path
    cfg = _tiny_factory('lidar_cam_radar')
    ckpt_dir = tmp_path / 'ckpts'
    ckpt_dir.mkdir()
    src = _reference_ckpt(tmp_path, cfg, with_lidar=True)
    (ckpt_dir / 'lidar_cam_radar.ckpt').write_bytes(
        open(src, 'rb').read())

    paper = tmp_path / 'paper.json'
    paper.write_text(json.dumps(
        {'lidar_cam_radar': {'highway': 0.5, 'urban': 0.4}}))

    report = run_parity(
        root, str(ckpt_dir), out=str(tmp_path / 'parity_out'),
        variants=('lidar_cam_radar', 'lidar_only'),
        odds=('highway', 'urban'), paper_json=str(paper),
        cfg_factory=_tiny_factory)

    res = report['results']
    assert 'error' in res['lidar_only']  # missing ckpt -> skipped, not fatal
    lrc = res['lidar_cam_radar']
    assert 'error' not in lrc, lrc
    # conversion was exact: zero skipped / unrecognized reference weights
    assert lrc['import_report']['unrecognized_keys'] == []
    assert lrc['import_report']['skipped_lidar_encoder_keys'] == 0
    # per-ODD eval produced the protocol metric for every requested ODD
    for odd in ('highway', 'urban'):
        assert f'test_{odd}_ap_auc' in lrc['per_odd'][odd]
    # artifacts: markdown table with ours-vs-paper columns + JSON report
    md = (tmp_path / 'parity_out' / 'parity_report.md').read_text()
    assert 'mAP (paper 2211.09445)' in md
    assert '| lidar_cam_radar | highway |' in md
    assert '0.500' in md  # the supplied paper number renders in the table
    assert (tmp_path / 'parity_out' / 'parity_report.json').is_file()

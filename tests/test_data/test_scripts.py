"""Offline tools on the synthetic dataset tree: OpenPCDet export and
depth-GT precompute produce well-formed artifacts."""
import glob
import os

import numpy as np
import pytest

from mm_training_tpu.data import generate_synthetic_dataset


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('scripts_ds')
    return generate_synthetic_dataset(str(root), splits=('val',),
                                      frames_per_sequence=2, n_objects=4,
                                      img_hw=(64, 128))


def test_export_openpcdet(synth_root, tmp_path):
    from mm_training_tpu.scripts.export_openpcdet import main
    out = str(tmp_path / 'opcd')
    main(['--data-root', synth_root, '--split', 'val', '--out', out])
    pts = sorted(glob.glob(os.path.join(out, 'val', 'points', '*.npy')))
    lbls = sorted(glob.glob(os.path.join(out, 'val', 'labels', '*.txt')))
    assert len(pts) == len(lbls) == 2
    arr = np.load(pts[0])
    assert arr.ndim == 2 and arr.shape[1] == 4  # x y z intensity
    line = open(lbls[0]).readline().split()
    assert len(line) == 8  # x y z dx dy dz yaw category
    float(line[0])


def test_gen_depth_gt(synth_root, tmp_path):
    from mm_training_tpu.scripts.gen_depth_gt import main
    out = str(tmp_path / 'dgt')
    main(['--data-root', synth_root, '--split', 'val', '--out', out,
          '--workers', '1', '--height', '64', '--width', '128'])
    files = glob.glob(os.path.join(out, '**', '*_depth.npy'), recursive=True)
    assert len(files) == 2
    grid = np.load(files[0])
    assert grid.ndim == 3 and grid.shape[1:] == (4, 8)  # [n_cams, H/16, W/16]
    assert (grid > 0).any()          # some projected lidar depth
    assert float(grid.max()) < 1e4   # empty cells are 0, not the sentinel

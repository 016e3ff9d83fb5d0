"""Precomputed depth-GT path: gen_depth_gt writes it, the dataset ships it,
the train step consumes it (VERDICT r1 items 3/4 — the reference reads its
equivalent at nusc_mv_det_dataset.py:387-396)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.aimotive_dataset import AiMotiveDataset, collate_aim
from mm_training_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('aim'))
    generate_synthetic_dataset(root, splits=('val',), sequences_per_odd=1,
                               frames_per_sequence=2, img_hw=(64, 128))
    return root


@pytest.mark.slow
def test_gen_depth_gt_writes_consumable_grids(synth_root, tmp_path):
    from mm_training_tpu.scripts.gen_depth_gt import main as gen_main
    out = str(tmp_path / 'depth_gt')
    gen_main(['--data-root', synth_root, '--split', 'val', '--out', out,
              '--workers', '1', '--height', '64', '--width', '128'])

    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True,
                           depth_gt_root=out, batch_size=2)
    ds = AiMotiveDataset(synth_root, cfg, split='val')
    s = ds[0]
    assert 'depth_gt' in s
    assert s['depth_gt'].shape == (cfg.num_cameras, 64 // 16, 128 // 16)
    assert s['depth_gt'].max() > 0  # some lidar lands in the cameras

    # the whole train step consumes the grids (no on-device projection)
    from mm_training_tpu.models import BEVDepthLiDAR
    from mm_training_tpu.training.optim import make_optimizer
    from mm_training_tpu.training.train_step import (create_train_state,
                                                     make_train_step)
    batch = {k: jnp.asarray(v) for k, v in collate_aim([ds[0], ds[1]]).items()
             if k != 'path'}
    model = BEVDepthLiDAR(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    mb = dict(batch)
    b, sw, n = batch['imgs'].shape[:3]
    mb['flipped'] = jnp.zeros((b * sw * n,), bool)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), mb)
    _, metrics = make_train_step(cfg, model, tx)(state, batch,
                                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['train_loss']))
    assert float(metrics['train_depth_loss']) > 0


def test_depth_gt_binning_matches_projection():
    """depth_grid_to_onehot on a projected grid == the direct projection
    path (same binning formula)."""
    from mm_training_tpu.ops.depth_labels import (depth_grid_to_onehot,
                                                  depth_labels_single_cam)
    from mm_training_tpu.scripts.gen_depth_gt import depth_grid_numpy
    rng = np.random.default_rng(0)
    # camera-frame points (extr = identity, z forward)
    cam_pts = np.column_stack([rng.uniform(-10, 10, 500),
                               rng.uniform(-10, 10, 500),
                               rng.uniform(2, 25, 500)]).astype(np.float32)
    extr = np.eye(4, dtype=np.float32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 60.0
    intr[0, 2], intr[1, 2] = 64.0, 32.0
    d_bound, bins = (2.0, 27.2, 0.5), 50
    grid = depth_grid_numpy(cam_pts, extr, intr, (64, 128), 16)
    direct = depth_labels_single_cam(
        jnp.asarray(cam_pts), jnp.ones((500,), bool), jnp.asarray(extr),
        jnp.asarray(intr), (64, 128), 16, d_bound, bins)
    via_grid = depth_grid_to_onehot(jnp.asarray(grid), d_bound, bins)
    np.testing.assert_allclose(np.asarray(via_grid), np.asarray(direct))


def test_missing_depth_gt_raises(synth_root, tmp_path):
    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True,
                           depth_gt_root=str(tmp_path / 'nowhere'))
    ds = AiMotiveDataset(synth_root, cfg, split='val')
    with pytest.raises(FileNotFoundError):
        ds[0]

"""Fisheye virtualization end-to-end (VERDICT r1 item 7): two synthetic Mei
cameras (yaw +-90) each become two yaw+-30 virtual pinholes
(data_loader.py:152-240), the 6-camera batch feeds one train step."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.aimotive_dataset import AiMotiveDataset, collate_aim
from mm_training_tpu.core.transforms import R_Z_FORWARD_TO_BODY
from mm_training_tpu.data.frame_loader import FrameLoader
from mm_training_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope='module')
def fisheye_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('aim_fish'))
    generate_synthetic_dataset(root, splits=('val',), sequences_per_odd=1,
                               frames_per_sequence=2, img_hw=(64, 128),
                               fisheyes=True)
    return root


def _cam_yaw_deg(extrinsic: np.ndarray) -> float:
    ext = np.linalg.inv(extrinsic)
    rot = Rotation.from_matrix(ext[:3, :3])
    rz = Rotation.from_matrix(R_Z_FORWARD_TO_BODY)
    return float((rot * rz.inv()).as_euler('XYZ', degrees=True)[2])


def test_fisheyes_become_four_virtual_pinholes(fisheye_root):
    from mm_training_tpu.data.aimotive_dataset import get_frames
    loader = FrameLoader('val', pc_range=(-25.6, -12.8, -5, 25.6, 12.8, 3),
                         use_cam=True, use_lidar=True, use_radar=True,
                         virtualize_fisheyes=True, image_size=(64, 128))
    frame = loader[get_frames(fisheye_root, 'val')[0]]
    assert len(frame.cameras) == 6  # front, back, 2x left fish, 2x right fish

    yaws = [_cam_yaw_deg(c.camera_params.extrinsic) for c in frame.cameras]
    # front 0, back 180, left fisheye (90) -> 60/120, right (-90) -> -120/-60
    def close(a, b):
        return min(abs(a - b), 360 - abs(a - b)) < 1.0
    assert close(yaws[0], 0) and close(abs(yaws[1]), 180)
    assert sorted(round(y) for y in yaws[2:4]) == [60, 120]
    assert sorted(round(y) for y in yaws[4:6]) == [-120, -60]

    for c in frame.cameras:
        assert c.image is not None and c.image.shape == (64, 128, 3)
        assert c.camera_params.camera_model == 'pinhole'
        # zero roll/pitch by construction
        ext = np.linalg.inv(c.camera_params.extrinsic)
        rz = Rotation.from_matrix(R_Z_FORWARD_TO_BODY)
        euler = (Rotation.from_matrix(ext[:3, :3]) * rz.inv()).as_euler(
            'XYZ', degrees=True)
        assert abs(euler[0]) < 1e-6 and abs(euler[1]) < 1e-6


@pytest.mark.slow
def test_six_camera_batch_trains_one_step(fisheye_root):
    import jax
    import jax.numpy as jnp
    from mm_training_tpu.models import BEVDepthLiDAR
    from mm_training_tpu.training.optim import make_optimizer
    from mm_training_tpu.training.train_step import (create_train_state,
                                                     make_train_step)

    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True,
                           num_cameras=6, virtualize_fisheyes=True,
                           batch_size=2)
    ds = AiMotiveDataset(fisheye_root, cfg, split='val')
    batch = {k: jnp.asarray(v) for k, v in collate_aim([ds[0], ds[1]]).items()
             if k != 'path'}
    assert batch['imgs'].shape == (2, 1, 6, 64, 128, 3)

    model = BEVDepthLiDAR(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    mb = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    mb['flipped'] = jnp.zeros((b * s * n,), bool)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), mb)
    _, metrics = make_train_step(cfg, model, tx)(state, batch,
                                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['train_loss']))

"""aiMotive temporal lidar aggregation (look_back / look_forward).

VERDICT r2 item 5: the egomotion-compensated aggregation
(data/loaders.py:load_lidar_data; reference lidar_loader.py:44-76) had zero
tests. Here a moving, yawing ego observes a STATIC world landmark across
three frames — after compensation every copy must land on the key frame's
coordinates exactly. Plus the dataset-level path: look_back/look_forward > 0
triples the aggregated cloud and trims the frame index.
"""
import json
import os

import numpy as np
import pytest

from mm_training_tpu.data.loaders import load_lidar_data


def _pose(x, yaw):
    """body -> world transform."""
    t = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    t[:2, :2] = [[c, -s], [s, c]]
    t[0, 3] = x
    return t


def _write_sequence(root, poses, landmarks_world):
    """Minimal aiMotive sequence: egomotion.json + per-frame lidar npy with
    the static landmarks expressed in each frame's OWN body coordinates."""
    lid_dir = os.path.join(root, 'dynamic', 'raw-revolutions')
    gnss_dir = os.path.join(root, 'sensor', 'gnssins')
    os.makedirs(lid_dir)
    os.makedirs(gnss_dir)
    ego = {}
    for fi, pose in poses.items():
        ego[str(fi)] = pose.reshape(-1).tolist()
        inv = np.linalg.inv(pose)
        xyz = landmarks_world @ inv[:3, :3].T + inv[:3, 3]
        pc = np.zeros((len(xyz), 5), np.float32)
        pc[:, :3] = xyz
        pc[:, 3] = 100.0
        np.save(os.path.join(lid_dir, f'frame_{str(fi).zfill(7)}.npy'), pc)
    with open(os.path.join(gnss_dir, 'egomotion.json'), 'w') as f:
        json.dump(ego, f)


def test_static_landmark_lands_on_key_frame(tmp_path):
    """Three frames, ego translating 2 m/frame AND yawing 0.1 rad/frame:
    after compensation all three copies of each landmark coincide in the
    key frame's body coordinates."""
    root = str(tmp_path)
    poses = {1: _pose(0.0, 0.0), 2: _pose(2.0, 0.1), 3: _pose(4.0, 0.2)}
    landmarks = np.asarray([[12.0, 3.0, 0.5], [20.0, -4.0, 1.0],
                            [15.0, 0.0, 2.0]])
    _write_sequence(root, poses, landmarks)

    agg = load_lidar_data(root, '0000002', look_back=1, look_forward=1)
    assert agg.shape == (9, 5)  # 3 frames x 3 landmarks, ego filter keeps all

    key_pose_inv = np.linalg.inv(poses[2])
    expect = landmarks @ key_pose_inv[:3, :3].T + key_pose_inv[:3, 3]
    got = agg[:, :3].reshape(3, 3, 3)  # [frame, landmark, xyz]
    for fr in range(3):
        np.testing.assert_allclose(got[fr], expect, atol=1e-5,
                                   err_msg=f'frame offset {fr - 1}')


def test_no_aggregation_is_identity(tmp_path):
    """look_back=look_forward=0 returns the key frame unchanged (modulo the
    ego-car body filter)."""
    root = str(tmp_path)
    poses = {5: _pose(10.0, 0.3)}
    landmarks = np.asarray([[8.0, 2.0, 0.0], [30.0, 5.0, 1.0]])
    _write_sequence(root, poses, landmarks)
    agg = load_lidar_data(root, '0000005')
    inv = np.linalg.inv(poses[5])
    expect = landmarks @ inv[:3, :3].T + inv[:3, 3]
    np.testing.assert_allclose(agg[:, :3], expect, atol=1e-5)


def test_dataset_consumes_aggregated_cloud(tmp_path):
    """Dataset level: look_back=1/look_forward=1 trims the frame index by
    the window and roughly triples the valid points of each sample; the
    aggregated cloud is what the camera path projects depth labels from."""
    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.data.aimotive_dataset import AiMotiveDataset
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset

    root = generate_synthetic_dataset(str(tmp_path / 'ds'), splits=('val',),
                                      frames_per_sequence=4, n_objects=4,
                                      img_hw=(64, 128), write_images=False)
    base = dict(use_cam=False, use_lidar=True, use_radar=False)

    ds0 = AiMotiveDataset(root, tiny_test_config(**base), split='val')
    ds1 = AiMotiveDataset(
        root, tiny_test_config(look_back=1, look_forward=1, **base),
        split='val')
    # 4 frames, window 1+1 -> 2 usable key frames
    assert len(ds0) == 4 and len(ds1) == 2

    n0 = int(ds0[1]['point_mask'].sum())  # key frame 2 without aggregation
    n1 = int(ds1[0]['point_mask'].sum())  # same key frame, 3-frame window
    assert n1 > 2 * n0, (n0, n1)
    # timestamps of neighbor frames ride in the ts feature: more than one
    # distinct value marks a genuinely multi-frame cloud
    s = ds1[0]
    ts = s['points'][s['point_mask']][:, -1]
    assert len(np.unique(np.round(ts, 6))) >= 2

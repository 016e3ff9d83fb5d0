"""Legacy nuScenes dataset on a synthetic info pickle + images."""
import os
import pickle

import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.nuscenes_dataset import NuscMVDetDataset


def _make_fixture(root, n_samples=3):
    try:
        import cv2
    except ImportError:
        cv2 = None
    rng = np.random.default_rng(0)
    infos = []
    os.makedirs(os.path.join(root, 'samples'), exist_ok=True)
    for i in range(n_samples):
        cam_infos = {}
        for ci, cam in enumerate(['CAM_FRONT', 'CAM_BACK']):
            fname = f'samples/{cam}_{i}.jpg'
            if cv2 is not None:
                cv2.imwrite(os.path.join(root, fname),
                            rng.integers(0, 255, (96, 160, 3), np.uint8))
            yaw = 0.0 if cam == 'CAM_FRONT' else np.pi
            cam_infos[cam] = {
                'filename': fname, 'height': 96, 'width': 160,
                'calibrated_sensor': {
                    'rotation': [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)],
                    'translation': [1.5 * (1 if ci == 0 else -1), 0.0, 1.6],
                    'camera_intrinsic': [[100.0, 0, 80], [0, 100.0, 48],
                                         [0, 0, 1]],
                },
                'ego_pose': {'rotation': [1, 0, 0, 0],
                             'translation': [i * 5.0, 0.0, 0.0]},
                'timestamp': 1000 + i,
            }
        anns = []
        for k in range(4):
            anns.append({
                'category_name': 'vehicle.car' if k % 2 == 0
                                 else 'human.pedestrian.adult',
                'translation': [i * 5.0 + rng.uniform(5, 30),
                                rng.uniform(-8, 8), 0.8],
                'size': [1.9, 4.5, 1.6],  # wlh
                'rotation': [1.0, 0, 0, 0],
                'velocity': [1.0, 0.5, 0.0],
            })
        infos.append({'sample_token': f'tok{i}', 'timestamp': 1000 + i,
                      'scene_token': 's0', 'cam_infos': cam_infos,
                      'lidar_infos': {}, 'ann_infos': anns, 'sweeps': []})
    path = os.path.join(root, 'nuscenes_infos_train.pkl')
    with open(path, 'wb') as f:
        pickle.dump(infos, f)
    return path


# nuScenes class ids: car=0, pedestrian=8
def test_nuscenes_dataset_items(tmp_path):
    info_path = _make_fixture(str(tmp_path))
    cfg = tiny_test_config(use_cam=True, use_lidar=False, use_radar=False,
                           H=64, W=128, num_cameras=2)
    ds = NuscMVDetDataset(info_path, cfg, data_root=str(tmp_path),
                          is_train=True, cams=('CAM_FRONT', 'CAM_BACK'))
    assert len(ds) == 3
    s = ds[0]
    assert s['imgs'].shape == (1, 2, 64, 128, 3)
    assert s['imgs'].dtype == np.uint8
    assert s['intrin'].shape == (1, 2, 4, 4)
    assert s['gt_mask'].sum() == 4
    labels = s['gt_labels'][s['gt_mask']]
    assert set(labels.tolist()) == {0, 8}
    # boxes in ego frame: ann at x = ego_x + [5, 30] -> local x in [5, 30]
    boxes = s['gt_boxes'][s['gt_mask']]
    # train mode applies BDA rotation/scale — generous bounds
    assert np.all(np.abs(boxes[:, 0]) < 40)
    # size converted wlh -> dx(l), dy(w)
    assert boxes[0, 3] == pytest.approx(4.5, rel=0.2)
    assert boxes[0, 4] == pytest.approx(1.9, rel=0.2)

    # deterministic per (seed, epoch, index)
    s2 = ds[0]
    np.testing.assert_allclose(s['imgs'], s2['imgs'])


def test_nuscenes_cbgs_oversamples(tmp_path):
    info_path = _make_fixture(str(tmp_path))
    cfg = tiny_test_config(use_cam=True, use_lidar=False, use_radar=False,
                           H=64, W=128, num_cameras=2)
    ds = NuscMVDetDataset(info_path, cfg, data_root=str(tmp_path),
                          use_cbgs=True, cams=('CAM_FRONT', 'CAM_BACK'))
    assert len(ds) >= 3  # duplicated pool


def test_nuscenes_eval_mode_center_crop(tmp_path):
    info_path = _make_fixture(str(tmp_path))
    cfg = tiny_test_config(use_cam=True, use_lidar=False, use_radar=False,
                           H=64, W=128, num_cameras=2)
    ds = NuscMVDetDataset(info_path, cfg, data_root=str(tmp_path),
                          is_train=False, cams=('CAM_FRONT', 'CAM_BACK'))
    s = ds[0]
    np.testing.assert_allclose(s['bda_mat'], np.eye(4))  # no aug at eval

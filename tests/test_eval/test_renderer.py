"""Renderer tests: geometry of corners, BEV raster contents, camera
projection sanity."""
import numpy as np

from mm_training_tpu.utils.renderer import (box_corners_3d, draw_boxes_camera,
                                            render_bev)


def test_box_corners_axis_aligned():
    c = box_corners_3d(np.asarray([10.0, 2.0, 1.0, 4.0, 2.0, 1.5, 0.0]))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].min(), 8.0)
    np.testing.assert_allclose(c[:, 0].max(), 12.0)
    np.testing.assert_allclose(c[:, 2].min(), 0.25)
    np.testing.assert_allclose(c[:, 2].max(), 1.75)
    # front face (+x) corners listed first
    assert np.allclose(c[0, 0], 12.0) and np.allclose(c[1, 0], 12.0)


def test_render_bev_marks_points_and_boxes():
    pc_range = (-20.0, -10.0, -5.0, 20.0, 10.0, 3.0)
    pts = np.asarray([[0.0, 0.0, 0.0, 0.0],   # lidar at center
                      [5.0, 5.0, 0.0, 1.0]])  # radar
    img = render_bev(pts, gt_boxes=np.asarray([[0, 0, 0, 4, 2, 1.5, 0.3]]),
                     pred_boxes=np.asarray([[5, -5, 0, 4, 2, 1.5, -0.3]]),
                     pred_labels=np.asarray([1]),
                     pc_range=pc_range, px_per_m=4.0, radar_flag_dim=3)
    assert img.shape == (80, 160, 3)
    assert img.sum() > 0
    # the lidar point at (0,0) lands at u=(0+20)*4, v=h-1-(0+10)*4 — grey or
    # overdrawn by the white GT box lines
    assert tuple(img[39, 80]) in {(120, 120, 120), (255, 255, 255)}
    # the radar point is orange
    assert tuple(img[80 - 1 - 60, 100]) == (0, 140, 255)


def test_draw_boxes_camera_draws_in_front_only():
    img = np.zeros((64, 96, 3), np.uint8)
    # body->camera: optical z forward = body x
    extr = np.eye(4)
    extr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    intr = np.array([[60.0, 0, 48], [0, 60.0, 32], [0, 0, 1]])
    front = np.asarray([[8.0, 0.0, 0.0, 2.0, 2.0, 1.5, 0.0]])
    behind = np.asarray([[-8.0, 0.0, 0.0, 2.0, 2.0, 1.5, 0.0]])
    out_front = draw_boxes_camera(img, front, extr, intr)
    out_behind = draw_boxes_camera(img, behind, extr, intr)
    assert out_front.sum() > 0
    assert out_behind.sum() == 0


def test_log_scene_3d_writes_ply_and_boxes(tmp_path):
    """The 3D scene artifact (wandb Object3D equivalent,
    mm_training_aim.py:379-404): an ASCII .ply point cloud + boxes json
    written offline per logged scene."""
    import json

    from mm_training_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), 'test', use_tensorboard=False)
    pts = np.concatenate([np.random.default_rng(0).uniform(-10, 10, (50, 3)),
                          np.random.default_rng(1).uniform(0, 1, (50, 1))], 1)
    gt = np.asarray([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 0, 0]])
    pred = np.asarray([[1.1, 2.1, 0.0, 4.0, 2.0, 1.5, 0.25, 0, 0]])
    lg.log_scene_3d(7, 'val_scene', pts, gt_boxes=gt, pred_boxes=pred,
                    pred_labels=np.asarray([2]))

    ply = tmp_path / 'scenes' / 'val_scene_0000007.ply'
    boxes = tmp_path / 'scenes' / 'val_scene_0000007_boxes.json'
    assert ply.is_file() and boxes.is_file()
    head = ply.read_text().splitlines()
    assert head[0] == 'ply' and 'element vertex 50' in head[2]
    assert len(head) == 10 + 50  # header + points
    scene = json.loads(boxes.read_text())
    assert len(scene['gt']) == 1 and len(scene['pred']) == 1
    assert scene['pred_labels'] == [2]

import numpy as np
from scipy.spatial.transform import Rotation

from mm_training_tpu.configs import Config, lidar_cam_radar, lidar_only, tiny_test_config
from mm_training_tpu.core.boxes import boxes_to_aabb_bev, corners_bev, points_in_boxes_mask
from mm_training_tpu.core.geometry import create_frustum, flat_bev_index, get_geometry, quantize_geometry
from mm_training_tpu.core.transforms import bda_transform, quat_to_yaw, yaw_to_quat

import jax.numpy as jnp


def test_config_derived_values_match_reference():
    """conf_aim.py:14,34-40 derived values."""
    c = Config()
    assert c.out_shape == (256, 2048)
    assert c.grid_size == (2048, 256, 1)
    assert c.feature_map_hw == (64, 512)
    assert c.bev_input_hw == (32, 256)
    assert c.lidar_input_channels == 8
    assert c.fuse_layer_in_channels == 256
    assert abs(c.learning_rate - 1e-3 / 64) < 1e-12
    bb = c.get_backbone_conf()
    assert bb.depth_channels == 409  # arange(2.0, 206.4, 0.5)
    assert bb.d_bound == (2.0, 206.4, 0.5)
    assert bb.feat_hw == (44, 80)
    assert bb.bev_hw == (32, 256)

    lc = lidar_cam_radar()
    assert lc.fuse_layer_in_channels == 336
    assert lc.learning_rate == 3e-4 / 64 * 4
    lo = lidar_only()
    assert lo.lidar_input_channels == 5
    assert lo.fuse_layer_in_channels == 256


def test_quat_yaw_roundtrip_matches_scipy():
    for yaw in np.linspace(-3.1, 3.1, 13):
        q = yaw_to_quat(yaw)
        sq = np.asarray(Rotation.from_euler('z', yaw).as_quat()).reshape(4)
        # q and -q are the same rotation; compare up to sign
        err = min(np.abs(q - sq).max(), np.abs(q + sq).max())
        assert err < 1e-9
        got = quat_to_yaw(*q)
        assert abs(got - yaw) < 1e-9
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        want = Rotation.from_quat(q).as_euler('xyz')[2]
        assert abs(quat_to_yaw(*q) - want) < 1e-9


def test_bda_transform_matches_reference_semantics():
    """aimotive_dataset.py:79-103."""
    boxes = np.array([[10.0, 2.0, 1.0, 4.0, 2.0, 1.5, 0.3, 1.0, -0.5]], np.float32)
    out, tr = bda_transform(boxes, rotate_angle_deg=90.0, scale_ratio=2.0,
                            flip_dx=False, flip_dy=False)
    np.testing.assert_allclose(out[0, :3], [-4.0, 20.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 3:6], [8.0, 4.0, 3.0], atol=1e-5)
    assert abs(out[0, 6] - (0.3 + np.pi / 2)) < 1e-6
    np.testing.assert_allclose(out[0, 7:9], [1.0, 2.0], atol=1e-5)  # rotated+scaled vel

    out2, _ = bda_transform(boxes, 0.0, 1.0, flip_dx=True, flip_dy=False)
    np.testing.assert_allclose(out2[0, :3], [-10.0, 2.0, 1.0], atol=1e-6)
    assert abs(out2[0, 6] - (np.pi - 0.3)) < 1e-6

    out3, _ = bda_transform(boxes, 0.0, 1.0, flip_dx=False, flip_dy=True)
    assert abs(out3[0, 6] - (-0.3)) < 1e-6


def test_boxes_utils():
    boxes = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, 0.0, 0, 0]])
    bev = corners_bev(boxes)
    assert bev.shape == (1, 4, 2)
    np.testing.assert_allclose(sorted(bev[0, :, 0].tolist()), [-2, -2, 2, 2])
    aabb = boxes_to_aabb_bev(boxes)
    np.testing.assert_allclose(aabb[0], [-2, -1, 2, 1])

    pts = np.array([[0.5, 0.5, 0.0], [3.0, 0.0, 0.0]])
    m = points_in_boxes_mask(pts, boxes)
    np.testing.assert_array_equal(m[0], [True, False])


def test_frustum_and_geometry():
    cfg = tiny_test_config(use_cam=True)
    bb = cfg.get_backbone_conf()
    fr = create_frustum(bb.d_bound, bb.final_dim, bb.downsample_factor)
    d = bb.depth_channels
    assert fr.shape == (d, 64 // 16, 128 // 16, 3)
    assert fr[0, 0, 0, 2] == 2.0 and abs(fr[1, 0, 0, 2] - 2.5) < 1e-6
    assert fr[0, 0, -1, 0] == 127.0 and fr[0, -1, 0, 1] == 63.0

    # identity-ish camera: sensor2ego = I, intrinsic = I => ego == (u*d, v*d, d)
    s2e = jnp.eye(4)[None, None]
    intr = jnp.eye(4)[None, None]
    geom = get_geometry(jnp.asarray(fr), s2e, intr)
    assert geom.shape == (1, 1, d, 4, 8, 3)
    np.testing.assert_allclose(np.asarray(geom[0, 0, 0, 0, 1]),
                               [fr[0, 0, 1, 0] * 2.0, 0.0, 2.0], atol=1e-4)

    idx = quantize_geometry(geom, (0.5, 0.5, 0.5), (1.0, 1.0, 1.0))
    flat = flat_bev_index(idx, (8, 8, 8))
    assert flat.shape == geom.shape[:-1]
    assert int(flat.max()) <= 64


def test_rig_row_independence_check():
    """The factorized-splat exactness predicate: true for the virtualized
    zero-roll/pitch rig, false once the camera pitches."""
    from scipy.spatial.transform import Rotation

    from mm_training_tpu.core.geometry import rig_is_row_independent

    k = np.eye(4)
    k[0, 0] = k[1, 1] = 500.0
    k[0, 2], k[1, 2] = 640.0, 352.0
    opt = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    for yaw in (0.0, 37.0, -120.0):
        rz = Rotation.from_euler('z', yaw, degrees=True).as_matrix()
        s2e = np.eye(4)
        s2e[:3, :3] = (opt @ rz.T).T  # sensor->ego = (ego->sensor)^T
        s2e[:3, 3] = [1.0, 0.2, 1.5]
        assert rig_is_row_independent(s2e[None], k[None])

    # 2 degrees of pitch breaks it
    pitch = Rotation.from_euler('y', 2.0, degrees=True).as_matrix()
    s2e_p = np.eye(4)
    s2e_p[:3, :3] = (opt @ pitch.T).T
    assert not rig_is_row_independent(s2e_p[None], k[None])

    # intrinsic skew breaks it too
    ks = k.copy()
    ks[0, 1] = 20.0
    s2e0 = np.eye(4)
    s2e0[:3, :3] = opt.T
    assert not rig_is_row_independent(s2e0[None], ks[None])


def test_quantize_truncates_toward_zero_like_torch_int():
    """torch .int() parity (lss_fpn.py:461-462): coordinates up to one
    voxel BELOW the grid minimum truncate to edge voxel 0 and pass the
    range mask in the reference; floor would send them to -1 / the trash
    bin, changing edge-voxel BEV features."""
    pts = jnp.asarray([[-0.5, 0.2, 0.2], [0.5, 0.2, 0.2], [-1.5, 0.2, 0.2]])
    # voxel_coord (center of voxel 0) = 0.5, voxel_size = 1 -> grid min = 0
    idx = np.asarray(quantize_geometry(pts, (0.5, 0.5, 0.5), (1.0, 1.0, 1.0)))
    assert idx[0, 0] == 0    # in (-1, 0): trunc keeps it in edge voxel 0
    assert idx[1, 0] == 0
    assert idx[2, 0] == -1   # more than one voxel below: still dropped


def test_multisweep_channels_are_per_sweep():
    """LSSFPN's output_channels is the PER-SWEEP context width; the sweep
    BEVs concat on channels, so passing the post-concat total would build a
    num_sweeps^2-wide camera BEV that silently disagrees with the fuse/head
    widths."""
    cfg = tiny_test_config(use_cam=True, num_sweeps=2)
    assert cfg.get_backbone_conf().output_channels == 80
    assert cfg.camera_feature_channels == 160       # post-concat total
    assert cfg.fuse_layer_in_channels == 160 + cfg.lidar_feature_channels


def test_out_shape_rounds_inexact_extents():
    """Non-binary extents divide inexactly in float (30.0/0.2 = 149.99...);
    truncation would drop a BEV row."""
    cfg = tiny_test_config(point_cloud_range=(-15.0, -15.0, -5, 15.0, 15.0, 3),
                           voxel_size=(0.2, 0.2, 8))
    assert cfg.out_shape == (150, 150)

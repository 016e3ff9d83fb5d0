import jax.numpy as jnp
import numpy as np

from mm_training_tpu.ops import depth_labels_single_cam


def _reference(points, mask, extrinsic, intrinsic, img_hw, ds, d_bound, nbins):
    """Reference semantics (mm_training_aim.py:142-215), with the documented
    same-pixel tie-break deviation avoided by using distinct pixels."""
    h, w = img_hw
    depth_map = np.zeros((h, w), np.float32)
    pts = np.concatenate([points[:, :3], np.ones((len(points), 1))], -1).T
    cam = extrinsic @ pts
    depths = cam[2]
    proj = intrinsic @ cam
    proj = proj / proj[2:3]
    m = mask & (depths > 1.0) & (proj[0] > 1) & (proj[0] < w - 1) \
        & (proj[1] > 1) & (proj[1] < h - 1)
    px = proj[0, m].astype(np.int64)
    py = proj[1, m].astype(np.int64)
    depth_map[py, px] = depths[m]

    fh, fw = h // ds, w // ds
    gt = depth_map.reshape(fh, ds, fw, ds).transpose(0, 2, 1, 3).reshape(fh, fw, -1)
    gt = np.where(gt == 0.0, 1e5, gt).min(-1)
    d0, _, step = d_bound
    idx = (gt - (d0 - step)) / step
    idx = np.where((idx < nbins) & (idx >= 0.0), idx, 0.0).astype(np.int64)
    out = np.zeros((fh, fw, nbins), np.float32)
    for i in range(fh):
        for j in range(fw):
            out[i, j, idx[i, j]] = 1.0
    return out


def test_depth_labels_match_reference():
    rng = np.random.default_rng(0)
    h, w, ds = 32, 64, 16
    d_bound = (2.0, 27.2, 0.5)
    nbins = int(round((d_bound[1] - d_bound[0]) / d_bound[2]))

    n = 200
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(0.5, 30, n)     # forward
    pts[:, 1] = rng.uniform(-8, 8, n)
    pts[:, 2] = rng.uniform(-2, 2, n)
    mask = rng.random(n) > 0.1

    # body->cam: x-forward body to z-forward optical
    extrinsic = np.array([[0, -1, 0, 0],
                          [0, 0, -1, 0],
                          [1, 0, 0, 0],
                          [0, 0, 0, 1]], np.float32)
    intrinsic = np.array([[40.0, 0, 32, 0],
                          [0, 40.0, 16, 0],
                          [0, 0, 1, 0],
                          [0, 0, 0, 1]], np.float32)

    got = np.asarray(depth_labels_single_cam(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(extrinsic),
        jnp.asarray(intrinsic), (h, w), ds, d_bound, nbins))
    want = _reference(pts, mask, extrinsic, intrinsic, (h, w), ds, d_bound, nbins)

    # min-over-window may pick a different point only when two valid points
    # share one full-res pixel; the rng above makes that measure-zero.
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_empty_cells_one_hot_bin_zero():
    """Reproduce the reference quirk: empty cells one-hot bin 0 (so the
    foreground mask max(labels)>0 is all-true, mm_training_aim.py:200-216)."""
    pts = np.zeros((4, 4), np.float32)
    mask = np.zeros(4, bool)
    got = np.asarray(depth_labels_single_cam(
        jnp.asarray(pts), jnp.asarray(mask), jnp.eye(4), jnp.eye(4),
        (32, 32), 16, (2.0, 10.0, 0.5), 16))
    assert got.shape == (2, 2, 16)
    assert np.all(got[..., 0] == 1.0)
    assert np.all(got[..., 1:] == 0.0)

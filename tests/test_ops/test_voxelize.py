import jax.numpy as jnp
import numpy as np

from mm_training_tpu.ops import voxelize_pillars_dense

PC_RANGE = (-4.0, -2.0, -5.0, 4.0, 2.0, 3.0)
VOXEL = (1.0, 1.0, 8.0)
GRID = (4, 8)  # (ny, nx)


def _reference(points, mask, cap=None):
    ny, nx = GRID
    sums = np.zeros((ny, nx, 5), np.float32)
    cnts = np.zeros((ny, nx), np.float32)
    for p, m in zip(points, mask):
        if not m:
            continue
        xi = int(np.floor((p[0] - PC_RANGE[0]) / VOXEL[0]))
        yi = int(np.floor((p[1] - PC_RANGE[1]) / VOXEL[1]))
        zi = int(np.floor((p[2] - PC_RANGE[2]) / VOXEL[2]))
        if not (0 <= xi < nx and 0 <= yi < ny and zi == 0):
            continue
        if cap is not None and cnts[yi, xi] >= cap:
            continue
        sums[yi, xi] += p[:5]
        cnts[yi, xi] += 1
    return sums / np.maximum(cnts[..., None], 1.0)


def _random_points(n=300, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 8), np.float32)
    pts[:, 0] = rng.uniform(-5, 5, n)
    pts[:, 1] = rng.uniform(-3, 3, n)
    pts[:, 2] = rng.uniform(-6, 4, n)
    pts[:, 3:] = rng.normal(size=(n, 5))
    mask = rng.random(n) > 0.1
    return pts, mask


def test_mean_vfe_matches_loop():
    pts, mask = _random_points()
    got = np.asarray(voxelize_pillars_dense(
        jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOXEL, GRID))
    np.testing.assert_allclose(got, _reference(pts, mask), rtol=1e-4, atol=1e-5)


def test_capped_vfe_matches_first_k_in_order():
    """max_points_per_voxel reproduces mmdet3d's first-K-in-point-order
    subsampling exactly."""
    pts, mask = _random_points(seed=3)
    got = np.asarray(voxelize_pillars_dense(
        jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOXEL, GRID,
        max_points_per_voxel=3))
    np.testing.assert_allclose(got, _reference(pts, mask, cap=3),
                               rtol=1e-4, atol=1e-5)


def test_empty_cloud_is_all_zero():
    pts = np.zeros((10, 8), np.float32)
    mask = np.zeros(10, bool)
    got = np.asarray(voxelize_pillars_dense(
        jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOXEL, GRID))
    assert np.all(got == 0)

"""Native point-packer: C++ path vs numpy fallback parity + determinism."""
import numpy as np
import pytest

from mm_training_tpu.data import native


def _inputs(n_lidar=5000, n_radar=100, seed=0):
    rng = np.random.default_rng(seed)
    lidar = np.concatenate([
        rng.uniform(-250, 250, (n_lidar, 2)), rng.uniform(-3, 3, (n_lidar, 1)),
        rng.uniform(0, 255, (n_lidar, 1)), rng.uniform(1000, 1001, (n_lidar, 1)),
    ], axis=1).astype(np.float32)
    radar = np.concatenate([
        rng.uniform(-250, 250, (n_radar, 2)), rng.uniform(-3, 3, (n_radar, 1)),
        rng.uniform(-30, 30, (n_radar, 1)), rng.uniform(0, 40, (n_radar, 1)),
    ], axis=1).astype(np.float32)
    return lidar, radar


PC_RANGE = (-204.8, -25.6, -5.0, 204.8, 25.6, 3.0)


def test_native_builds():
    assert native.native_available(), 'g++ build of pointpack.cpp failed'


def test_concat_filter_matches_numpy():
    lidar, radar = _inputs()
    got = native.concat_filter_native(lidar, radar, PC_RANGE, 1000.5)

    # numpy fallback executed directly
    lib = native._LIB
    native._LIB, native._TRIED = None, True
    try:
        want = native.concat_filter_native(lidar, radar, PC_RANGE, 1000.5)
    finally:
        native._LIB, native._TRIED = lib, True

    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape[1] == 8
    # radar rows lead and carry the is_radar flag
    n_rad = int((got[:, 3] == 1).sum())
    assert np.all(got[:n_rad, 3] == 1)


def test_pack_points_semantics():
    lidar, radar = _inputs()
    pts = native.concat_filter_native(lidar, radar, PC_RANGE, 1000.5)
    bda = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    cap = pts.shape[0] + 100  # no subsample: deterministic row order
    out, mask, cam_ts = native.pack_points_native(pts, bda, 1000.5, cap, 7)
    k = int(mask.sum())
    assert k == pts.shape[0]
    # ts normalized to [0, 1]
    assert out[:k, -1].min() >= 0 and out[:k, -1].max() <= 1.0
    assert 0.0 <= cam_ts <= 1.0
    # intensity scaled /255
    assert out[:k, -2].max() <= 1.0 + 1e-6
    # bda rotation applied: 90 deg z-rotation maps (x, y) -> (-y, x)
    np.testing.assert_allclose(out[:k, 0], -pts[:, 1], rtol=1e-5)
    np.testing.assert_allclose(out[:k, 1], pts[:, 0], rtol=1e-5)
    # padding zeroed
    assert np.all(out[k:] == 0) and not mask[k:].any()


def test_pack_points_subsample_deterministic():
    lidar, radar = _inputs(n_lidar=20000)
    pts = native.concat_filter_native(lidar, radar, PC_RANGE, 1000.5)
    cap = 1000
    o1, m1, _ = native.pack_points_native(pts.copy(), None, 1000.5, cap, 42)
    o2, m2, _ = native.pack_points_native(pts.copy(), None, 1000.5, cap, 42)
    np.testing.assert_array_equal(o1, o2)
    assert m1.sum() == cap
    o3, _, _ = native.pack_points_native(pts.copy(), None, 1000.5, cap, 43)
    assert not np.allclose(o1, o3)  # different seed, different subsample


def test_pack_points_does_not_mutate_caller_array():
    """The C subsampler Fisher-Yates-swaps rows of its input buffer; the
    wrapper must hand it a copy so the caller's array survives and repeat
    calls with the same seed return identical subsamples (no .copy()
    workaround needed)."""
    lidar, radar = _inputs(n_lidar=20000)
    pts = native.concat_filter_native(lidar, radar, PC_RANGE, 1000.5)
    before = pts.copy()
    cap = 1000
    o1, _, _ = native.pack_points_native(pts, None, 1000.5, cap, 42)
    np.testing.assert_array_equal(pts, before)  # caller array untouched
    o2, _, _ = native.pack_points_native(pts, None, 1000.5, cap, 42)
    np.testing.assert_array_equal(o1, o2)       # same seed, same subsample


def test_pack_points_accepts_noncontiguous_float64_bda():
    """The bda pointer must stay alive for the native call: a float64 (or
    non-contiguous) bda forces an ascontiguousarray temporary whose address
    would dangle if not referenced (use-after-free -> garbage rotation)."""
    lidar, radar = _inputs(n_lidar=50)
    pts = native.concat_filter_native(lidar, radar, PC_RANGE, 1000.5)
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    rot90 = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
    out64, mask, _ = native.pack_points_native(pts, rot90, 1000.5, 4096, 7)
    out32, _, _ = native.pack_points_native(pts, rot90.astype(np.float32),
                                            1000.5, 4096, 7)
    k = int(mask.sum())
    assert k == len(pts)
    np.testing.assert_allclose(out64[:k, 0], -pts[:, 1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out64, out32, rtol=1e-6)

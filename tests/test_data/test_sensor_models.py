"""Sensor-model tests: image2ray/ray2image round trips for every camera
model, serialization round trip, and remap identity — the reference only had
a manual check script (utils/sensor_models/readback_check.py)."""
import json

import numpy as np
import pytest

from mm_training_tpu.data.sensor_models.cameras import (CameraEquirect,
                                                        CameraMei,
                                                        CameraPinhole,
                                                        CameraPinholeDistorted,
                                                        make_from_dict)

K = np.array([[120.0, 0, 80.0], [0, 118.0, 60.0], [0, 0, 1.0]])
SIZE = (120, 160)


def _models():
    yield CameraPinhole(K, SIZE)
    yield CameraPinholeDistorted(K, np.array([-0.1, 0.02, 1e-3, -1e-3, 0.0]),
                                 SIZE)
    yield CameraMei(K, 0.8, np.array([-0.05, 0.01, 0.0, 0.0, 0.0]), SIZE)
    yield CameraEquirect(SIZE)


@pytest.mark.parametrize('model', list(_models()),
                         ids=lambda m: type(m).__name__)
def test_round_trip(model):
    """ray2image(image2ray(px)) == px. Rays are direction vectors (not
    necessarily unit — pinhole variants use the z=1 plane); normalizing
    them must not change the projection. ray2image's second return is the
    INVALID mask."""
    rng = np.random.default_rng(0)
    # central region — distortion inverses are iterative and extreme corners
    # of a synthetic fisheye may not converge
    px = np.stack([rng.uniform(SIZE[1] * 0.25, SIZE[1] * 0.75, 200),
                   rng.uniform(SIZE[0] * 0.25, SIZE[0] * 0.75, 200)], -1)
    rays = model.image2ray(px)
    px2, invalid = model.ray2image(rays)
    ok = ~np.asarray(invalid, bool)
    assert ok.mean() > 0.95
    np.testing.assert_allclose(px2[ok], px[ok], atol=0.05)
    # scale invariance: projections depend on direction only
    px3, _ = model.ray2image(rays * 2.5)
    np.testing.assert_allclose(px3[ok], px2[ok], atol=1e-6)


@pytest.mark.parametrize('model', list(_models()),
                         ids=lambda m: type(m).__name__)
def test_serialization_round_trip(model):
    d = json.loads(json.dumps(model.save_to_dict()))
    m2 = make_from_dict(d)
    assert type(m2) is type(model)
    px = np.asarray([[70.0, 55.0], [90.0, 66.0]])
    np.testing.assert_allclose(model.image2ray(px), m2.image2ray(px),
                               atol=1e-9)


def test_remap_identity():
    cam = CameraPinhole(K, SIZE)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, SIZE + (3,), np.uint8)
    out = cam.remap_from(cam, img)
    # identical geometry: interior pixels survive the resample unchanged
    inner = (slice(10, -10), slice(10, -10))
    diff = np.abs(out[inner].astype(int) - img[inner].astype(int))
    assert np.median(diff) <= 1


def test_pinhole_to_rotated_pinhole_shifts_content():
    """A yawed target camera must sample different source content."""
    from scipy.spatial.transform import Rotation
    src = CameraPinhole(K, SIZE)
    rot = Rotation.from_euler('y', 10, degrees=True).as_matrix()
    dst = CameraPinhole(K, SIZE, rotation=rot)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, SIZE + (3,), np.uint8)
    out = dst.remap_from(src, img)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_remap_cache_thread_safe_under_eviction():
    """Regression: the bounded LRU remap cache is hit from the loader's
    thread pool; with more live (target, source) pairs than the cache cap,
    a hit's move_to_end used to race another thread's eviction popitem of
    the same key (KeyError). Hammer it well past the cap from 8 threads."""
    from concurrent.futures import ThreadPoolExecutor
    from mm_training_tpu.data.sensor_models.cameras import CameraModel

    size = (12, 16)
    img = np.zeros(size + (3,), np.uint8)
    # > _REMAP_CACHE_MAX distinct fingerprints so evictions are constant
    n_cams = CameraModel._REMAP_CACHE_MAX + 16
    cams = [CameraPinhole(K * (1 + 0.01 * i), size) for i in range(n_cams)]
    CameraModel._remap_cache.clear()

    def worker(seed):
        rng = np.random.default_rng(seed)
        for _ in range(60):
            cam = cams[int(rng.integers(n_cams))]
            cam.remap_from(cam, img)
        return True

    with ThreadPoolExecutor(max_workers=8) as pool:
        assert all(pool.map(worker, range(16)))
    assert len(CameraModel._remap_cache) <= CameraModel._REMAP_CACHE_MAX


def test_remap_inflight_dedup_computes_once(monkeypatch):
    """Concurrent cache misses on the SAME (target, source) key must not
    each recompute the full-grid ray remap: the first thread computes, the
    rest wait on its in-flight event (loader warm-up fans many frames of
    one rig across the pool at once)."""
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    from mm_training_tpu.data.sensor_models.cameras import CameraModel

    size = (12, 16)
    img = np.zeros(size + (3,), np.uint8)
    cam = CameraPinhole(K, size)
    CameraModel._remap_cache.clear()

    calls = []
    lock = threading.Lock()
    orig = CameraPinhole.ray2image

    def counting(self, rays):
        with lock:
            calls.append(threading.get_ident())
        time.sleep(0.05)  # widen the miss window so threads overlap
        return orig(self, rays)

    monkeypatch.setattr(CameraPinhole, 'ray2image', counting)
    start = threading.Barrier(8)

    def worker(_):
        start.wait()
        return cam.remap_from(cam, img).shape

    with ThreadPoolExecutor(max_workers=8) as pool:
        shapes = list(pool.map(worker, range(8)))
    assert all(s == shapes[0] for s in shapes)
    assert len(calls) == 1, f'remap computed {len(calls)}x for one key'

"""Native LAS/LAZ codec (data/lasio.py + csrc/lasio.cpp).

The reference reads aiMotive lidar frames with laspy
(dataset/src/loaders/lidar_loader.py:86-91); the TPU framework decodes
LAZ natively. No LAZ tooling exists in this environment, so the LASzip
layer is validated by exhaustive encode/decode roundtrips (chunk
boundaries, adversarial value patterns, every GPS-time code path) plus a
writer-independent check of the uncompressed LAS container against the
public LAS 1.2 byte layout. A laspy cross-check runs when laspy is
installed (skipped in this image).
"""
import os
import struct

import numpy as np
import pytest

from mm_training_tpu.data import lasio, loaders

pytestmark = pytest.mark.skipif(
    not lasio.lasio_available(), reason='g++ build of lasio.cpp failed')


def _cloud(n, seed=0, t0=3600.0):
    """Realistic-ish lidar frame: gamma ranges, sorted gps, u8 intensity."""
    rng = np.random.default_rng(seed)
    az = rng.uniform(-np.pi, np.pi, n)
    r = rng.gamma(3.0, 15.0, n)
    return np.stack([r * np.cos(az), r * np.sin(az), rng.normal(0, 3, n),
                     rng.integers(0, 256, n).astype(float),
                     np.sort(rng.uniform(0, 0.1, n)) + t0], axis=1)


def _quantized(pts, scale=1e-3, offset=(0.0, 0.0, 0.0)):
    exp = pts.copy()
    exp[:, :3] = (np.round((pts[:, :3] - offset) / scale) * scale + offset)
    exp[:, 3] = np.clip(np.round(pts[:, 3]), 0, 65535)
    return exp


def _roundtrip(tmp_path, pts, compress, chunk_size=50000, offset=(0, 0, 0)):
    path = str(tmp_path / ('t.laz' if compress else 't.las'))
    n = lasio.write_las(path, pts, offset=offset, compress=compress,
                        chunk_size=chunk_size)
    assert n == len(pts)
    back = lasio.read_las(path)
    exp = _quantized(pts, offset=np.asarray(offset, float))
    np.testing.assert_allclose(back[:, :3], exp[:, :3], atol=1e-9)
    np.testing.assert_array_equal(back[:, 3], exp[:, 3])
    np.testing.assert_array_equal(back[:, 4], pts[:, 4])
    return path


# ------------------------------------------------------------ LAS container

def test_las_uncompressed_roundtrip(tmp_path):
    _roundtrip(tmp_path, _cloud(5000), compress=False)


def test_las_header_layout_is_spec_exact(tmp_path):
    """Writer-independent: parse the produced file with struct against the
    published LAS 1.2 field offsets."""
    pts = _cloud(100)
    path = _roundtrip(tmp_path, pts, compress=False)
    raw = open(path, 'rb').read()
    assert raw[:4] == b'LASF'
    assert raw[24] == 1 and raw[25] == 2          # version 1.2
    header_size = struct.unpack('<H', raw[94:96])[0]
    assert header_size == 227
    otp = struct.unpack('<I', raw[96:100])[0]
    fmt = raw[104]
    rec_len = struct.unpack('<H', raw[105:107])[0]
    npts = struct.unpack('<I', raw[107:111])[0]
    assert fmt == 1 and rec_len == 28 and npts == 100
    scale = struct.unpack('<3d', raw[131:155])
    assert scale == (1e-3, 1e-3, 1e-3)
    # record 0 decodes to the first (quantized) point
    x, y, z, inten = struct.unpack('<iiiH', raw[otp:otp + 14])
    gps = struct.unpack('<d', raw[otp + 20:otp + 28])[0]
    exp = _quantized(pts)
    assert abs(x * 1e-3 - exp[0, 0]) < 1e-9
    assert abs(y * 1e-3 - exp[0, 1]) < 1e-9
    assert abs(z * 1e-3 - exp[0, 2]) < 1e-9
    assert inten == exp[0, 3] and gps == pts[0, 4]


def test_reader_handles_foreign_uncompressed_file(tmp_path):
    """Reader vs a LAS 1.2 format-1 file crafted byte-by-byte with struct
    (independent of our writer)."""
    n = 7
    recs = [(i * 1000, -i * 2000, i * 10, i * 7, 100.5 + i) for i in range(n)]
    hdr = bytearray(227)
    hdr[0:4] = b'LASF'
    hdr[24] = 1
    hdr[25] = 2
    hdr[94:96] = struct.pack('<H', 227)
    hdr[96:100] = struct.pack('<I', 227)
    hdr[100:104] = struct.pack('<I', 0)
    hdr[104] = 1
    hdr[105:107] = struct.pack('<H', 28)
    hdr[107:111] = struct.pack('<I', n)
    hdr[131:155] = struct.pack('<3d', 0.01, 0.01, 0.01)
    hdr[155:179] = struct.pack('<3d', 10.0, 20.0, 30.0)
    body = b''.join(
        struct.pack('<iiiHBBbBH', x, y, z, inten, 0x09, 0, 0, 0, 0)
        + struct.pack('<d', gps) for x, y, z, inten, gps in recs)
    path = str(tmp_path / 'foreign.las')
    with open(path, 'wb') as f:
        f.write(bytes(hdr) + body)
    back = lasio.read_las(path)
    for i, (x, y, z, inten, gps) in enumerate(recs):
        np.testing.assert_allclose(
            back[i], [x * 0.01 + 10, y * 0.01 + 20, z * 0.01 + 30, inten, gps])


def test_las_info(tmp_path):
    path = _roundtrip(tmp_path, _cloud(321), compress=True)
    info = lasio.las_info(path)
    assert info['npoints'] == 321
    assert info['compressed'] and info['has_gps']
    assert info['point_format'] == 1 and info['record_length'] == 28


# ---------------------------------------------------------------- LAZ codec

@pytest.mark.parametrize('n', [1, 2, 100, 4999, 5000, 5001, 12345])
def test_laz_roundtrip_chunk_boundaries(tmp_path, n):
    _roundtrip(tmp_path, _cloud(n), compress=True, chunk_size=5000)


def test_laz_roundtrip_multichunk_large(tmp_path):
    _roundtrip(tmp_path, _cloud(60000, seed=3), compress=True, chunk_size=1000)


def test_laz_empty(tmp_path):
    path = str(tmp_path / 't.laz')
    assert lasio.write_las(path, np.zeros((0, 5)), compress=True) == 0
    assert lasio.read_las(path).shape == (0, 5)


def test_laz_constant_and_duplicate_points(tmp_path):
    pts = np.tile([[12.5, -3.25, 1.0, 77.0, 3600.0]], (5000, 1))
    _roundtrip(tmp_path, pts, compress=True, chunk_size=1000)


def test_laz_mostly_constant_with_bursts(tmp_path):
    """Regression: constant runs with sparse random bursts. Caught the
    changed_values==0 intensity-state quirk (the codec must zero the raw
    first point's intensity in its prediction state) and fractional
    intensity rounding."""
    rng = np.random.default_rng(3)
    n = 4000
    pts = np.tile([[5.0, 6.0, 7.0, 100.0, 999.0]], (n, 1))
    idx = rng.integers(0, n, n // 20 + 1)
    pts[idx] += rng.normal(0, 100, (len(idx), 5))
    pts[:, 3] = np.clip(np.abs(pts[:, 3]), 0, 65535)
    _roundtrip(tmp_path, pts, compress=True, chunk_size=1000)


def test_laz_extreme_coordinates(tmp_path):
    """Correctors spanning the full i32 range (k up to 32)."""
    rng = np.random.default_rng(7)
    n = 20000
    pts = np.stack([
        rng.integers(-2**31, 2**31, n).astype(float),
        rng.integers(-2**31, 2**31, n).astype(float),
        rng.integers(-2**31, 2**31, n).astype(float),
        rng.integers(0, 65536, n).astype(float),
        rng.uniform(0, 1e9, n)], axis=1)
    # scale 1.0 so the raw ints are the coordinates themselves
    path = str(tmp_path / 't.laz')
    lasio.write_las(path, pts, scale=(1, 1, 1), offset=(0, 0, 0),
                    compress=True, chunk_size=4096)
    back = lasio.read_las(path)
    exp = pts.copy()
    exp[:, :3] = np.round(pts[:, :3])
    np.testing.assert_array_equal(back[:, :3], exp[:, :3])
    np.testing.assert_array_equal(back[:, 3], np.round(pts[:, 3]))
    np.testing.assert_array_equal(back[:, 4], pts[:, 4])


def test_laz_gps_time_code_paths(tmp_path):
    """Exercise every GPSTIME11 branch: constant time, smooth diffs,
    multiplier jumps (positive/negative/extreme), 64-bit resets, and four
    interleaved time sequences (multi-return-style streams)."""
    rng = np.random.default_rng(11)
    segs = [
        np.full(500, 1000.0),                          # unchanged
        1000.0 + np.arange(500) * 1e-6,                # constant diff
        1000.0 + np.cumsum(rng.integers(1, 8, 500)) * 1e-6,   # small multis
        1000.0 - np.cumsum(rng.integers(1, 12, 500)) * 1e-6,  # negative
        rng.uniform(0, 1e9, 500),                      # full 64-bit resets
    ]
    # four interleaved sequences: the codec should switch, not reset
    base = np.arange(500) * 1e-5
    inter = np.stack([1e6 + base, 2e6 + base, 3e6 + base, 4e6 + base],
                     axis=1).reshape(-1)
    gps = np.concatenate(segs + [inter])
    n = len(gps)
    pts = _cloud(n, seed=2)
    pts[:, 4] = gps
    _roundtrip(tmp_path, pts, compress=True, chunk_size=2048)


def test_laz_out_of_range_rejected(tmp_path):
    pts = np.array([[1e10, 0, 0, 0, 0.0]])
    with pytest.raises(RuntimeError, match='int32 range'):
        lasio.write_las(str(tmp_path / 't.laz'), pts, scale=(1e-3,) * 3,
                        offset=(0, 0, 0))


def test_laz_compresses(tmp_path):
    pts = _cloud(30000, seed=5)
    laz = _roundtrip(tmp_path, pts, compress=True)
    las = _roundtrip(tmp_path, pts, compress=False)
    assert os.path.getsize(laz) < 0.55 * os.path.getsize(las)


# ------------------------------------------------------------- integrations

def test_read_lidar_uses_native_laz(tmp_path):
    pts = _cloud(2000, seed=9)
    path = str(tmp_path / 'frame_0000001.laz')
    lasio.write_las(path, pts)
    got = loaders.read_lidar(path)
    assert got.dtype == np.float32 and got.shape == (2000, 5)
    exp = _quantized(pts, offset=np.round(pts[:, :3].mean(axis=0)))
    np.testing.assert_allclose(got[:, :3], exp[:, :3].astype(np.float32),
                               atol=1e-4)


def test_synthetic_dataset_laz_frames(tmp_path):
    """generate_synthetic_dataset(lidar_format='laz') writes real LAZ and
    load_lidar_data aggregates them exactly like the .npy path."""
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    root_laz = str(tmp_path / 'laz')
    root_npy = str(tmp_path / 'npy')
    for root, fmt in ((root_laz, 'laz'), (root_npy, 'npy')):
        generate_synthetic_dataset(
            root, splits=('train',), frames_per_sequence=3, n_objects=2,
            write_images=False, seed=123, lidar_format=fmt,
            n_ground_points=2000)
    seq_laz = os.path.join(root_laz, 'train', 'highway', 'seq000')
    seq_npy = os.path.join(root_npy, 'train', 'highway', 'seq000')
    pc_laz = loaders.load_lidar_data(seq_laz, '0000002', look_back=1,
                                     look_forward=1)
    pc_npy = loaders.load_lidar_data(seq_npy, '0000002', look_back=1,
                                     look_forward=1)
    assert pc_laz.shape == pc_npy.shape
    # identical modulo the 1mm LAZ quantization grid
    np.testing.assert_allclose(pc_laz[:, :3], pc_npy[:, :3], atol=2e-3)
    np.testing.assert_allclose(pc_laz[:, 4], pc_npy[:, 4], atol=1e-6)


@pytest.mark.skipif(
    not pytest.importorskip('importlib').util.find_spec('laspy'),
    reason='laspy not installed (expected in the TPU image)')
def test_laz_cross_check_against_laspy(tmp_path):
    """When laspy IS available (not in this image), our .laz must decode
    identically through it — the external-interop check."""
    import laspy
    pts = _cloud(20000, seed=13)
    path = _roundtrip(tmp_path, pts, compress=True, chunk_size=3000)
    with laspy.open(path) as fh:
        las = fh.read()
    exp = _quantized(pts)
    np.testing.assert_allclose(np.asarray(las.x), exp[:, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(las.y), exp[:, 1], atol=1e-9)
    np.testing.assert_allclose(np.asarray(las.z), exp[:, 2], atol=1e-9)
    np.testing.assert_array_equal(np.asarray(las.intensity), exp[:, 3])
    np.testing.assert_array_equal(np.asarray(las.gps_time), pts[:, 4])

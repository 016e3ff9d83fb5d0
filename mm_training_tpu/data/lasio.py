"""ctypes bindings for the native LAS/LAZ codec (csrc/lasio.cpp).

The aiMotive dataset stores lidar as LASzip-compressed ``.laz`` frames;
the reference reads them through laspy (dataset/src/loaders/
lidar_loader.py:86-91). laspy is not in the TPU image, so this module
provides a dependency-free native path:

  * ``read_las(path) -> [N, 5] float64`` (x, y, z, intensity, gps_time)
  * ``write_las(path, pts, scale=..., compress=...)`` — LAS 1.2 point
    format 1, optionally LASzip-compressed (used by tests/fixtures)
  * ``las_info(path)`` — header summary dict

Builds csrc/lasio.cpp with g++ on first use (atomic-rename cache, same
scheme as data/native.py). ``lasio_available()`` reports whether the
native path is active; loaders.read_lidar falls back to laspy (if
installed) and then to ``.npy`` fixtures when it is not.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ['lasio_available', 'read_las', 'write_las', 'las_info']

_SRC = os.path.join(os.path.dirname(__file__), 'csrc', 'lasio.cpp')
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ERRORS = {
    -1: 'cannot open or read file',
    -2: 'bad LAS magic or truncated header',
    -3: 'unsupported LAS point data format',
    -4: 'unsupported LASzip variant (need chunked coder-0 v2 '
        'POINT10/GPSTIME11/BYTE items)',
    -5: 'corrupt or truncated point stream / chunk table',
    -6: 'output buffer smaller than the point count',
    -7: 'write failed',
    -8: 'coordinates out of int32 range for the chosen scale',
}


def _build_and_load() -> Optional[ctypes.CDLL]:
    so_path = os.path.join(os.path.dirname(_SRC), 'lasio.so')

    def build() -> None:
        tmp = f'{so_path}.{os.getpid()}.tmp'
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)

    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            build()
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            build()  # stale/foreign-arch .so — rebuild once
            lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.CalledProcessError):
        return None

    f64p = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
    lib.las_info.restype = ctypes.c_int
    lib.las_info.argtypes = [ctypes.c_char_p, f64p]
    lib.las_read_points.restype = ctypes.c_longlong
    lib.las_read_points.argtypes = [ctypes.c_char_p, f64p, ctypes.c_longlong]
    lib.las_write_points.restype = ctypes.c_longlong
    lib.las_write_points.argtypes = [
        ctypes.c_char_p, f64p, ctypes.c_longlong,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_uint]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def lasio_available() -> bool:
    return _lib() is not None


def _check(rc: int, path: str) -> int:
    if rc < 0:
        raise RuntimeError(
            f'lasio: {_ERRORS.get(rc, f"error {rc}")} ({path})')
    return rc


def las_info(path: str) -> dict:
    lib = _lib()
    if lib is None:
        raise RuntimeError('native lasio unavailable (no compiler?)')
    out = np.zeros(11, np.float64)
    _check(lib.las_info(path.encode(), out), path)
    return {
        'npoints': int(out[0]),
        'point_format': int(out[1]),
        'compressed': bool(out[2]),
        'scale': tuple(out[3:6]),
        'offset': tuple(out[6:9]),
        'has_gps': bool(out[9]),
        'record_length': int(out[10]),
    }


def read_las(path: str) -> np.ndarray:
    """Read a .las/.laz file -> [N, 5] float64 (x, y, z, intensity, gps)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError('native lasio unavailable (no compiler?)')
    n = int(las_info(path)['npoints'])
    out = np.empty((n, 5), np.float64)
    got = _check(int(lib.las_read_points(path.encode(), out, n)), path)
    return out[:got]


def write_las(path: str, pts: np.ndarray, scale=(1e-3, 1e-3, 1e-3),
              offset=None, compress: Optional[bool] = None,
              chunk_size: int = 50000) -> int:
    """Write [N, >=3] points (cols x, y, z[, intensity[, gps_time]]) as
    LAS 1.2 point format 1. ``compress`` defaults to the file extension
    (.laz -> True). Coordinates are quantized to the scale grid."""
    pts = np.asarray(pts, np.float64)
    if pts.ndim != 2 or pts.shape[1] < 3:
        raise ValueError('pts must be [N, >=3]')
    full = np.zeros((pts.shape[0], 5), np.float64)
    full[:, :pts.shape[1]] = pts[:, :5]
    if offset is None:
        # center the data so the i32 grid is used symmetrically
        offset = (np.round(full[:, :3].mean(axis=0))
                  if len(full) else np.zeros(3))
    if compress is None:
        compress = path.endswith('.laz')
    lib = _lib()
    if lib is None:
        raise RuntimeError('native lasio unavailable (no compiler?)')
    rc = int(lib.las_write_points(
        path.encode(), np.ascontiguousarray(full), full.shape[0],
        float(scale[0]), float(scale[1]), float(scale[2]),
        float(offset[0]), float(offset[1]), float(offset[2]),
        int(bool(compress)), int(chunk_size)))
    return _check(rc, path)


def main():
    """CLI: inspect / convert / micro-bench LAS-LAZ files.

    python -m mm_training_tpu.data.lasio info  frame.laz
    python -m mm_training_tpu.data.lasio convert frame.laz frame.npy
    python -m mm_training_tpu.data.lasio convert frame.npy frame.laz
    python -m mm_training_tpu.data.lasio bench frame.laz [iters]
    """
    import json
    import sys
    import time

    if len(sys.argv) < 3 or sys.argv[1] not in ('info', 'convert', 'bench'):
        print(main.__doc__)
        raise SystemExit(2)
    cmd, src = sys.argv[1], sys.argv[2]
    if cmd == 'info':
        print(json.dumps(las_info(src)))
    elif cmd == 'convert':
        dst = sys.argv[3]
        pts = (np.load(src).astype(np.float64) if src.endswith('.npy')
               else read_las(src))
        if dst.endswith('.npy'):
            np.save(dst, pts.astype(np.float32))
        else:
            write_las(dst, pts)
        print(f'{src} -> {dst}: {len(pts)} points')
    else:
        iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
        n = len(read_las(src))  # warm page cache
        t0 = time.perf_counter()
        for _ in range(iters):
            read_las(src)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({'npoints': n, 'decode_ms': round(dt * 1e3, 2),
                          'mpts_per_s': round(n / dt / 1e6, 3)}))


if __name__ == '__main__':
    main()

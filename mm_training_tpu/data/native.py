"""ctypes bindings + build for the native host point pipeline (csrc/).

Builds ``pointpack.cpp`` with g++ on first use (cached as a .so next to the
source; rebuilt when the source is newer) and exposes:

  * concat_filter_native(lidar, radar, pc_range, cam_ts) -> [M, 8]
  * pack_points_native(points, bda, cam_ts, cap, seed)
        -> (out [cap, F], mask [cap], cam_ts_norm)

Every entry point has a pure-numpy fallback with identical semantics (used
when no compiler is available); ``native_available()`` reports which path
is active. Deterministic per seed, but the subsample RNG is xorshift, not
numpy's — capacity subsampling is augmentation, not semantics.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ['native_available', 'concat_filter_native', 'pack_points_native']

_SRC = os.path.join(os.path.dirname(__file__), 'csrc', 'pointpack.cpp')
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    so_path = os.path.join(os.path.dirname(_SRC), 'pointpack.so')

    def build() -> None:
        # compile to a per-pid temp then rename: os.rename is atomic, so
        # concurrent first-use builds (multi-process training, parallel test
        # jobs on a shared filesystem) can't interleave writes into the
        # final .so and leave a fresh-mtime truncated ELF behind
        tmp = f'{so_path}.{os.getpid()}.tmp'
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
               _SRC, '-o', tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)

    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            build()
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            # stale/corrupt/foreign-arch .so with a newer mtime — rebuild
            # once before giving up on the native path
            build()
            lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.CalledProcessError):
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
    lib.concat_filter.restype = ctypes.c_int
    lib.concat_filter.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p]
    lib.pack_points.restype = ctypes.c_int
    lib.pack_points.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), f32p, u8p, ctypes.c_int,
        ctypes.c_uint64]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def native_available() -> bool:
    return _lib() is not None


# ------------------------------------------------------------------ wrappers

def concat_filter_native(lidar: np.ndarray, radar: np.ndarray, pc_range,
                         cam_ts: float) -> np.ndarray:
    """[x,y,z,intensity,ts] lidar + [x,y,z,speed,power] radar ->
    range-filtered [M, 8] rows (radar first, reference order)."""
    lidar = np.ascontiguousarray(lidar, np.float32)
    radar = np.ascontiguousarray(radar, np.float32)
    lib = _lib()
    if lib is not None:
        out = np.empty((lidar.shape[0] + radar.shape[0], 8), np.float32)
        m = lib.concat_filter(
            lidar, lidar.shape[0], lidar.shape[1] if lidar.size else 5,
            radar, radar.shape[0], radar.shape[1] if radar.size else 5,
            pc_range[0], pc_range[1], pc_range[3], pc_range[4],
            float(cam_ts), out)
        return out[:m]
    # numpy fallback — same semantics
    nl, nr = lidar.shape[0], radar.shape[0]
    lid = np.concatenate([lidar[:, 0:3], np.zeros((nl, 3), np.float32),
                          lidar[:, 3:4], lidar[:, 4:5]], axis=1)
    rad = np.concatenate([radar[:, 0:3], np.ones((nr, 1), np.float32),
                          radar[:, 3:5], np.zeros((nr, 1), np.float32),
                          np.full((nr, 1), cam_ts, np.float32)], axis=1)
    pts = np.concatenate([rad, lid])
    keep = ((pts[:, 0] > pc_range[0]) & (pts[:, 0] < pc_range[3])
            & (pts[:, 1] > pc_range[1]) & (pts[:, 1] < pc_range[4]))
    return pts[keep]


def pack_points_native(points: np.ndarray, bda: Optional[np.ndarray],
                       cam_ts: float, cap: int, seed: int
                       ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Normalize ts, scale intensity, subsample to cap, rotate xyz by bda,
    pad + mask. Returns (out [cap, F], mask [cap] bool, cam_ts_norm)."""
    pts = np.ascontiguousarray(points, np.float32)
    n, f = pts.shape if pts.size else (0, points.shape[1] if points.ndim == 2 else 8)
    lib = _lib()
    if lib is not None:
        if n > cap and pts is points:
            # the C subsampler Fisher-Yates-swaps rows of its input
            # (pointpack.cpp pack_points); don't mutate the caller's array
            pts = pts.copy()
        out = np.empty((cap, f), np.float32)
        mask = np.empty((cap,), np.uint8)
        ts_out = ctypes.c_float(0.0)
        # keep a reference to the contiguous bda for the duration of the
        # call: taking .ctypes.data off the ascontiguousarray temporary
        # would free it before lib.pack_points reads it (use-after-free
        # whenever the caller's bda isn't already contiguous float32)
        bda_f32 = (np.ascontiguousarray(bda, np.float32)
                   if bda is not None else None)
        bda_arr = bda_f32.ctypes.data if bda_f32 is not None else None
        lib.pack_points(pts, n, f, bda_arr, float(cam_ts),
                        ctypes.byref(ts_out), out, mask, cap,
                        ctypes.c_uint64(int(seed) & 0xFFFFFFFFFFFFFFFF))
        return out, mask.astype(bool), float(ts_out.value)
    # numpy fallback
    ts = pts[:, -1] if n else np.zeros((1,), np.float32)
    tmin, tmax = float(ts.min()), float(ts.max())
    denom = (tmax - tmin) or 1.0
    cam_ts_norm = (cam_ts - tmin) / denom
    work = pts.copy()
    if n:
        work[:, -1] = (work[:, -1] - tmin) / denom
        work[:, -2] /= 255.0
        if n > cap:
            sel = np.random.default_rng(seed).permutation(n)[:cap]
            work = work[sel]
        if bda is not None:
            work[:, :3] = work[:, :3] @ np.asarray(bda, np.float32).T
    out = np.zeros((cap, f), np.float32)
    mask = np.zeros((cap,), bool)
    k = min(work.shape[0], cap)
    out[:k] = work[:k]
    mask[:k] = True
    return out, mask, cam_ts_norm

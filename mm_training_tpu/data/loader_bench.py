"""Host data-pipeline throughput benchmark (the "can the host feed the
chip" proof — VERDICT r4 #1).

Every training-throughput number in BENCH_r0*.json feeds the device from
pre-built fake batches; this module measures the REAL host path at
production shapes instead — 4x 704x1280 JPEG decode (two of them Mei
fisheyes virtualized to pinholes via cv2.remap), point-cloud read +
egomotion aggregation + radar polar->cart, augmentation, native point
packing, fixed-shape collate — i.e. the full ``AiMotiveDataset`` /
``PrefetchLoader`` chain the trainer consumes (reference hot loop:
/root/reference/dataset/src/data_loader.py:73-127 under 8 torch worker
processes, exps/mm_training_aim.py:533-565).

The fixture is synthetic (``generate_synthetic_dataset``) but scaled to
production cost: ~100k-point clouds and high-entropy JPEGs
(``image_detail=True`` — smooth synthetic images decode ~3x faster than
real photos and would overstate host throughput). With ``--laz`` the
lidar frames are real LASzip files decoded by the native codec
(data/lasio.py) in the hot loop — the on-disk format of the real
dataset (lidar_loader.py:86-91); the default stays ``.npy`` (the
decoded-cache regime). Both numbers are recorded in BASELINE.md.

Pass/fail bar: loader samples/s must be >= the device training rate
(8.5 samples/s/chip, BENCH_r04) or the headline number is unreachable in
real training.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

__all__ = ['build_fixture', 'mirror_fixture_as_laz', 'measure_loader_sps',
           'measure_getitem_ms']

# fixture geometry: big enough that one epoch != one OS-cache-warm file,
# small enough to generate in seconds
_FIXTURE_FRAMES = 8
_FIXTURE_SEQS = 2
_FIXTURE_MARKER = 'loader_bench_fixture.json'


def build_fixture(root: str, img_hw=(704, 1280),
                  n_ground_points: int = 100_000,
                  lidar_format: str = 'npy') -> str:
    """Generate (or reuse) the production-shape fixture under ``root``.
    ``lidar_format='laz'`` writes real LASzip frames (decoded by the
    native codec, data/lasio.py) — the on-disk format of the real
    dataset, closing the "LAZ decompression unmeasured" gap."""
    from .synthetic import generate_synthetic_dataset

    spec = {'img_hw': list(img_hw), 'n_ground_points': n_ground_points,
            'frames': _FIXTURE_FRAMES, 'seqs': _FIXTURE_SEQS, 'version': 2}
    if lidar_format != 'npy':
        spec['lidar_format'] = lidar_format
    marker = os.path.join(root, _FIXTURE_MARKER)
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == spec:
                    return root
        except Exception:
            pass
    generate_synthetic_dataset(
        root, splits=('train',), odds=('highway',),
        sequences_per_odd=_FIXTURE_SEQS,
        frames_per_sequence=_FIXTURE_FRAMES, n_objects=8, img_hw=img_hw,
        fisheyes=True, n_ground_points=n_ground_points, image_detail=True,
        lidar_format=lidar_format)
    with open(marker, 'w') as f:
        json.dump(spec, f)
    return root


def mirror_fixture_as_laz(src_root: str, dst_root: str) -> str:
    """Cheap LAZ twin of an existing .npy fixture: symlink the images /
    annotations / calibration trees and convert only the lidar frames to
    real LASzip files (native codec). Avoids paying a second full fixture
    generation (the high-entropy JPEGs dominate build time)."""
    from . import lasio

    marker = os.path.join(dst_root, _FIXTURE_MARKER)
    src_marker = os.path.join(src_root, _FIXTURE_MARKER)
    with open(src_marker) as f:
        spec = json.load(f)
    spec['lidar_format'] = 'laz-mirror'
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == spec:
                    return dst_root
        except Exception:
            pass
    for dirpath, dirnames, filenames in os.walk(src_root):
        rel = os.path.relpath(dirpath, src_root)
        if rel == '.' and _FIXTURE_MARKER in filenames:
            filenames = [f for f in filenames if f != _FIXTURE_MARKER]
        dst_dir = os.path.join(dst_root, rel)
        os.makedirs(dst_dir, exist_ok=True)
        for name in filenames:
            src = os.path.join(dirpath, name)
            dst = os.path.join(dst_dir, name)
            if name.endswith('.npy') and os.path.basename(
                    dirpath) == 'raw-revolutions':
                laz = dst[:-4] + '.laz'
                if not os.path.exists(laz):
                    lasio.write_las(laz, np.load(src).astype(np.float64))
            elif not os.path.exists(dst):
                os.symlink(src, dst)
    with open(marker, 'w') as f:
        json.dump(spec, f)
    return dst_root


def _make_dataset(root: str, cfg=None):
    from ..configs import variants
    from .aimotive_dataset import AiMotiveDataset

    if cfg is None:
        # the full production host path: fisheye virtualization ON (the
        # reference always virtualizes its 2 Mei cameras,
        # data_loader.py:152-240); 6 virtual cams = front, back, 2 per
        # fisheye
        cfg = variants.lidar_cam_radar(
            batch_size=2, virtualize_fisheyes=True, num_cameras=6,
            max_points_per_frame=100_000)
    return cfg, AiMotiveDataset(root, cfg, split='train')


def measure_getitem_ms(root: str, iters: int = 6) -> float:
    """Single-threaded per-sample latency (ms) of dataset[i] — the
    sequential floor one worker thread pays per sample."""
    _, ds = _make_dataset(root)
    ds[0]  # warm remap caches + OS page cache
    t0 = time.perf_counter()
    for i in range(iters):
        ds[(i + 1) % len(ds)]
    return (time.perf_counter() - t0) * 1e3 / iters


def measure_loader_sps(root: str, batch_size: int = 2, num_workers: int = 8,
                       batches: int = 12, warmup: int = 3,
                       worker_mode: str = 'thread') -> float:
    """Sustained PrefetchLoader throughput (samples/s) at the production
    batch size — the number that must beat the device train rate."""
    from ..training.loader import PrefetchLoader

    cfg, ds = _make_dataset(root)
    loader = PrefetchLoader(ds, batch_size=batch_size, shuffle=True,
                            num_workers=num_workers, seed=0, drop_last=False,
                            worker_mode=worker_mode)
    try:
        done = 0
        t0 = None
        for epoch in range(1000):
            loader.set_epoch(epoch)
            for batch in loader:
                done += 1
                if done == warmup:
                    t0 = time.perf_counter()
                elif done > warmup and done - warmup >= batches:
                    dt = time.perf_counter() - t0
                    return batch_size * batches / dt
        raise RuntimeError('fixture too small for the requested batch count')
    finally:
        loader.close()


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--root', default='/tmp/loader_bench_ds')
    ap.add_argument('--batches', type=int, default=12)
    ap.add_argument('--num-workers', type=int, default=8)
    ap.add_argument('--batch-size', type=int, default=2)
    ap.add_argument('--sweep', action='store_true',
                    help='also sweep worker counts and the process mode')
    ap.add_argument('--laz', action='store_true',
                    help='use a LASzip-compressed lidar fixture (native '
                         'codec decode in the hot loop) instead of .npy')
    args = ap.parse_args()

    if args.laz:
        src = build_fixture(args.root)
        args.root = args.root.rstrip('/') + '_laz'
        mirror_fixture_as_laz(src, args.root)
    else:
        build_fixture(args.root)
    get_ms = measure_getitem_ms(args.root)
    sps = measure_loader_sps(args.root, batch_size=args.batch_size,
                             num_workers=args.num_workers,
                             batches=args.batches)
    out = {
        'loader_sps': round(sps, 3),
        'getitem_ms': round(get_ms, 2),
        'lidar_format': 'laz' if args.laz else 'npy',
        'num_workers': args.num_workers,
        'batch_size': args.batch_size,
        'host_cpus': os.cpu_count(),
        'device_rate_to_beat': 8.5,
        'feeds_device': sps >= 8.5,
    }
    if args.sweep:
        out['thread_sweep'] = {
            nw: round(measure_loader_sps(args.root, num_workers=nw,
                                         batches=args.batches), 3)
            for nw in (1, 2, 4, 8)}
        out['process_sps'] = round(measure_loader_sps(
            args.root, num_workers=args.num_workers, batches=args.batches,
            worker_mode='process'), 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

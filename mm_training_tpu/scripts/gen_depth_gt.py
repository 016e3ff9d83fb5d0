"""Precompute per-frame depth ground truth from LiDAR.

Re-design of scripts/gen_depth_gt.py (multiprocess LiDAR->image depth-GT
bins for nuScenes, :15-127), retargeted at the aiMotive tree: for every
keyframe, project the aggregated point cloud into each virtual camera and
save the downsampled min-depth grid as ``.npy`` next to nothing — a mirror
tree under --out. Training can then skip the on-device projection
(ops/depth_labels.py) by loading these files.

Usage:
    python -m mm_training_tpu.scripts.gen_depth_gt \
        --data-root /data/aimotive --split train --out /data/depth_gt \
        [--workers 8] [--height 704 --width 1280]
"""
from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

import numpy as np


def depth_grid_numpy(points, extrinsic, intrinsic, img_hw, downsample):
    """Pure-numpy twin of ops.depth_labels.depth_labels_single_cam (kept in
    numpy so the offline tool needs no accelerator)."""
    h, w = img_hw
    fh, fw = h // downsample, w // downsample
    xyz1 = np.concatenate([points[:, :3], np.ones_like(points[:, :1])], -1)
    cam = xyz1 @ np.asarray(extrinsic, np.float64).T
    depth = cam[:, 2]
    proj = cam @ np.asarray(intrinsic, np.float64).T
    zz = np.where(proj[:, 2] == 0, 1e-9, proj[:, 2])
    u, v = proj[:, 0] / zz, proj[:, 1] / zz
    valid = (depth > 1.0) & (u > 1) & (u < w - 1) & (v > 1) & (v < h - 1)
    grid = np.full((fh, fw), 1e5, np.float32)
    px = (u[valid].astype(np.int64) // downsample)
    py = (v[valid].astype(np.int64) // downsample)
    d = depth[valid].astype(np.float32)
    np.minimum.at(grid, (py, px), d)
    grid[grid >= 1e5] = 0.0
    return grid


def _process_frame(args):
    path, out_root, data_root, img_hw, downsample, virt_fisheyes = args
    from ..data.frame_loader import FrameLoader
    loader = FrameLoader('val', pc_range=(-1e9, -1e9, -1e9, 1e9, 1e9, 1e9),
                         use_cam=True, use_lidar=True, use_radar=False,
                         virtualize_fisheyes=virt_fisheyes,
                         image_size=img_hw)
    frame = loader[path]
    grids = [depth_grid_numpy(frame.points, c.camera_params.extrinsic,
                              c.camera_params.intrinsic, img_hw, 16)
             for c in frame.cameras]
    rel = os.path.relpath(path, data_root)
    out = os.path.join(out_root, os.path.splitext(rel)[0] + '_depth.npy')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, np.stack(grids) if grids else np.zeros((0,), np.float32))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data-root', required=True)
    p.add_argument('--split', default='train')
    p.add_argument('--out', required=True)
    p.add_argument('--workers', type=int, default=8)
    p.add_argument('--height', type=int, default=704)
    p.add_argument('--width', type=int, default=1280)
    p.add_argument('--virtualize-fisheyes', action='store_true',
                   help='include the 4 fisheye-derived virtual cameras '
                        '(match Config.virtualize_fisheyes)')
    args = p.parse_args(argv)

    from ..data.aimotive_dataset import get_frames
    frames = get_frames(args.data_root, args.split)
    work = [(f, args.out, args.data_root, (args.height, args.width), 16,
             args.virtualize_fisheyes)
            for f in frames]
    if args.workers > 1:
        with Pool(args.workers) as pool:
            outs = pool.map(_process_frame, work)
    else:
        outs = [_process_frame(w) for w in work]
    print(f'wrote {len(outs)} depth-GT files under {args.out}')


if __name__ == '__main__':
    main()

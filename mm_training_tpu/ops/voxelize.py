"""Fixed-shape pillar voxelization + mean VFE — TPU-native.

Replaces the reference's mmdet3d CUDA ``Voxelization`` + ``HardSimpleVFE``
(models/bev_depth.py:181-183; conf_aim.py:194-201: voxel 0.2x0.2x8 m,
max_num_points=15, max_voxels=25000, VFE = mean of the first 5 point features).

TPU re-design: there is exactly one z bin for the reference geometry (z extent
8 m covers the whole range), i.e. voxels are *pillars*. We skip the sparse
voxel list entirely and scatter the per-pillar mean features straight into the
dense BEV grid with one segment-sum — fixed shapes, no atomics, no 25 000
voxel cap (the cap was a CUDA memory bound; keeping every pillar is strictly
more information). By default the mean runs over *all* points in a pillar
rather than the first 15 (the reference subsamples in point order only
because its CUDA buffer is fixed); pass ``max_points_per_voxel`` to reproduce
the exact first-K-in-order semantics (adds a sort).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ['voxelize_pillars_dense']


def voxelize_pillars_dense(points: jnp.ndarray, mask: jnp.ndarray,
                           pc_range, voxel_size, grid_hw: Tuple[int, int],
                           num_features: int = 5,
                           max_points_per_voxel: Optional[int] = None,
                           return_count: bool = False
                           ) -> Union[jnp.ndarray,
                                      Tuple[jnp.ndarray, jnp.ndarray]]:
    """Mean-pool padded points into a dense pillar grid.

    Args:
      points: [P, F] padded point cloud (F >= num_features; feature order is
        the loader's [x, y, z, is_radar, speed, power, intensity, ts] when
        radar is fused, else [x, y, z, intensity, ts]).
      mask:   [P] bool validity of each point.
      pc_range: (x0, y0, z0, x1, y1, z1).
      voxel_size: (vx, vy, vz).
      grid_hw: static (ny, nx) pillar grid size.
      num_features: how many leading features the VFE averages (conf_aim.py:200).
      max_points_per_voxel: if set, average only the first K points (in input
        order) of each pillar, bit-matching mmdet3d's hard voxelizer.
      return_count: also return the [ny, nx, 1] per-pillar point count (the
        capped count when max_points_per_voxel is set) — count > 0 is the
        sparse-encoder active-site mask.

    Returns:
      [ny, nx, num_features] dense grid of per-pillar mean features
      (empty pillars are zero); plus the count grid if return_count.
    """
    ny, nx = grid_hw
    g = ny * nx
    x0, y0, z0, x1, y1, z1 = pc_range
    vx, vy, vz = voxel_size

    # pillar-only by design (see module docstring): the segment id below is
    # (yi, xi) with no z term, so multiple z bins would be silently averaged
    # into one pillar — refuse configs where vz doesn't cover the z extent.
    nz = 1 + int((z1 - z0) / vz - 1e-6)
    if nz != 1:
        raise ValueError(
            f'voxelize_pillars_dense is pillar-only: voxel z size {vz} gives '
            f'{nz} z bins over [{z0}, {z1}]; distinct z voxels would be '
            'averaged together. Use vz >= the z extent (reference geometry, '
            'conf_aim.py:194-201) or a true 3D voxelizer.')

    xi = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    yi = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    zi = jnp.floor((points[:, 2] - z0) / vz).astype(jnp.int32)
    valid = (mask & (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
             & (zi >= 0) & (zi < nz))
    seg = jnp.where(valid, yi * nx + xi, g)                      # [P]

    feats = points[:, :num_features]
    w = valid.astype(feats.dtype)

    if max_points_per_voxel is not None:
        # rank of each point within its pillar (stable, input order):
        # sort by segment id, rank = position - first position of the run.
        p = points.shape[0]
        order = jnp.argsort(seg, stable=True)
        seg_sorted = seg[order]
        pos = jnp.arange(p, dtype=jnp.int32)
        first_of_run = jnp.searchsorted(seg_sorted, seg_sorted, side='left')
        rank_sorted = pos - first_of_run
        rank = jnp.zeros((p,), jnp.int32).at[order].set(rank_sorted)
        w = w * (rank < max_points_per_voxel).astype(feats.dtype)

    # one scatter for sums AND counts: append a ones column so the count
    # rides the same segment_sum pass (two passes profiled ~40% slower)
    rows = jnp.concatenate([feats * w[:, None], w[:, None]], axis=1)
    agg = jax.ops.segment_sum(rows, seg, num_segments=g + 1)
    mean = agg[:g, :num_features] / jnp.maximum(agg[:g, num_features:], 1.0)
    mean = mean.reshape(ny, nx, num_features)
    if return_count:
        return mean, agg[:g, num_features:].reshape(ny, nx, 1)
    return mean

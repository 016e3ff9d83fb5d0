"""Depth-label generation from LiDAR — one jitted projection kernel.

Replaces the reference's triple Python loop over B x S x N cameras
(exps/mm_training_aim.py:115-163) and its full-resolution scatter +
min-pool-16x (get_downsampled_gt_depth, :180-215) with a single vectorized
scatter-min straight into the downsampled grid.

Parity notes:
  * the reference scatters depths at full resolution (last point per pixel
    wins) and then min-pools nonzero values over 16x16 windows; we take the
    min over all points per window directly — identical except when two
    points land on the same full-res pixel, where min is the deterministic
    choice of the same candidate set.
  * bin index = (d - (d0 - step)) / step, out-of-range -> bin 0, one-hot over
    D bins *including* bin 0 (so empty cells get one-hot(0) and the
    foreground mask max(labels) > 0 is all-true — faithfully reproducing
    mm_training_aim.py:200-216, which feeds the same maps as the depth
    oracle input).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['depth_labels_single_cam', 'depth_labels', 'depth_grid_to_onehot']

_EMPTY = 1e5


def depth_labels_single_cam(points: jnp.ndarray, mask: jnp.ndarray,
                            extrinsic: jnp.ndarray, intrinsic: jnp.ndarray,
                            img_hw, downsample: int, d_bound,
                            num_bins: int) -> jnp.ndarray:
    """One camera: padded points -> one-hot depth labels.

    Args:
      points:    [P, 3+] ego-frame points (BDA *not* applied — the reference
                 un-rotates by bda before projecting, mm_training_aim.py:129-131;
                 callers pass the un-augmented cloud).
      mask:      [P] validity.
      extrinsic: [4, 4] body->camera.
      intrinsic: [4, 4].
      img_hw:    static (H, W) of the network input image.
      downsample: static factor (16).
      d_bound:   (d0, d1, step).
      num_bins:  static D (== depth_channels).

    Returns:
      [H/ds, W/ds, num_bins] float32 one-hot labels.
    """
    h, w = img_hw
    fh, fw = h // downsample, w // downsample

    xyz1 = jnp.concatenate([points[:, :3], jnp.ones_like(points[:, :1])], -1)
    # projection math in full fp32 (platform default matmul precision is low)
    cam = jnp.matmul(xyz1, extrinsic.T, precision='highest')     # [P, 4]
    depth = cam[:, 2]
    proj = jnp.matmul(cam, intrinsic.T, precision='highest')
    u = proj[:, 0] / jnp.where(proj[:, 2] == 0, 1e-9, proj[:, 2])
    v = proj[:, 1] / jnp.where(proj[:, 2] == 0, 1e-9, proj[:, 2])

    # mm_training_aim.py:151-156: depth > 1, strictly inside a 1-px border
    valid = (mask & (depth > 1.0) & (u > 1) & (u < w - 1) & (v > 1) & (v < h - 1))
    px = u.astype(jnp.int32) // downsample
    py = v.astype(jnp.int32) // downsample
    seg = jnp.where(valid, py * fw + px, fh * fw)

    grid = jax.ops.segment_min(jnp.where(valid, depth, _EMPTY), seg,
                               num_segments=fh * fw + 1)[:fh * fw]
    grid = grid.reshape(fh, fw)
    # single binning implementation shared with the precomputed-GT path
    # (train_step.py consumes both; the two must stay bit-identical)
    return depth_grid_to_onehot(grid, d_bound, num_bins)


def depth_grid_to_onehot(grid: jnp.ndarray, d_bound, num_bins: int
                         ) -> jnp.ndarray:
    """Precomputed min-depth grid (0.0 = empty cell; the format written by
    scripts/gen_depth_gt.py and read by the reference at
    nusc_mv_det_dataset.py:387-396) -> one-hot labels [..., num_bins] with
    the exact binning of the projection path above (empty cells land in bin
    0 because d0 > step)."""
    d0, _, step = d_bound
    idx = (grid - (d0 - step)) / step
    idx = jnp.where((idx < num_bins) & (idx >= 0.0), idx, 0.0)
    return jax.nn.one_hot(idx.astype(jnp.int32), num_bins, dtype=jnp.float32)


def depth_labels(points: jnp.ndarray, mask: jnp.ndarray,
                 extrinsics: jnp.ndarray, intrinsics: jnp.ndarray,
                 img_hw, downsample: int, d_bound, num_bins: int) -> jnp.ndarray:
    """All cameras of one sample: extrinsics/intrinsics [N, 4, 4] ->
    [N, H/ds, W/ds, num_bins]."""
    fn = lambda e, i: depth_labels_single_cam(
        points, mask, e, i, img_hw, downsample, d_bound, num_bins)
    return jax.vmap(fn)(extrinsics, intrinsics)

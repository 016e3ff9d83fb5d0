"""On-device circle NMS — TPU-native, fixed shapes.

Replaces CenterPoint's numba-JIT CPU ``circle_nms`` that the reference invokes
through mmdet3d ``CenterHead.get_bboxes`` (conf_aim.py:171 nms_type='circle',
min_radius per task [4, 10, 0.5, 0.25], pre_max_size 1000, post_max_size 83).

Semantics matched exactly: boxes are visited in descending-score order; a box
is suppressed when its squared center distance to any *kept* higher-scoring
box is <= ``thresh`` (CenterPoint compares squared distance against the raw
min_radius value, so we do too). The sequential dependency is a
``lax.fori_loop`` over K slots updating a keep mask — O(K^2) on K<=500 slots,
negligible on the VPU and fully jittable (no host round-trip, unlike the
reference's GPU->CPU->numba bounce).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['circle_nms_mask']


def circle_nms_mask(centers: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Compute the keep mask of circle NMS.

    Args:
      centers: [K, 2] box centers (x, y).
      scores:  [K] scores (used only for ordering).
      valid:   [K] bool — padded/below-threshold slots never suppress others.
      thresh:  scalar; suppress when squared distance <= thresh.

    Returns:
      bool [K] keep mask (in the original slot order).
    """
    k = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    cx = centers[order]
    val = valid[order]
    d2 = jnp.sum((cx[:, None, :] - cx[None, :, :]) ** 2, axis=-1)  # [K, K]
    close = d2 <= thresh

    def body(i, keep):
        kept_i = keep[i] & val[i]
        # suppress lower-ranked close boxes when slot i survives
        sup = kept_i & close[i] & (jnp.arange(k) > i)
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, k, body, val)
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep & valid

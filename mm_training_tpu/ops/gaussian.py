"""Gaussian heatmap target primitives — vectorized, jittable.

Replaces mmdet3d's ``gaussian_radius`` / ``draw_heatmap_gaussian`` that the
reference's per-object Python loop calls (layers/heads/bev_depth_head.py:
163-254). The loop becomes a chunked max-reduction over padded objects: every
object contributes a windowed gaussian to the full map and the map is the
elementwise max — identical to sequential drawing because max is associative
and the reference combines patches with ``torch.max`` too.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['gaussian_radius', 'draw_heatmap']


def gaussian_radius(det_size, min_overlap: float):
    """CornerNet radius rule; det_size = (height, width) in feature cells.

    Matches mmdet3d.core.gaussian_radius (three quadratic cases, min taken),
    called at bev_depth_head.py:197-199 with min_overlap=0.1. Accepts arrays.
    """
    height, width = det_size
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_heatmap(centers_int: jnp.ndarray, radii: jnp.ndarray,
                 valid: jnp.ndarray, hw, chunk: int = 32) -> jnp.ndarray:
    """Render max-combined gaussians onto a single-channel heatmap.

    Args:
      centers_int: [K, 2] int32 (x, y) feature-map centers.
      radii:       [K] int32 radii (>= 1).
      valid:       [K] bool.
      hw:          static (H, W).

    Returns:
      [H, W] float32 heatmap.

    Parity notes: sigma = (2r+1)/6 and the gaussian is only drawn inside the
    (2r+1)^2 window around the center (mmdet3d draw_heatmap_gaussian clips the
    patch to that window and to the map borders; our mask reproduces both).
    """
    h, w = hw
    k = centers_int.shape[0]
    pad = (-k) % chunk
    if pad:
        centers_int = jnp.concatenate(
            [centers_int, jnp.zeros((pad, 2), centers_int.dtype)], 0)
        radii = jnp.concatenate([radii, jnp.ones((pad,), radii.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0)
        k += pad

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def chunk_map(args):
        c, r, v = args  # [chunk,2], [chunk], [chunk]
        dx = xs[None] - c[:, 0, None, None]
        dy = ys[None] - c[:, 1, None, None]
        sigma = (2.0 * r.astype(jnp.float32) + 1.0) / 6.0
        g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
                    / (2.0 * sigma[:, None, None] ** 2))
        inside = (jnp.abs(dx) <= r[:, None, None]) & (jnp.abs(dy) <= r[:, None, None])
        g = jnp.where(inside & v[:, None, None], g, 0.0)
        return jnp.max(g, axis=0)

    def step(carry, args):
        return jnp.maximum(carry, chunk_map(args)), None

    init = jnp.zeros((h, w), jnp.float32)
    cc = centers_int.reshape(-1, chunk, 2)
    rr = radii.reshape(-1, chunk)
    vv = valid.reshape(-1, chunk)
    out, _ = jax.lax.scan(step, init, (cc, rr, vv))
    return out

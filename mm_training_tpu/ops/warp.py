"""XLA-native image warps (affine BEV warp, horizontal flip, bilinear resize).

Replaces the reference's kornia GPU warps:
  * BDA applied to the camera BEV via ``warp_affine`` (models/bev_depth.py:69-84)
  * per-image ``hflip`` augmentation / un-flip (mm_training_aim.py:100-108,
    lss_fpn.py:425)
  * lidar-BEV bilinear upsample (models/bev_depth.py:189)

All NHWC, all static shapes, all fuse under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['warp_affine_nhwc', 'bda_bev_warp', 'hflip', 'resize_bilinear']


def _bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample img [H, W, C] at continuous pixel coords (zero padding)."""
    h, w, _ = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        val = img[yi_c, xi_c]
        return jnp.where(inb[..., None], val, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    out = top * (1 - wy)[..., None] + bot * wy[..., None]
    # the fp32 coordinate weights promote a bf16 image; cast back so the
    # warp preserves the caller's compute dtype (promotion chaining would
    # otherwise drag the fuse layer + BEV head to fp32 — the measured
    # pitfall class documented at models/resnet.py mask cast). Float maps
    # only: casting back to an integer dtype would truncate the bilinear
    # weights to nearest-int artifacts.
    if not jnp.issubdtype(img.dtype, jnp.floating):
        raise TypeError(
            f'bilinear sampling needs a float image, got {img.dtype} — '
            'cast to float before warping')
    return out.astype(img.dtype)


def warp_affine_nhwc(img: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """kornia-style warp_affine: ``dst(q) = src(inv(M) q)`` in pixel coords.

    img: [B, H, W, C]; mat: [B, 3, 3] src->dst pixel transform.
    """
    b, h, w, _ = img.shape
    inv = jnp.linalg.inv(mat)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ones = jnp.ones_like(xs)
    q = jnp.stack([xs, ys, ones], axis=-1)                       # [H, W, 3]

    def one(im, m):
        p = q @ m.T
        return _bilinear_sample(im, p[..., 0] / p[..., 2], p[..., 1] / p[..., 2])

    return jax.vmap(one)(img, inv)


def bda_bev_warp(bev: jnp.ndarray, bda_mat: jnp.ndarray) -> jnp.ndarray:
    """Apply the BEV-aug rotation/flip/scale to a BEV map.

    Matches models/bev_depth.py:69-84: pixel transform =
    T(+c) @ bda[:3,:3] @ T(-c) with c = ((W-1)/2, (H-1)/2).

    bev: [B, H, W, C]; bda_mat: [B, 4, 4] (or [B, 3, 3]).
    """
    b, h, w, _ = bev.shape
    r = bda_mat[:, :3, :3] if bda_mat.shape[-1] == 4 else bda_mat
    # Compose the pixel affine from the 2x2 xy block only:
    #   M = [lin | c - lin @ c] — rotate/flip/scale about the center pixel
    # c = ((W-1)/2, (H-1)/2), which is exactly where metric (0, 0) lands on
    # the symmetric BEV grid, so the warped camera BEV stays aligned with
    # the metrically-scaled lidar BEV / boxes / points.
    #
    # Deliberate deviation from the reference (bev_depth.py:69-84): it
    # composes T(c) @ bda[:3,:3] @ T(-c) and truncates to 2x3, but bda's
    # z row carries scale_ratio at [2,2], which leaks s into the
    # translation (t = s*c - lin @ c) — rotating about center while
    # scaling about pixel (0, 0), shifting the camera BEV by (s-1)*c
    # (~3 px at s=1.05) relative to the scaled targets. Ours scales about
    # center. (Feeding the full 3x3 through the projective divide is wrong
    # the other way: the divide by s cancels the scale entirely.)
    lin = r[:, :2, :2]
    c = jnp.array([(w - 1) / 2.0, (h - 1) / 2.0], jnp.float32)
    t = c[None, :] - jnp.einsum('bij,j->bi', lin, c)
    top = jnp.concatenate([lin, t[:, :, None]], axis=2)          # [B, 2, 3]
    bottom = jnp.broadcast_to(jnp.array([[[0.0, 0.0, 1.0]]], jnp.float32),
                              (b, 1, 3))
    mat = jnp.concatenate([top, bottom], axis=1)                 # [B, 3, 3]
    return warp_affine_nhwc(bev, mat)


def hflip(img: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of [..., H, W, C]."""
    return jnp.flip(img, axis=-2)


def resize_bilinear(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize of [B, H, W, C] (torch F.upsample default semantics:
    align_corners=False)."""
    b, _, _, c = img.shape
    return jax.image.resize(img, (b, out_hw[0], out_hw[1], c), method='bilinear')

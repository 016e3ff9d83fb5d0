"""Frustum / lift-splat geometry (JAX, jit-safe, static shapes).

Re-design of the reference's LSSFPN geometry path
(layers/backbones/lss_fpn.py:308-361,455-462): build the image-plane frustum
once (static), transform it to ego coordinates with per-sample calibration,
and quantize to BEV voxel indices. All shapes static; everything fuses under
jit.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ['create_frustum', 'get_geometry', 'quantize_geometry',
           'flat_bev_index', 'rig_is_row_independent']


def create_frustum(d_bound, final_dim, downsample_factor) -> np.ndarray:
    """[D, fH, fW, 3] frustum of (u, v, d) image-plane points.

    Matches lss_fpn.py:308-326: depths = arange(*d_bound); pixel coords are
    linspace(0, W-1, fW) x linspace(0, H-1, fH) in *input-image* pixels.
    Returned as numpy so it can be baked into the jit as a constant.
    """
    ogf_h, ogf_w = final_dim
    f_h, f_w = ogf_h // downsample_factor, ogf_w // downsample_factor
    d = np.arange(d_bound[0], d_bound[1], d_bound[2], dtype=np.float32)
    depth = d[:, None, None] * np.ones((1, f_h, f_w), np.float32)
    x = np.linspace(0, ogf_w - 1, f_w, dtype=np.float32)[None, None, :] * np.ones_like(depth)
    y = np.linspace(0, ogf_h - 1, f_h, dtype=np.float32)[None, :, None] * np.ones_like(depth)
    return np.stack([x, y, depth], axis=-1)  # [D, fH, fW, 3]


def get_geometry(frustum: jnp.ndarray, sensor2ego: jnp.ndarray,
                 intrin: jnp.ndarray) -> jnp.ndarray:
    """Frustum -> ego xyz (lss_fpn.py:328-361).

    frustum:    [D, fH, fW, 3] of (u, v, d)
    sensor2ego: [B, N, 4, 4]
    intrin:     [B, N, 4, 4]
    returns     [B, N, D, fH, fW, 3] ego coordinates.

    The reference multiplies homogeneous (u*d, v*d, d, 1) by
    sensor2ego @ inv(intrin); we do the same with one einsum.
    """
    u = frustum[..., 0] * frustum[..., 2]
    v = frustum[..., 1] * frustum[..., 2]
    d = frustum[..., 2]
    ones = jnp.ones_like(d)
    pts = jnp.stack([u, v, d, ones], axis=-1)                    # [D,fH,fW,4]
    # calibration math must stay fp32: at 200 m range, bf16 matmul rounding
    # (the platform default) would move frustum points by ~1 m.
    combine = jnp.matmul(sensor2ego, jnp.linalg.inv(intrin),
                         precision='highest')                    # [B,N,4,4]
    out = jnp.einsum('bnij,dhwj->bndhwi', combine, pts, precision='highest')
    return out[..., :3]


def rig_is_row_independent(sensor2ego, intrin, tol: float = 1e-5) -> bool:
    """True iff the BEV (x, y) of every frustum point is independent of the
    image row — the exactness condition of the factorized splat
    (ops/voxel_pooling.lift_splat_factorized).

    The row enters the projection only through the (v*d) term, whose ego
    x/y coefficients are column 1 of sensor2ego @ inv(intrin). Zero
    roll/pitch + zero-skew intrinsics (what camera virtualization
    produces) make them exactly 0. Host-side numpy — call once per rig.
    """
    s2e = np.asarray(sensor2ego, np.float64).reshape(-1, 4, 4)
    k = np.asarray(intrin, np.float64).reshape(-1, 4, 4)
    combine = s2e @ np.linalg.inv(k)
    return bool(np.all(np.abs(combine[:, 0:2, 1]) < tol))


def quantize_geometry(geom_xyz: jnp.ndarray, voxel_coord, voxel_size) -> jnp.ndarray:
    """Ego xyz -> integer voxel indices (lss_fpn.py:461-462).

    idx = int((xyz - (voxel_coord - voxel_size/2)) / voxel_size), where
    voxel_coord is the center of voxel 0 and the int() truncates toward
    zero (torch .int()). Truncation is reproduced exactly — including its
    quirk that coordinates up to one voxel BELOW the grid minimum land in
    edge voxel 0 and pass the range mask (floor would send them to -1 and
    the trash bin), so edge-voxel BEV features bit-match the reference.
    """
    vc = jnp.asarray(voxel_coord, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    return ((geom_xyz - (vc - vs / 2.0)) / vs).astype(jnp.int32)


def flat_bev_index(geom_idx: jnp.ndarray, voxel_num) -> jnp.ndarray:
    """Integer voxel xyz -> flat BEV cell id, out-of-range -> n_cells (trash bin).

    geom_idx: [..., 3] int32; voxel_num: (nx, ny, nz).
    Returns [...] int32 in [0, nx*ny]; flat id = y * nx + x (matches the
    CUDA kernel's output[b, y, x] layout, voxel_pooling_forward_cuda.cu:30-34).
    """
    nx, ny, nz = voxel_num
    x, y, z = geom_idx[..., 0], geom_idx[..., 1], geom_idx[..., 2]
    valid = ((x >= 0) & (x < nx) & (y >= 0) & (y < ny) & (z >= 0) & (z < nz))
    flat = y * nx + x
    return jnp.where(valid, flat, nx * ny).astype(jnp.int32)

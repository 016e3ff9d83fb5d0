"""LSS voxel pooling ("splat") — TPU-native.

The reference implements this as a CUDA scatter-add kernel
(ops/voxel_pooling/src/voxel_pooling_forward_cuda.cu:9-36: one thread per
frustum point, atomicAdd of its C-vector into output[b, y, x, :]) with a
Python gather backward (ops/voxel_pooling/voxel_pooling.py:57-69).

TPU re-design — two levels:

1. ``voxel_pooling``: drop-in semantic equivalent built on ``segment_sum``
   (sort + segmented reduce: the TPU-friendly scatter). Differentiable through
   JAX's native VJP (the backward is the same index gather the reference does
   by hand). Used for parity tests and generic pooling.

2. ``lift_splat``: the hot-path splat. Two formulations were measured on
   v5e (8 cameras, D=409, P=3520, C=80, G=8192, fwd+bwd):

   * MatrixVT-style ray matrix — scatter scalar depths into A[G, P], then
     bev = A @ ctx on the MXU. 96 ms. TPU scatter cost is per-ROW (updates
     serialize), so 1.44M width-1 updates waste 99% of the VPU.
   * direct wide scatter — materialize depth[d,p] * ctx[p,:] and scatter
     C-wide rows (the reference CUDA kernel's formulation, minus atomics).
     Same 1.44M rows but each moves 80 lanes; the backward is a wide
     gather. 35 ms.

   The wide scatter wins ~3x and is what ``lift_splat`` implements; the ray
   matrix variant is kept as ``lift_splat_matrix`` for reference/benchmarks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['voxel_pooling', 'lift_splat', 'lift_splat_matrix',
           'lift_splat_factorized']


def voxel_pooling(geom_xyz: jnp.ndarray, features: jnp.ndarray, voxel_num) -> jnp.ndarray:
    """Scatter-add point features onto a BEV grid.

    Args:
      geom_xyz: [B, N, 3] int32 voxel coords (x, y, z); out-of-range dropped.
      features: [B, N, C] float features.
      voxel_num: static (nx, ny, nz).

    Returns:
      [B, ny, nx, C] BEV feature map (NHWC; the reference returns NCHW).
    """
    nx, ny, nz = (int(v) for v in voxel_num)
    b, n, c = features.shape
    g = nx * ny
    x, y, z = geom_xyz[..., 0], geom_xyz[..., 1], geom_xyz[..., 2]
    valid = (x >= 0) & (x < nx) & (y >= 0) & (y < ny) & (z >= 0) & (z < nz)
    flat = jnp.where(valid, y * nx + x, g)                       # [B, N]
    seg = flat + (g + 1) * jnp.arange(b, dtype=jnp.int32)[:, None]
    out = jax.ops.segment_sum(
        features.reshape(b * n, c), seg.reshape(b * n),
        num_segments=b * (g + 1))
    return out.reshape(b, g + 1, c)[:, :g].reshape(b, ny, nx, c)


def _lift_splat_one(depth: jnp.ndarray, ctx: jnp.ndarray, flat_idx: jnp.ndarray,
                    n_cells: int) -> jnp.ndarray:
    """Single-camera factorized splat.

    depth:    [D, P]   softmax depth (or one-hot oracle)
    ctx:      [P, C]   context features
    flat_idx: [D, P]   int32 BEV cell id in [0, n_cells] (n_cells = trash bin)
    returns   [n_cells, C]
    """
    d, p = depth.shape
    pix = jax.lax.broadcasted_iota(jnp.int32, (d, p), 1)
    seg = flat_idx * p + pix                                     # [(G+1)*P) ids
    # accumulate in f32 (same rationale as lift_splat_factorized: thousands
    # of bf16 adds per cell lose mantissa), return the compute dtype
    a = jax.ops.segment_sum(depth.reshape(-1).astype(jnp.float32),
                            seg.reshape(-1),
                            num_segments=(n_cells + 1) * p)
    a = a.reshape(n_cells + 1, p)[:n_cells]
    return jnp.dot(a, ctx, preferred_element_type=jnp.float32).astype(ctx.dtype)


def lift_splat(depth: jnp.ndarray, ctx: jnp.ndarray, flat_idx: jnp.ndarray,
               n_cells: int) -> jnp.ndarray:
    """Lift-splat over a batch of cameras, scanned to bound memory (the
    [D*P, C] outer-product slab lives for one camera at a time).

    Args:
      depth:    [M, D, P]  per-camera depth distributions.
      ctx:      [M, P, C]  per-camera context features.
      flat_idx: [M, D, P]  int32 BEV cell ids in [0, n_cells]
                (n_cells = trash bin for out-of-grid rays).
      n_cells:  static number of BEV cells (ny * nx).

    Returns:
      [M, n_cells, C] splatted BEV features (caller reshapes / sums cameras).
    """
    d, p = depth.shape[1], depth.shape[2]
    c = ctx.shape[-1]

    def step(_, args):
        dep, cx, fi = args
        vals = (dep[:, :, None] * cx[None, :, :]).reshape(d * p, c)
        # accumulate in f32, matching lift_splat_factorized — a BEV cell can
        # receive thousands of contributions, and bf16 adds lose them; the
        # convert fuses into the scatter, so the [D*P, C] slab stays bf16
        out = jax.ops.segment_sum(vals.astype(jnp.float32), fi.reshape(d * p),
                                  num_segments=n_cells + 1)[:n_cells]
        return None, out.astype(ctx.dtype)

    _, out = jax.lax.scan(step, None, (depth, ctx, flat_idx))
    return out


def lift_splat_matrix(depth: jnp.ndarray, ctx: jnp.ndarray,
                      flat_idx: jnp.ndarray, n_cells: int) -> jnp.ndarray:
    """MatrixVT-style ray-matrix formulation (see module docstring) — kept
    for comparison benchmarks; numerically identical to ``lift_splat``."""
    def step(_, args):
        dep, cx, fi = args
        return None, _lift_splat_one(dep, cx, fi, n_cells)

    _, out = jax.lax.scan(step, None, (depth, ctx, flat_idx))
    return out


def lift_splat_factorized(depth: jnp.ndarray, ctx: jnp.ndarray,
                          flat_idx_xy: jnp.ndarray, zvalid: jnp.ndarray,
                          n_cells: int) -> jnp.ndarray:
    """Row-factorized splat for zero-roll/pitch (virtualized) cameras.

    With zero roll and pitch, the camera's y (image-row) axis maps to pure
    ego -z, so a frustum point's BEV (x, y) cell depends only on (depth bin,
    image COLUMN) — never on the row. The splat then factorizes exactly:

        bev[g, c] = sum_{d,u} A[d, u, c] * [cell(d, u) == g]
        A[d, u, c] = sum_v depth[d, v, u] * zvalid[d, v, u] * ctx[v, u, c]

    The row contraction is an MXU einsum, and the scatter shrinks from
    D*fH*fW rows to D*fW rows — 44x fewer at production geometry. A device
    profile showed the unfactorized scatter was ~65% of the whole train
    step; this removes almost all of it. Exactness requires the virtualized
    rig (data/frame_loader.py guarantees zero roll/pitch and zero-skew
    intrinsics); gate with BackboneConf.factorized_splat for raw rigs.

    Args:
      depth:       [M, D, fH, fW] depth distributions.
      ctx:         [M, fH, fW, C] context features.
      flat_idx_xy: [M, D, fW] int32 BEV cell ids (trash bin = n_cells).
      zvalid:      [M, D, fH, fW] bool z-range mask (row-dependent).
      n_cells:     static ny * nx.

    Returns:
      [M, n_cells, C] per-camera BEV features.
    """
    m, d, fh, fw = depth.shape
    c = ctx.shape[-1]
    masked = depth * zvalid.astype(depth.dtype)
    a = jnp.einsum('mdhw,mhwc->mdwc', masked, ctx,
                   preferred_element_type=jnp.float32)            # [M,D,fW,C]
    seg = (flat_idx_xy
           + (n_cells + 1) * jnp.arange(m, dtype=jnp.int32)[:, None, None])
    out = jax.ops.segment_sum(a.reshape(m * d * fw, c),  # already f32 (einsum)
                              seg.reshape(-1),
                              num_segments=m * (n_cells + 1))
    # back to the compute dtype: returning f32 would silently promote the
    # fuse layer + entire BEV head under mixed precision
    out = out.astype(ctx.dtype)
    return out.reshape(m, n_cells + 1, c)[:, :n_cells]

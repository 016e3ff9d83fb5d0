"""Import-compatible dense replica of mmdet3d's SparseEncoder.

The reference's lidar middle encoder is a spconv SparseEncoder
(conf_aim.py:202-212: in_channels=5, sparse_shape=[41, 256, 2048],
encoder_channels ((16,16,32),(32,32,64),(64,64,128),(128,128)),
block_type='basicblock', output_channels=128) consumed at
models/bev_depth.py:181-183. All four released checkpoints carry its
weights (README.md:65-72), so an import-compatible equivalent is required
to evaluate them end-to-end.

Mathematical reduction (exact, not an approximation):

* A **submanifold** sparse conv equals a dense conv on the zero-filled grid
  masked to the (unchanged) active-site set: inactive neighbors contribute
  zero features either way, and outputs exist only at active sites.
* A **regular (strided)** sparse conv equals a dense strided conv masked to
  the *dilated* active set — a site is output-active iff its receptive
  field touches an input-active site, i.e. a 3x3/stride-2/pad-1 max-pool of
  the mask.
* The reference geometry has a **single occupied z-plane**: the voxel
  z-extent is 8 m over a z range of 8 m (conf_aim.py:16-18), so every
  occupied voxel sits at z-index 0 of the 41-deep grid. Each 3D kernel
  therefore reduces to one z-slice: the central slice (kd=1) for
  submanifold convs and for the z-padded strided convs of stages 1-2, and
  slice kd=0 for stage-3's strided conv (encoder_paddings z-pad 0,
  conf_aim.py:210) and for conv_out (kernel (3,1,1), stride (2,1,1),
  padding 0).
* The final ``dense().view(N, C*D, H, W)`` interleaves the D=2 output
  z-planes per channel; plane 1 is never active, so BEV channel 2c is
  feature c and channel 2c+1 is identically zero. The interleaving is
  load-bearing: downstream consumers (BEVFuseLayer, head trunk) were
  trained against this channel order.

BatchNorm runs on active-site statistics only in spconv (BN1d over the
feature list); the replica reproduces this with flax's masked BatchNorm in
training and plain running stats in eval. Norm hyperparams follow mmdet3d's
SparseEncoder default norm_cfg: eps 1e-3, torch momentum 0.01 (flax 0.99).

Deviation kept from the dense encoder: no 25 000-voxel cap (a CUDA buffer
bound; keeping every pillar is strictly more information — see
ops/voxelize.py). ``exact_point_cap`` reproduces the first-15-points VFE
subsampling for bit-parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import LidarEncoderConf
from ..ops.voxelize import voxelize_pillars_dense

__all__ = ['ImportSparseEncoder']

_BN_EPS = 1e-3       # mmdet3d SparseEncoder norm_cfg eps
_BN_MOMENTUM = 0.99  # torch momentum 0.01


def _bn(axis_name, dtype, name):
    return nn.BatchNorm(use_running_average=None, momentum=_BN_MOMENTUM,
                        epsilon=_BN_EPS, axis_name=axis_name, dtype=dtype,
                        name=name)


class _MaskedConvBN(nn.Module):
    """conv(no bias) + masked BN + ReLU, zeroed outside the active set.

    Replicates one make_sparse_convmodule unit (order ('conv','norm','act')).
    The post-BN mask multiply is what keeps the dense replica exact: the BN
    affine would otherwise leave nonzero garbage at inactive sites for the
    next conv to gather.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask_out, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    name='conv')(x)
        x = _bn(self.bn_axis_name, x.dtype, 'bn')(
            x, use_running_average=not train,
            mask=(mask_out > 0) if train else None)
        return nn.relu(x * mask_out)


class _SparseBasicBlockDense(nn.Module):
    """mmdet3d SparseBasicBlock (two submanifold 3x3 convs + residual) as a
    masked dense block. Param naming mirrors the torch module (conv1/bn1/
    conv2/bn2) so the converter maps 1:1."""
    features: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        bn_mask = (mask > 0) if train else None
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name='conv1')(x)
        out = _bn(self.bn_axis_name, out.dtype, 'bn1')(
            out, use_running_average=not train, mask=bn_mask)
        out = nn.relu(out * mask)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name='conv2')(out)
        out = _bn(self.bn_axis_name, out.dtype, 'bn2')(
            out, use_running_average=not train, mask=bn_mask)
        # x is already zero outside the mask, so the sum stays masked
        return nn.relu(out * mask + x)


def _dilate_stride2(mask):
    """Active set of a 3x3/stride-2/pad-1 regular sparse conv."""
    return nn.max_pool(mask, (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)])


class ImportSparseEncoder(nn.Module):
    """Drop-in lidar encoder with SparseEncoder-importable weights.

    Same call contract as LidarBEVEncoder: (points, point_mask) ->
    [B, ny/8, nx/8, 256] NHWC BEV (channel-interleaved feature/zero, see
    module docstring).
    """
    conf: LidarEncoderConf
    pc_range: Tuple[float, ...]
    voxel_size: Tuple[float, float, float]
    grid_hw: Tuple[int, int]
    bn_axis_name: Optional[str] = None
    exact_point_cap: bool = True

    def __call__(self, points, point_mask, train: bool = False,
                 compute_dtype=jnp.float32):
        vconf = self.conf.voxelization
        cap = vconf.max_num_points if self.exact_point_cap else None

        def vox(p, m):
            return voxelize_pillars_dense(
                p, m, self.pc_range, self.voxel_size, self.grid_hw,
                num_features=vconf.num_features, max_points_per_voxel=cap,
                return_count=True)

        grid, count = jax.vmap(vox)(points, point_mask)  # [B,ny,nx,5],[...,1]
        occ = (count > 0).astype(compute_dtype)
        return self.encode(grid.astype(compute_dtype), occ, train)

    @nn.compact
    def encode(self, grid, occ, train: bool = False):
        """grid [B, ny, nx, F] (zero at inactive pillars), occ [B, ny, nx, 1]
        -> [B, ny/8, nx/8, 256]."""
        chs = self.conf.encoder_channels
        m = occ.astype(grid.dtype)
        x = _MaskedConvBN(chs[0][0], bn_axis_name=self.bn_axis_name,
                          name='conv_input')(grid, m, train)
        for si, stage in enumerate(chs):
            n_down = 1 if si < len(chs) - 1 else 0
            for j in range(len(stage) - n_down):
                x = _SparseBasicBlockDense(
                    stage[j], bn_axis_name=self.bn_axis_name,
                    name=f'stage{si}_block{j}')(x, m, train)
            if n_down:
                m = _dilate_stride2(m)
                x = _MaskedConvBN(stage[-1], stride=2,
                                  bn_axis_name=self.bn_axis_name,
                                  name=f'stage{si}_down')(x, m, train)
        x = _MaskedConvBN(self.conf.out_channels // 2, kernel=1,
                          bn_axis_name=self.bn_axis_name,
                          name='conv_out')(x, m, train)
        # dense().view(N, C*D, H, W) with D=2 and plane 1 inactive:
        # interleave features with zeros -> channel 2c = feat c, 2c+1 = 0
        b, h, w, c = x.shape
        return jnp.stack([x, jnp.zeros_like(x)], axis=-1).reshape(
            b, h, w, 2 * c)

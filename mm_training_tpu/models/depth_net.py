"""DepthNet + ASPP + deformable conv (flax, NHWC).

(The reference also defines SELayer/Mlp, lss_fpn.py:120-157, but never calls
them — torch_import skips their dormant context_se weights; they are not
reproduced here.)

Re-design of the reference's depth/context head (layers/backbones/lss_fpn.py:
16-248): reduce conv -> context 1x1 (80ch) in parallel with a depth branch of
3 BasicBlocks + ASPP + deformable conv + 1x1 to the depth bins.

The mmcv CUDA DCN op (lss_fpn.py:189-197: 3x3, conv groups 4, deform_groups 1)
becomes a gather-based deformable conv: a zero-initialized offset conv predicts
per-tap (dy, dx), the nine taps are bilinearly sampled (pure XLA gathers), and
the tap-weighted sum is one einsum on the MXU. Zero-init offsets make it exact
to a regular 3x3 conv at initialization — the standard DCN init.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, ConvBN

__all__ = ['DepthNet', 'ASPP', 'DeformConv2d']


class DeformConv2d(nn.Module):
    """Gather-based deformable 3x3 conv (DCNv1 semantics, deform_groups=1).

    TPU shape discipline (trace-driven, BASELINE.md round 3): everything
    flat-2D. The four bilinear corners are gathered as [B, H*W*9, C] row
    gathers from the flattened [H*W, C] map (out-of-image corners get
    weight 0 against index-clipped rows — identical zero-padding semantics
    to sampling with zeros outside), combined on flat rows, and contracted
    with the kernel over (tap, in-channel) jointly in one grouped
    dot_general. The earlier [B,H,W,9,C] formulation made XLA materialize
    ~12-15 ms/step of pure layout copies around the einsum.
    """
    features: int
    groups: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = 3
        nt = k * k
        offsets = nn.Conv(2 * nt, (k, k), padding='SAME',
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name='conv_offset')(x)                    # [B,H,W,18]
        offsets = offsets.astype(jnp.float32).reshape(b, h, w, nt, 2)

        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        ky = jnp.arange(k, dtype=jnp.float32) - (k // 2)
        base_dy, base_dx = jnp.meshgrid(ky, ky, indexing='ij')
        base = jnp.stack([base_dy.reshape(-1), base_dx.reshape(-1)], -1)  # [9,2]

        py = (ys[None, :, :, None] + base[None, None, None, :, 0]
              + offsets[..., 0]).reshape(b, h * w * nt)
        px = (xs[None, :, :, None] + base[None, None, None, :, 1]
              + offsets[..., 1]).reshape(b, h * w * nt)

        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy = py - y0
        wx = px - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        # four flat row gathers, one per bilinear corner. (A corner-PAIR
        # [2, C]-slice lax.gather variant was measured 8x SLOWER end to end
        # — XLA lowers sliced gathers off the fast row-gather path — so the
        # simple take_along_axis form stays.)
        xf = x.reshape(b, h * w, c)
        sampled = jnp.zeros((b, h * w * nt, c), x.dtype)
        for dy, dx, cw in ((0, 0, (1 - wy) * (1 - wx)),
                           (0, 1, (1 - wy) * wx),
                           (1, 0, wy * (1 - wx)),
                           (1, 1, wy * wx)):
            yi = y0i + dy
            xi = x0i + dx
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            rows = jnp.take_along_axis(xf, flat[..., None], axis=1)
            cwm = jnp.where(inb, cw, 0.0).astype(x.dtype)
            sampled = sampled + rows * cwm[..., None]

        g = self.groups
        cg = c // g
        og = self.features // g
        # he init with the TRUE per-group fan-in 9*cg: variance_scaling
        # counts every leading dim of (nt, g, cg, og) as receptive field,
        # overcounting fan-in by g — scale by g to compensate (same class
        # of compensation as the s2d stem's 64/49 factor in resnet.py)
        wgt = self.param('kernel',
                         nn.initializers.variance_scaling(
                             2.0 * g, 'fan_in', 'truncated_normal'),
                         (nt, g, cg, og), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # contract (tap, cg) jointly per group: one MXU pass, no 5D layouts
        samp = sampled.reshape(b, h * w, nt, g, cg)
        out = jnp.einsum('bntgc,tgco->bngo', samp, wgt.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, h, w, self.features)
        return out + bias.astype(x.dtype)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (lss_fpn.py:47-117): dilations
    1/6/12/18 + global-average branch, concat -> 1x1 -> BN -> ReLU -> dropout."""
    mid_channels: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = self.mid_channels
        x1 = ConvBN(m, 1, 1, bn_axis_name=self.bn_axis_name)(x, train)
        x2 = ConvBN(m, 3, 1, dilation=6, bn_axis_name=self.bn_axis_name)(x, train)
        x3 = ConvBN(m, 3, 1, dilation=12, bn_axis_name=self.bn_axis_name)(x, train)
        x4 = ConvBN(m, 3, 1, dilation=18, bn_axis_name=self.bn_axis_name)(x, train)

        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBN(m, 1, 1, bn_axis_name=self.bn_axis_name)(g, train)
        g = jnp.broadcast_to(g, x4.shape[:3] + (m,))

        out = jnp.concatenate([x1, x2, x3, x4, g], axis=-1)
        out = ConvBN(m, 1, 1, bn_axis_name=self.bn_axis_name)(out, train)
        out = nn.Dropout(0.5, deterministic=not train)(out)
        return out


class DepthNet(nn.Module):
    """Depth/context head (lss_fpn.py:160-248).

    Returns [B, fH, fW, depth_channels + context_channels] — depth logits
    first, context after, matching the reference's channel concat order.
    """
    mid_channels: int
    context_channels: int
    depth_channels: int
    use_dcn: bool = True
    num_blocks: int = 3  # the reference's 3 BasicBlocks (lss_fpn.py:181-188)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.mid_channels, 3, 1, bn_axis_name=self.bn_axis_name,
                   name='reduce_conv')(x, train)
        context = nn.Conv(self.context_channels, (1, 1), name='context_conv')(x)

        d = x
        for i in range(self.num_blocks):
            d = BasicBlock(self.mid_channels, bn_axis_name=self.bn_axis_name,
                           name=f'depth_block{i}')(d, train)
        d = ASPP(self.mid_channels, bn_axis_name=self.bn_axis_name,
                 name='aspp')(d, train)
        if self.use_dcn:
            d = DeformConv2d(self.mid_channels, groups=4, name='dcn')(d)
        depth = nn.Conv(self.depth_channels, (1, 1), name='depth_pred')(d)
        return jnp.concatenate([depth, context], axis=-1)

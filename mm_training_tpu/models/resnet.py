"""flax ResNet backbones (NHWC).

Replaces the mmdet/torchvision ResNets the reference builds from config:
  * ResNet-50 image backbone (conf_aim.py:53-61, built at lss_fpn.py:293)
  * ResNet-18-style BEV trunk (conf_aim.py:100-110: base 160, 3 stages,
    strides (1,2,2), built at bev_depth_head.py:75)

Both use the mmdet "pytorch" style: 7x7/2 stem + 3x3/2 maxpool, stride on the
3x3 conv inside bottlenecks. BatchNorm uses flax's batch_stats collection; an
optional ``bn_axis_name`` syncs statistics across a mesh axis (the TPU
equivalent of SyncBN — the reference relied on per-device BN under DDP, so
leave it None for parity).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .bn_fold import batch_norm

__all__ = ['ResNet', 'BasicBlock', 'Bottleneck', 'resnet_stage_channels',
           'stem_s2d_mask', 'stem_s2d_from_7x7', 'stem_7x7_from_s2d']


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_relu: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False)(x)
        x = batch_norm(self, x, train, axis_name=self.bn_axis_name)
        if self.use_relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """mmdet BasicBlock (expansion 1) — also used inside DepthNet
    (lss_fpn.py:184-187)."""
    features: int
    stride: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBN(self.features, 3, self.stride,
                     bn_axis_name=self.bn_axis_name)(x, train)
        out = ConvBN(self.features, 3, 1, use_relu=False,
                     bn_axis_name=self.bn_axis_name)(out, train)
        if identity.shape[-1] != self.features or self.stride != 1:
            identity = ConvBN(self.features, 1, self.stride, use_relu=False,
                              bn_axis_name=self.bn_axis_name)(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """mmdet Bottleneck (expansion 4, stride on the 3x3)."""
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBN(self.features, 1, 1, bn_axis_name=self.bn_axis_name)(x, train)
        out = ConvBN(self.features, 3, self.stride,
                     bn_axis_name=self.bn_axis_name)(out, train)
        out = ConvBN(self.features * 4, 1, 1, use_relu=False,
                     bn_axis_name=self.bn_axis_name)(out, train)
        if identity.shape[-1] != self.features * 4 or self.stride != 1:
            identity = ConvBN(self.features * 4, 1, self.stride, use_relu=False,
                              bn_axis_name=self.bn_axis_name)(x, train)
        return nn.relu(out + identity)


_DEPTH_CFG = {
    10: (BasicBlock, (1, 1, 1, 1)),  # smoke/dryrun tier: one block per stage
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


def resnet_stage_channels(depth: int, base_channels: int, num_stages: int) -> Tuple[int, ...]:
    block, _ = _DEPTH_CFG[depth]
    exp = 4 if block is Bottleneck else 1
    return tuple(base_channels * (2 ** i) * exp for i in range(num_stages))


def _stem_tap_map():
    """Single source of truth for the space-to-depth stem tap mapping.

    The 7x7/stride-2 stem conv is EXACTLY a 4x4/stride-1 conv on the
    2x2-space-to-depth'd image (MLPerf ResNet trick): tap (m, d) of the
    blocked conv reads original pixel 2(p+m)+d, i.e. original kernel tap
    k = 2m + d + 3. k is out of [0, 7) only for (m=-2, d=0) per axis; those
    blocked-kernel positions have no 7x7 counterpart and are masked to zero
    so the parameterization stays bijective with the reference stem (import
    AND export are exact, including after training).

    Returns (my, mx, block, ky, kx) tuples: blocked tap [my, mx] channel
    group ``block`` (dy*2+dx) <-> 7x7 tap [ky, kx]."""
    taps = []
    for my in range(4):
        for dy in range(2):
            ky = 2 * (my - 2) + dy + 3
            if not 0 <= ky < 7:
                continue
            for mx in range(4):
                for dx in range(2):
                    kx = 2 * (mx - 2) + dx + 3
                    if not 0 <= kx < 7:
                        continue
                    taps.append((my, mx, dy * 2 + dx, ky, kx))
    return taps


def stem_s2d_from_7x7(w7: np.ndarray) -> np.ndarray:
    """HWIO [7,7,cin,cout] stem kernel -> the exact space-to-depth
    [4,4,4*cin,cout] kernel."""
    _, _, cin, cout = w7.shape
    w4 = np.zeros((4, 4, 4 * cin, cout), w7.dtype)
    for my, mx, blk, ky, kx in _stem_tap_map():
        w4[my, mx, blk * cin:(blk + 1) * cin] = w7[ky, kx]
    return w4


def stem_7x7_from_s2d(w4: np.ndarray) -> np.ndarray:
    """Exact inverse of stem_s2d_from_7x7. Asserts the structurally-masked
    taps are zero (guaranteed by the masked init + masked gradients in
    _S2DStem) — a nonzero masked tap has no 7x7 counterpart, so discarding
    it silently would make the export lossy."""
    _, _, cin4, cout = w4.shape
    cin = cin4 // 4
    w7 = np.zeros((7, 7, cin, cout), w4.dtype)
    for my, mx, blk, ky, kx in _stem_tap_map():
        w7[ky, kx] = w4[my, mx, blk * cin:(blk + 1) * cin]
    leak = w4 * (1.0 - stem_s2d_mask(cin, cout)).astype(w4.dtype)
    assert not np.abs(leak).any(), (
        'space-to-depth stem kernel has nonzero structurally-masked taps — '
        'the blocked form no longer maps exactly onto a 7x7 kernel')
    return w7


def stem_s2d_mask(cin: int, features: int) -> np.ndarray:
    """Structural 0/1 kernel mask for the space-to-depth stem (derived from
    the tap map — see _stem_tap_map)."""
    mask = np.zeros((4, 4, 4 * cin, features), np.float32)
    for my, mx, blk, _, _ in _stem_tap_map():
        mask[my, mx, blk * cin:(blk + 1) * cin] = 1.0
    return mask


def space_to_depth_2x2(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] blocking; channel-group order is
    (row-offset, col-offset) minor — the convention the s2d stem's tap map
    and the weight converters depend on. Shared by _S2DStem and the lidar
    encoder."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    xb = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


class _S2DStem(nn.Module):
    """s2d(2) + masked 4x4 conv + BN + ReLU == the 7x7/2 stem, exactly.

    Param tree mirrors ConvBN (Conv_0/BatchNorm_0) so the weight converters
    treat both stems uniformly. Why: the 3-channel 7x7 conv runs at ~7% MXU
    utilization (3-deep contractions); blocked to 12 input channels at half
    resolution the same math is ~4x denser."""
    features: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        xb = space_to_depth_2x2(x)

        # zero the structurally-masked taps at init too: the call-time mask
        # gives them zero gradient (and zero weight decay at zero), so they
        # stay zero forever and the stored kernel remains BIT-bijective with
        # the 7x7 form — export/import roundtrips exactly even from a fresh
        # init, not only from converted weights. Variance is scaled by
        # 64/49 to compensate for the zeroed taps: the live fan-in is the
        # 7x7 stem's 49*cin, not the dense blocked 64*cin — matching the
        # plain stem's lecun init distribution exactly.
        def masked_lecun(key, shape, dtype=jnp.float32):
            w = nn.initializers.variance_scaling(
                64.0 / 49.0, 'fan_in', 'truncated_normal')(key, shape, dtype)
            return w * stem_s2d_mask(c, self.features).astype(dtype)
        # mask in x.dtype: flax computes kernel*mask BEFORE dtype promotion,
        # so an fp32 mask would promote the bf16-cast kernel — and, by
        # promotion chaining, the ENTIRE downstream network — back to fp32
        # (measured: 8.0 -> 5.9 samples/s). 0/1 values are exact in bf16.
        x = nn.Conv(self.features, (4, 4), strides=(1, 1),
                    padding=[(2, 1), (2, 1)], use_bias=False,
                    kernel_init=masked_lecun,
                    mask=jnp.asarray(stem_s2d_mask(c, self.features),
                                     x.dtype))(xb)
        x = batch_norm(self, x, train, axis_name=self.bn_axis_name)
        return nn.relu(x)


class ResNet(nn.Module):
    """Configurable mmdet-style ResNet returning multi-scale features.

    Stem: 7x7/2 conv (base_channels) + BN + ReLU + 3x3/2 maxpool, so stage i
    with config stride s_i sits at total stride 4 * prod(s_1..s_i). For the
    BEV trunk (depth 18, strides (1,2,2)) this yields levels at /4, /8, /16
    of the input — which is why the reference head's neck (x8/x16/x32
    deconvs) emits a map at 2x the head input (bev_depth_head.py:108-110).

    ``stem_s2d`` runs the stem as the exact space-to-depth equivalent (see
    _S2DStem) — used for the image backbone where the input has 3 channels.
    """
    depth: int = 50
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    bn_axis_name: Optional[str] = None
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = _DEPTH_CFG[self.depth]
        if self.stem_s2d:
            x = _S2DStem(self.base_channels, bn_axis_name=self.bn_axis_name,
                         name='stem')(x, train)
        else:
            x = ConvBN(self.base_channels, 7, 2,
                       bn_axis_name=self.bn_axis_name, name='stem')(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        width = self.base_channels
        for i in range(self.num_stages):
            for j in range(stage_blocks[i]):
                stride = self.strides[i] if j == 0 else 1
                x = block_cls(width, stride, bn_axis_name=self.bn_axis_name,
                              name=f'layer{i + 1}_{j}')(x, train)
            if i in self.out_indices:
                outs.append(x)
            width *= 2
        return tuple(outs)

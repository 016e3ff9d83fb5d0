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

__all__ = ['ResNet', 'BasicBlock', 'Bottleneck', 'resnet_stage_channels']


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
        # dtype=x.dtype: without it flax promotes to the fp32 of the running
        # stats in training, silently turning every downstream conv fp32
        # (statistics are still computed in fp32 internally)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis_name,
                         dtype=x.dtype)(x)
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
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


def resnet_stage_channels(depth: int, base_channels: int, num_stages: int) -> Tuple[int, ...]:
    block, _ = _DEPTH_CFG[depth]
    exp = 4 if block is Bottleneck else 1
    return tuple(base_channels * (2 ** i) * exp for i in range(num_stages))


class ResNet(nn.Module):
    """Configurable mmdet-style ResNet returning multi-scale features.

    Stem: 7x7/2 conv (base_channels) + BN + ReLU + 3x3/2 maxpool, so stage i
    with config stride s_i sits at total stride 4 * prod(s_1..s_i). For the
    BEV trunk (depth 18, strides (1,2,2)) this yields levels at /4, /8, /16
    of the input — which is why the reference head's neck (x8/x16/x32
    deconvs) emits a map at 2x the head input (bev_depth_head.py:108-110).
    """
    depth: int = 50
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = _DEPTH_CFG[self.depth]
        x = ConvBN(self.base_channels, 7, 2, bn_axis_name=self.bn_axis_name,
                   name='stem')(x, train)
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

"""SECONDFPN neck (flax, NHWC).

Replaces mmdet3d's SECONDFPN, used twice by the reference:
  * image neck: in [256,512,1024,2048], strides [0.25,0.5,1,2] -> 4x128ch
    concat at /16 (conf_aim.py:62-68)
  * BEV neck: in [160,320,640], strides [8,16,32] -> 3x64ch concat
    (conf_aim.py:112-115)

Per level: stride > 1 -> ConvTranspose(kernel=stride, stride=stride);
stride <= 1 -> Conv(kernel=stride^-1, stride=stride^-1); each followed by
BN + ReLU; outputs concatenated on channels (mmdet3d SECONDFPN semantics).

TPU note: a kernel==stride transposed conv has non-overlapping taps, but
XLA lowers lax.conv_transpose as an input-dilated convolution — at the BEV
neck's stride-16/32 levels that convolves mostly zeros and measured ~86 ms
of a 350 ms train step on v5e. ``Upsample`` below computes the identical
result as one einsum (a per-cell projection) + depth-to-space reshape,
keeping the exact ConvTranspose parameter shape/name so checkpoints and
the torch converters are unaffected.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .bn_fold import batch_norm

__all__ = ['SECONDFPN']


class Upsample(nn.Module):
    """ConvTranspose(kernel=s, stride=s, VALID, no bias) as matmul + d2s.

    Parameter layout matches flax ConvTranspose ([kH, kW, I, O]); flax's
    conv_transpose does not mirror the kernel, so the einsum indexes it
    spatially reversed to stay numerically identical.
    """
    features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        s = self.stride
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (s, s, x.shape[-1], self.features), jnp.float32)
        b, h, w, _ = x.shape
        y = jnp.einsum('bhwc,ijco->bhiwjo', x, k[::-1, ::-1].astype(x.dtype),
                       preferred_element_type=x.dtype)
        return y.reshape(b, h * s, w * s, self.features)


class SECONDFPN(nn.Module):
    out_channels: Sequence[int]
    upsample_strides: Sequence[float]
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.out_channels) == len(self.upsample_strides)
        outs = []
        for i, (x, ch, us) in enumerate(zip(feats, self.out_channels,
                                            self.upsample_strides)):
            if us >= 1:
                s = int(round(us))
                x = Upsample(ch, s, name=f'deblock{i}_conv')(x)
            else:
                s = int(round(1 / us))
                x = nn.Conv(ch, (s, s), strides=(s, s), padding='VALID',
                            use_bias=False, name=f'deblock{i}_conv')(x)
            x = batch_norm(self, x, train, axis_name=self.bn_axis_name,
                           name=f'deblock{i}_bn')
            outs.append(nn.relu(x))
        return jnp.concatenate(outs, axis=-1)

"""BEV fusion layer (flax, NHWC).

Parity with the reference's BEVFuseLayer (models/bev_depth.py:133-145):
3x3 conv -> global-avg-pool -> 1x1 conv -> sigmoid channel gate.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ['BEVFuseLayer']


class BEVFuseLayer(nn.Module):
    in_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.in_channels, (3, 3), padding='SAME', name='conv_3')(x)
        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(self.in_channels, (1, 1), name='conv_1')(w)
        return x * nn.sigmoid(w)

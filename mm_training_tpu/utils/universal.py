"""numpy/JAX-agnostic array API — the evaluator's backend layer.

Re-design of utils/universal.py: the reference papers over numpy-vs-torch
differences so its evaluator can run on either (utils/eval.py:11 is the
only consumer of its ~90 wrappers). Here the two backends are numpy and
jax.numpy, and the surface is deliberately CUT to what the evaluator
(evaluation/bev_map.py) actually routes through — round-2 review feedback:
a delegate without a real consumer is padding, not parity. Semantics follow
numpy where the reference's torch/numpy behaviors differed.

The practical payoff mirrors the reference's: ``evaluate_ap`` accepts
decode outputs as device (jax) arrays directly, with host conversion
happening exactly at the scipy/curve-math boundary.
"""
from __future__ import annotations

import enum

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    _JAX = True
except ImportError:  # pragma: no cover
    jnp = None
    _JAX = False

__all__ = ['Type', 'get_type', 'get_xp', 'is_tensor_or_ndarray', 'to_numpy',
           'to_tensor', 'to_float', 'abs', 'cumsum', 'maximum', 'minimum',
           'clip', 'where', 'argsort', 'index_select', 'masked_select',
           'concatenate', 'stack']


class Type(enum.Enum):
    numpy = 'numpy'
    jax = 'jax'


def get_type(x) -> Type:
    if _JAX and isinstance(x, jax.Array):
        return Type.jax
    if isinstance(x, np.ndarray):
        return Type.numpy
    raise TypeError(f'not an array: {type(x)}')


def get_xp(x):
    """The array namespace (np or jnp) for x."""
    return jnp if (_JAX and isinstance(x, jax.Array)) else np


def is_tensor_or_ndarray(t) -> bool:
    return isinstance(t, np.ndarray) or (_JAX and isinstance(t, jax.Array))


# ------------------------------------------------------------- conversions

def to_numpy(t, detach=True):
    return np.asarray(t)


def to_tensor(t, device=None):
    out = jnp.asarray(t)
    if device is not None:
        out = jax.device_put(out, device)
    return out


def to_float(a):
    xp = get_xp(a)
    return a.astype(xp.float32)


# ------------------------------------------------------------- elementwise

def abs(a):  # noqa: A001 - reference name (universal.py shadows builtins too)
    return get_xp(a).abs(a)


def cumsum(a, axis=None):
    return get_xp(a).cumsum(a, axis=axis)


def minimum(a, b):
    return get_xp(a).minimum(a, b)


def maximum(a, b):
    return get_xp(a).maximum(a, b)


def where(condition, a, b):
    # dispatch on the operand like every other wrapper: a numpy condition
    # over jax operands must not pull the operands to host
    return get_xp(a).where(condition, a, b)


def clip(a, a_min, a_max):
    return get_xp(a).clip(a, a_min, a_max)


# -------------------------------------------------------- select / combine

def argsort(a, axis):
    return get_xp(a).argsort(a, axis=axis)


def index_select(array, indices, axis=0):
    return get_xp(array).take(array, indices, axis=axis)


def masked_select(array, mask):
    if _JAX and isinstance(array, jax.Array):
        # dynamic output shape: a host op by nature
        return jnp.asarray(np.asarray(array)[np.asarray(mask)])
    return array[np.asarray(mask)]


def concatenate(arrays, axis=0):
    return get_xp(arrays[0]).concatenate(arrays, axis=axis)


def stack(arrays, axis=0):
    return get_xp(arrays[0]).stack(arrays, axis=axis)

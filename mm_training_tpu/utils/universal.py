"""numpy/JAX-agnostic array API.

Re-design of utils/universal.py (1262 LoC): the reference papers over
numpy-vs-torch differences so the evaluator can run on either; here the two
backends are numpy and jax.numpy. Same public function names; semantics
follow numpy where the two originals differed. An inline unittest mirrors
the reference's embedded Tests class (utils/universal.py:1235-1262).

Only the evaluator consumes this in the reference; it is provided as a
first-class utility for parity.
"""
from __future__ import annotations

import builtins
import enum
import unittest

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    _JAX = True
except ImportError:  # pragma: no cover
    jnp = None
    _JAX = False

__all__ = ['Type', 'get_type', 'get_xp', 'to_numpy', 'to_tensor']


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


# ------------------------------------------------------------------- unary
def _wrap1(name):
    def fn(array, *a, **kw):
        return getattr(get_xp(array), name)(array, *a, **kw)
    fn.__name__ = name
    return fn


abs = _wrap1('abs')
sqrt = _wrap1('sqrt')
log = _wrap1('log')
exp = _wrap1('exp')
floor = _wrap1('floor')
ceil = _wrap1('ceil')
square = _wrap1('square')
isnan = _wrap1('isnan')
isfinite = _wrap1('isfinite')
cumsum = _wrap1('cumsum')


def relu(a):
    return get_xp(a).maximum(a, 0)


def sigmoid(x):
    xp = get_xp(x)
    return 1.0 / (1.0 + xp.exp(-x))


def logsigmoid(x):
    xp = get_xp(x)
    return -xp.logaddexp(0, -x)


def atanh(y):
    return get_xp(y).arctanh(y)


def pow(a, exponent):
    return get_xp(a).power(a, exponent)


def round(array, dtype=None):
    out = get_xp(array).round(array)
    return out.astype(dtype) if dtype is not None else out


# --------------------------------------------------------------- reductions
def sum(array, axis=None, keepdims=False):
    return get_xp(array).sum(array, axis=axis, keepdims=keepdims)


def mean(array, axis=None, keepdims=False):
    return get_xp(array).mean(array, axis=axis, keepdims=keepdims)


def median(array):
    return get_xp(array).median(array)


def std(array, axis=None, keepdims=False):
    # reference uses the torch convention (ddof=1) for torch inputs but
    # numpy's ddof=0 for numpy; numpy semantics chosen for determinism
    return get_xp(array).std(array, axis=axis, keepdims=keepdims)


def amin(array, axis=None, keepdims=False):
    return get_xp(array).min(array, axis=axis, keepdims=keepdims)


def amax(array, axis=None, keepdims=False):
    return get_xp(array).max(array, axis=axis, keepdims=keepdims)


def all(array):
    return bool(get_xp(array).all(array))


def any(array):
    return bool(get_xp(array).any(array))


def argmax(a, axis, keepdims=False):
    out = get_xp(a).argmax(a, axis=axis)
    return get_xp(a).expand_dims(out, axis) if keepdims else out


def argmin(a, axis, keepdims=False):
    out = get_xp(a).argmin(a, axis=axis)
    return get_xp(a).expand_dims(out, axis) if keepdims else out


def argsort(a, axis):
    return get_xp(a).argsort(a, axis=axis)


def histogram(array, bins: int, range: tuple):
    xp = get_xp(array)
    return xp.histogram(array, bins=bins, range=range)


def unique(array, return_counts: bool = False):
    if get_type(array) is Type.jax:
        array = np.asarray(array)  # dynamic shapes: host op
    return np.unique(array, return_counts=return_counts)


# -------------------------------------------------------------- elementwise
def lerp(start, end, weight):
    return start + weight * (end - start)


def minimum(a, b):
    return get_xp(a).minimum(a, b)


def maximum(a, b):
    return get_xp(a).maximum(a, b)


def where(condition, a, b):
    return get_xp(condition).where(condition, a, b)


def clip(a, a_min, a_max):
    return get_xp(a).clip(a, a_min, a_max)


def atan2(y, x):
    return get_xp(y).arctan2(y, x)


def isin(array, positive_set):
    if get_type(array) is Type.jax:
        return jnp.isin(array, jnp.asarray(list(positive_set)))
    return np.isin(array, list(positive_set))


# ----------------------------------------------------------- select/indexing
def index_select(array, indices, axis=0):
    return get_xp(array).take(array, indices, axis=axis)


def masked_select(array, mask):
    if get_type(array) is Type.jax:
        return jnp.asarray(np.asarray(array)[np.asarray(mask)])
    return array[mask]


def gather(_sentinel=None, array=None, indices=None, axis: int = None):
    assert _sentinel is None, 'pass array/indices/axis by keyword'
    return get_xp(array).take_along_axis(array, indices, axis=axis)


# ----------------------------------------------------------- shape plumbing
def swap_axes(array, i, j):
    return get_xp(array).swapaxes(array, i, j)


def ndim(array):
    return array.ndim


def shape(array):
    return tuple(array.shape)


def volume(array):
    return int(np.prod(array.shape))


def item(x):
    return x.item() if hasattr(x, 'item') else x


def reshape(a, new_shape):
    return get_xp(a).reshape(a, new_shape)


def flatten(a):
    return get_xp(a).reshape(a, (-1,))


def expand_dims(a, axis):
    return get_xp(a).expand_dims(a, axis)


def squeeze(a, axis=None):
    return get_xp(a).squeeze(a, axis=axis)


def transpose(t, axes):
    return get_xp(t).transpose(t, axes)


def flip(a, axis):
    return get_xp(a).flip(a, axis=axis)


def tile(array, reps):
    return get_xp(array).tile(array, reps)


def left_broadcast(input, template):
    """Broadcast ``input`` against the *leading* dims of template (the
    reference broadcasts from the left, unlike numpy's right-aligned rule)."""
    extra = template.ndim - input.ndim
    return input.reshape(tuple(input.shape) + (1,) * extra)


def pad(t, pad, mode='constant', fill_value=0):
    xp = get_xp(t)
    if mode == 'constant':
        return xp.pad(t, pad, mode=mode, constant_values=fill_value)
    return xp.pad(t, pad, mode=mode)


def squeeze_to_2d(img):
    """[1, H, W] / [H, W, 1] / [H, W] -> [H, W] (utils/universal.py:1148)."""
    out = img
    if out.ndim == 3:
        if out.shape[0] == 1:
            out = out[0]
        elif out.shape[-1] == 1:
            out = out[..., 0]
    assert out.ndim == 2, f'cannot squeeze {img.shape} to 2d'
    return out


# ------------------------------------------------------------ constructors
def zeros_like(array, shape=None, dtype=None):
    xp = get_xp(array)
    return xp.zeros(shape or array.shape, dtype or array.dtype)


def ones_like(array, shape=None, dtype=None):
    xp = get_xp(array)
    return xp.ones(shape or array.shape, dtype or array.dtype)


def empty_like(array, shape=None, dtype=None):
    return zeros_like(array, shape, dtype)


def full_like(array, fill_value, shape=None, dtype=None):
    xp = get_xp(array)
    return xp.full(shape or array.shape, fill_value, dtype or array.dtype)


def concatenate(arrays, axis=0):
    return get_xp(arrays[0]).concatenate(arrays, axis=axis)


def stack(arrays, axis=0):
    return get_xp(arrays[0]).stack(arrays, axis=axis)


def unstack(array, axis=0):
    return [get_xp(array).take(array, i, axis=axis)
            for i in builtins.range(array.shape[axis])]


def split(array, num_or_size_splits, axis):
    xp = get_xp(array)
    if isinstance(num_or_size_splits, int):
        return xp.split(array, num_or_size_splits, axis=axis)
    offsets = np.cumsum(num_or_size_splits)[:-1]
    return xp.split(array, offsets, axis=axis)


# ---------------------------------------------------------------- linalg
def inverse(matrix):
    xp = get_xp(matrix)
    return (jnp.linalg if xp is jnp else np.linalg).inv(matrix)


def batch_inverse(array):
    return inverse(array)  # both backends batch natively


def batch_matmul(a, b):
    return get_xp(a).matmul(a, b)


# ------------------------------------------------------------- conversions
def cast(a, new_type: Type):
    if new_type is Type.numpy:
        return to_numpy(a)
    return to_tensor(a)


def to_float(a):
    xp = get_xp(a)
    return a.astype(xp.float32)


def to_numpy(t, detach=True):
    return np.asarray(t)


def to_tensor(t, device=None):
    out = jnp.asarray(t)
    if device is not None:
        out = jax.device_put(out, device)
    return out


def to_tensors(*arrays):
    return tuple(to_tensor(a) for a in arrays)


def copy(a):
    return get_xp(a).array(a)


def ascontiguousarray(t):
    return np.ascontiguousarray(t) if get_type(t) is Type.numpy else t


def cast_like(t, template, cast_dtype=True):
    out = to_tensor(t) if get_type(template) is Type.jax else to_numpy(t)
    return out.astype(template.dtype) if cast_dtype else out


def get_device(t):
    if get_type(t) is Type.jax:
        return builtins.list(t.devices())[0]
    return 'cpu'


def random_normal_like(a, mean, std, rng=None):
    rng = rng or np.random.default_rng()
    out = rng.normal(mean, std, size=a.shape).astype(np.float32)
    return cast_like(out, a)


# ------------------------------------------------------ structure traversal
def is_namedtuple(x):
    return isinstance(x, tuple) and hasattr(x, '_fields')


def apply_recursively(data, transform, filter=None, keep_namedtuples=True,
                      apply_on_struct=False):
    """Apply transform to every (filtered) leaf of nested dict/list/tuple."""
    def rec(x):
        if isinstance(x, dict):
            return {k: rec(v) for k, v in x.items()}
        if is_namedtuple(x) and keep_namedtuples:
            return type(x)(*[rec(v) for v in x])
        if isinstance(x, (builtins.list, tuple)):
            t = type(x)
            return t(rec(v) for v in x)
        if filter is None or filter(x):
            return transform(x)
        return x
    if apply_on_struct:
        return transform(data)
    return rec(data)


def apply_to_tensors(data, transform):
    return apply_recursively(data, transform, filter=is_tensor_or_ndarray)


def apply_to_nd_tensors(data, transform, n):
    return apply_recursively(
        data, transform,
        filter=lambda x: is_tensor_or_ndarray(x) and x.ndim == n)


def downsample2x_chw(t, interpolate: bool = True):
    """[C, H, W] 2x spatial downsample (avg when interpolate else stride)."""
    if interpolate:
        c, h, w = t.shape
        return t[:, :h - h % 2, :w - w % 2].reshape(
            c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    return t[:, ::2, ::2]


# ------------------------------------------------------------------- tests
class Tests(unittest.TestCase):
    """Inline unittest mirroring the reference (universal.py:1235-1262)."""

    def _both(self, x):
        yield np.asarray(x)
        if _JAX:
            yield jnp.asarray(x)

    def test_reductions_and_unary(self):
        for a in self._both([[1.0, 4.0], [9.0, 16.0]]):
            self.assertAlmostEqual(float(sum(a)), 30.0)
            self.assertAlmostEqual(float(mean(a)), 7.5)
            np.testing.assert_allclose(to_numpy(sqrt(a)),
                                       [[1, 2], [3, 4]])
            self.assertEqual(shape(a), (2, 2))
            self.assertEqual(volume(a), 4)

    def test_gather_and_select(self):
        for a in self._both([[1, 2], [3, 4]]):
            xp = get_xp(a)
            idx = xp.asarray([[1], [0]])
            np.testing.assert_array_equal(
                to_numpy(gather(array=a, indices=idx, axis=1)), [[2], [3]])
            np.testing.assert_array_equal(
                to_numpy(index_select(a, xp.asarray([1]), axis=0)), [[3, 4]])

    def test_pad_split_stack(self):
        for a in self._both([[1.0, 2.0]]):
            p = pad(a, ((0, 0), (1, 1)), fill_value=7)
            np.testing.assert_array_equal(to_numpy(p), [[7, 1, 2, 7]])
            s = stack([a, a], axis=0)
            self.assertEqual(shape(s), (2, 1, 2))
            parts = split(s, [1, 1], axis=0)
            self.assertEqual(len(parts), 2)

    def test_conversions(self):
        a = np.ones((2, 2), np.float32)
        self.assertIs(get_type(a), Type.numpy)
        if _JAX:
            t = to_tensor(a)
            self.assertIs(get_type(t), Type.jax)
            np.testing.assert_array_equal(to_numpy(t), a)
            self.assertIs(get_type(cast_like(a, t)), Type.jax)

    def test_left_broadcast(self):
        a = np.ones((2,))
        t = np.ones((2, 3, 4))
        self.assertEqual(left_broadcast(a, t).shape, (2, 1, 1))


if __name__ == '__main__':
    unittest.main()

"""utils.universal: the numpy/jax backend layer under the evaluator.

Every function is exercised on BOTH backends and cross-checked — the surface
is exactly what evaluation/bev_map.py consumes (see the module docstring for
why it was cut to that)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mm_training_tpu.utils import universal as U


@pytest.fixture(params=['numpy', 'jax'])
def xp_pair(request):
    """(convert, backend_type) for each backend."""
    if request.param == 'numpy':
        return np.asarray, U.Type.numpy
    return jnp.asarray, U.Type.jax


def test_type_dispatch(xp_pair):
    conv, t = xp_pair
    a = conv(np.arange(3.0))
    assert U.get_type(a) is t
    assert U.is_tensor_or_ndarray(a)
    assert not U.is_tensor_or_ndarray([1, 2])
    assert U.get_xp(a).add(a, a) is not None
    with pytest.raises(TypeError):
        U.get_type('nope')


def test_conversions(xp_pair):
    conv, _ = xp_pair
    a = conv(np.arange(3))
    assert isinstance(U.to_numpy(a), np.ndarray)
    assert U.get_type(U.to_tensor(np.arange(3))) is U.Type.jax
    assert U.to_float(a).dtype == np.float32


def test_elementwise_match_numpy(xp_pair):
    conv, _ = xp_pair
    x = np.asarray([-2.0, 0.5, 3.0, -0.25])
    a = conv(x)
    np.testing.assert_allclose(U.to_numpy(U.abs(a)), np.abs(x))
    np.testing.assert_allclose(U.to_numpy(U.cumsum(a)), np.cumsum(x))
    np.testing.assert_allclose(U.to_numpy(U.maximum(a, 0.0)),
                               np.maximum(x, 0.0))
    np.testing.assert_allclose(U.to_numpy(U.minimum(a, 0.0)),
                               np.minimum(x, 0.0))
    np.testing.assert_allclose(U.to_numpy(U.clip(a, -1.0, 1.0)),
                               np.clip(x, -1.0, 1.0))
    np.testing.assert_allclose(U.to_numpy(U.where(a > 0, a, -a)),
                               np.where(x > 0, x, -x))


def test_select_and_combine(xp_pair):
    conv, _ = xp_pair
    x = np.asarray([[3.0, 1.0], [2.0, 4.0], [0.0, 5.0]])
    a = conv(x)
    idx = U.to_numpy(U.argsort(a[:, 0], axis=-1))
    np.testing.assert_array_equal(idx, [2, 1, 0])
    np.testing.assert_allclose(U.to_numpy(U.index_select(a, idx)),
                               x[idx])
    mask = np.asarray([True, False, True])
    np.testing.assert_allclose(U.to_numpy(U.masked_select(a, mask)), x[mask])
    np.testing.assert_allclose(U.to_numpy(U.concatenate([a, a], 0)),
                               np.concatenate([x, x], 0))
    np.testing.assert_allclose(U.to_numpy(U.stack([a[:, 0], a[:, 1]], -1)), x)


def test_object_arrays_stay_numpy():
    """img_name columns are object arrays — select ops must handle them."""
    names = np.asarray(['a', 'b', 'c'], object)
    np.testing.assert_array_equal(U.index_select(names, np.asarray([2, 0])),
                                  ['c', 'a'])
    np.testing.assert_array_equal(
        U.masked_select(names, np.asarray([True, False, True])), ['a', 'c'])

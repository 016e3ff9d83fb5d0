"""Run the inline unittest suite of utils.universal on both backends, plus a
couple of behaviors the inline suite doesn't cover."""
import unittest

import numpy as np

from mm_training_tpu.utils import universal as U


def test_inline_suite():
    result = unittest.TestResult()
    unittest.defaultTestLoader.loadTestsFromTestCase(U.Tests).run(result)
    assert result.wasSuccessful(), (result.failures, result.errors)


def test_apply_recursively_structures():
    data = {'a': np.ones(2), 'b': [np.zeros(3), 'keep'], 'c': ('x', np.full(2, 2.0))}
    out = U.apply_to_tensors(data, lambda t: t + 1)
    np.testing.assert_array_equal(out['a'], [2, 2])
    np.testing.assert_array_equal(out['b'][0], [1, 1, 1])
    assert out['b'][1] == 'keep'
    np.testing.assert_array_equal(out['c'][1], [3, 3])


def test_downsample2x_chw():
    t = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    avg = U.downsample2x_chw(t)
    np.testing.assert_allclose(avg[0, 0, 0], np.mean([0, 1, 4, 5]))
    assert U.downsample2x_chw(t, interpolate=False).shape == (1, 2, 2)


def test_unique_and_isin():
    a = np.asarray([3, 1, 3, 2])
    vals, counts = U.unique(a, return_counts=True)
    np.testing.assert_array_equal(vals, [1, 2, 3])
    np.testing.assert_array_equal(counts, [1, 1, 2])
    np.testing.assert_array_equal(U.isin(a, {1, 3}), [True, True, True, False])

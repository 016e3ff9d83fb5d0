"""Space-to-depth stem exactness.

The image backbone's 7x7/stride-2 stem (mmdet ResNet, torchvision naming
conv1/bn1) can be run as a 4x4/stride-1 conv on the 2x2-space-to-depth'd
image (MLPerf ResNet trick; models/resnet.py:_S2DStem). These tests pin the
claim that the rewrite is EXACT in both directions:

  - kernel roundtrip 7x7 -> s2d -> 7x7 is the identity,
  - the s2d kernel is zero exactly where the structural mask is zero,
  - ResNet(stem_s2d=True) with converted weights equals
    ResNet(stem_s2d=False) with the original weights on every output level,
  - export of a *trained* (randomly re-initialized) s2d stem re-imports to
    the same forward (bijectivity under the mask).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mm_training_tpu.models import ResNet  # noqa: E402
from mm_training_tpu.models.resnet import stem_s2d_mask  # noqa: E402
from mm_training_tpu.models.torch_import import (  # noqa: E402
    convert_torchvision_resnet, stem_7x7_from_s2d, stem_s2d_from_7x7)
from test_torch_import import _make_state_dict  # noqa: E402


def test_kernel_roundtrip_identity():
    rng = np.random.default_rng(0)
    w7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    w4 = stem_s2d_from_7x7(w7)
    assert w4.shape == (4, 4, 12, 64)
    np.testing.assert_array_equal(stem_7x7_from_s2d(w4), w7)


def test_kernel_respects_structural_mask():
    rng = np.random.default_rng(1)
    w7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32) + 1.0  # no zeros
    w4 = stem_s2d_from_7x7(w7)
    mask = stem_s2d_mask(3, 64)
    # converted kernel is zero exactly where the mask is zero, and every
    # unmasked tap carries a (nonzero) 7x7 tap
    np.testing.assert_array_equal(w4 * (1 - mask), np.zeros_like(w4))
    assert np.all(w4[mask == 1.0] != 0.0)
    # 49 of the 64 blocked taps are live per (cin, cout) pair
    assert mask[:, :, ::3, 0].sum() == 49


def test_stem_conv_exact_float64():
    """The rewrite is algebraically exact: in float64 the two convs agree to
    machine epsilon (so any fp32 model-level diff is rounding, not padding)."""
    from jax import lax
    with jax.enable_x64():
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 64, 96, 3))
        w7 = rng.normal(size=(7, 7, 3, 8))
        w4 = stem_s2d_from_7x7(w7).astype(np.float64)
        y7 = lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        b, h, w, c = x.shape
        xb = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        y4 = lax.conv_general_dilated(
            xb, w4, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        assert y7.shape == y4.shape
        assert float(jnp.abs(y7 - y4).max()) < 1e-12


def _forward(depth, variables, x, stem_s2d):
    model = ResNet(depth=depth, out_indices=(0, 1, 2, 3), stem_s2d=stem_s2d)
    return jax.jit(lambda v, y: model.apply(v, y, train=False))(variables, x)


def test_s2d_resnet_matches_plain_resnet():
    gen = torch.Generator().manual_seed(7)
    sd = {k: v.numpy() for k, v in _make_state_dict(18, gen).items()}
    x = np.random.default_rng(2).normal(size=(2, 64, 96, 3)).astype(np.float32)

    p_plain, s_plain = convert_torchvision_resnet(sd, 18, stem_s2d=False)
    p_s2d, s_s2d = convert_torchvision_resnet(sd, 18, stem_s2d=True)
    outs_plain = _forward(18, {'params': p_plain, 'batch_stats': s_plain},
                          x, False)
    outs_s2d = _forward(18, {'params': p_s2d, 'batch_stats': s_s2d}, x, True)
    assert len(outs_plain) == len(outs_s2d) == 4
    for a, b in zip(outs_plain, outs_s2d):
        assert a.shape == b.shape
        # same algebra, different fp32 contraction order: rounding noise
        # amplified through 18 BN/ReLU layers of *random* weights (the
        # float64 test above pins algebraic exactness)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=2e-3)


@pytest.mark.slow
def test_trained_s2d_stem_exports_exactly():
    """A freshly initialized s2d stem (masked taps nonzero in the raw param
    tree — flax masks them at apply time) must export -> re-import to the
    same forward: the export path reads only the structurally valid taps."""
    from mm_training_tpu.models.torch_export import export_mmdet_resnet
    model = ResNet(depth=18, out_indices=(0, 1, 2, 3), stem_s2d=True)
    x = np.random.default_rng(3).normal(size=(1, 32, 32, 3)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out0 = _forward(18, variables, x, True)

    sd = export_mmdet_resnet(variables['params'], variables['batch_stats'],
                             depth=18, stem_s2d=True)
    assert sd['conv1.weight'].shape == (64, 3, 7, 7)
    p, s = convert_torchvision_resnet(sd, 18, stem_s2d=True)
    out1 = _forward(18, {'params': p, 'batch_stats': s}, x, True)
    for a, b in zip(out0, out1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

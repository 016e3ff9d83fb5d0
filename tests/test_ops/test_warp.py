import jax.numpy as jnp
import numpy as np

from mm_training_tpu.ops import bda_bev_warp, hflip, resize_bilinear, warp_affine_nhwc


def test_identity_warp_is_noop():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
    mat = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    out = np.asarray(warp_affine_nhwc(jnp.asarray(img), mat))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_translation_warp():
    img = np.zeros((1, 6, 6, 1), np.float32)
    img[0, 2, 3, 0] = 1.0
    mat = jnp.asarray([[[1, 0, 1], [0, 1, 2], [0, 0, 1]]], jnp.float32)  # +1 x, +2 y
    out = np.asarray(warp_affine_nhwc(jnp.asarray(img), mat))
    assert out[0, 4, 4, 0] == 1.0
    assert out.sum() == 1.0


def test_bda_flip_dx_mirrors_x_axis():
    """flip_dx (x -> -x in ego coords) must mirror the BEV along its W axis
    about the (W-1)/2 center, matching models/bev_depth.py:69-84."""
    img = np.zeros((1, 4, 8, 1), np.float32)
    img[0, 1, 2, 0] = 1.0
    bda = np.eye(4, dtype=np.float32)
    bda[0, 0] = -1.0
    out = np.asarray(bda_bev_warp(jnp.asarray(img), jnp.asarray(bda)[None]))
    assert abs(out[0, 1, 5, 0] - 1.0) < 1e-5   # x' = (W-1) - x = 7 - 2 = 5
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-5)


def test_bda_rotation_90deg():
    img = np.zeros((1, 9, 9, 1), np.float32)
    img[0, 4, 6, 0] = 1.0  # +2 in x from center
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    bda = np.eye(4, dtype=np.float32)
    bda[:2, :2] = [[c, -s], [s, c]]
    out = np.asarray(bda_bev_warp(jnp.asarray(img), jnp.asarray(bda)[None]))
    assert abs(out[0, 6, 4, 0] - 1.0) < 1e-4   # rotated to +2 in y


def test_bda_scale_is_applied():
    """A uniform BDA scale must actually scale the BEV about the CENTER
    pixel: bda's z row carries scale_ratio at [2,2], and the homogeneous
    divide used to cancel it exactly, leaving camera features unscaled
    while boxes/points WERE scaled. The center convention is a deliberate
    deviation from the reference (bev_depth.py:83 truncates to 2x3, which
    leaks s into the translation and scales about pixel (0,0)) — metric
    (0,0) lands at ((W-1)/2, (H-1)/2) on the symmetric grid, so center is
    what aligns with the metrically-scaled lidar BEV and targets."""
    img = np.zeros((1, 17, 17, 1), np.float32)
    img[0, 8, 12, 0] = 1.0  # +4 in x from the (8, 8) center
    bda = np.eye(4, dtype=np.float32) * 2.0
    bda[3, 3] = 1.0
    out = np.asarray(bda_bev_warp(jnp.asarray(img), jnp.asarray(bda)[None]))
    # dst(q) = src(M^-1 q): the delta at +4 lands at +8 from center
    assert abs(out[0, 8, 16, 0] - 1.0) < 1e-4, out[0, 8].ravel()
    # and a pure-scale warp of a linear ramp matches the analytic form
    ramp = np.broadcast_to(np.arange(17.0, dtype=np.float32)[None, :, None],
                           (17, 17, 1))[None]
    out = np.asarray(bda_bev_warp(jnp.asarray(ramp), jnp.asarray(bda)[None]))
    xs = np.arange(17.0)
    expect = (xs - 8.0) / 2.0 + 8.0
    np.testing.assert_allclose(out[0, 8, :, 0], expect, atol=1e-4)


def test_hflip():
    img = jnp.arange(12.0).reshape(1, 2, 6, 1)
    out = np.asarray(hflip(img))
    np.testing.assert_allclose(out[0, 0, :, 0], np.arange(6.0)[::-1])


def test_resize_doubles():
    img = jnp.ones((1, 4, 8, 3))
    out = resize_bilinear(img, (8, 16))
    assert out.shape == (1, 8, 16, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_bda_bev_warp_preserves_bf16():
    """Regression: fp32 bilinear coordinate weights must not promote a bf16
    BEV map — promotion chained through concat/fuse/head drags the whole
    downstream network to fp32 (the measured resnet mask-cast pitfall
    class)."""
    x = jnp.ones((1, 8, 8, 4), jnp.bfloat16)
    m = jnp.eye(4)[None]
    assert bda_bev_warp(x, m).dtype == jnp.bfloat16

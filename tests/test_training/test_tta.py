"""TTA tests: the flip ensemble returns canonical-parameterization maps and
is consistent with the plain forward for a symmetric model state."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR, decode_boxes
from mm_training_tpu.training.tta import tta_forward


@pytest.mark.slow
def test_tta_shapes_and_decode():
    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           use_tta=True)
    model = BEVDepthLiDAR(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg, seed=0).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)

    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch, None, False)

    plain, plain_depth, _, _ = model.apply(variables, batch, None, False)
    tta, tta_depth = tta_forward(cfg, model, variables, batch, None)

    # the identity branch's depth_pred rides along (no 5th forward needed)
    if plain_depth is not None:
        np.testing.assert_allclose(np.asarray(tta_depth),
                                   np.asarray(plain_depth))
    assert len(tta) == len(plain)
    for p, t in zip(plain, tta):
        assert set(p.keys()) == set(t.keys())
        for k in p:
            assert p[k].shape == t[k].shape
            assert np.all(np.isfinite(np.asarray(t[k], np.float32)))

    # decode accepts the ensembled maps (fixed shapes)
    conf = cfg.get_head_conf()
    boxes, scores, labels, valid = decode_boxes(conf, tta)
    cap = conf.test_cfg.post_max_size * len(conf.tasks)
    assert boxes.shape == (cfg.batch_size, cap, 9)
    s = np.asarray(scores)
    assert np.all((s >= 0) & (s <= 1))


def test_tta_yaw_correction_is_a_reflection():
    """Regression (reference deviation): negating the x axis is a
    REFLECTION, so the x-flip yaw correction must be pi - rot; the
    reference's rot - pi (mm_training_aim.py:475) cancels the sine of every
    yaw across the 4-way average. For an exactly flip-equivariant synthetic
    prediction, the corrected map of every flip member must equal the
    canonical map, so the ensembled yaw stays the true yaw."""
    from mm_training_tpu.training.tta import _correct_pred

    rng = np.random.default_rng(0)
    H, W = 6, 8
    theta = rng.uniform(-np.pi, np.pi, (1, H, W)).astype(np.float32)
    vel = rng.normal(size=(1, H, W, 2)).astype(np.float32)

    def canonical():
        return {'rot': np.stack([np.sin(theta), np.cos(theta)], -1),
                'vel': vel}

    for fx in (1.0, -1.0):
        for fy in (1.0, -1.0):
            # what an exactly equivariant model would predict on the
            # flipped cloud: spatially flipped maps (W is x, H is y) with
            # yaw reflected per-axis and velocity sign-flipped
            th = theta.copy()
            vl = vel.copy()
            if fx < 0:
                th = np.pi - th
                vl = vl * np.asarray([-1.0, 1.0], np.float32)
                th, vl = th[:, :, ::-1], vl[:, :, ::-1]
            if fy < 0:
                th = -th
                vl = vl * np.asarray([1.0, -1.0], np.float32)
                th, vl = th[:, ::-1], vl[:, ::-1]
            pred = {'rot': jnp.asarray(
                        np.stack([np.sin(th), np.cos(th)], -1)),
                    'vel': jnp.asarray(np.ascontiguousarray(vl))}
            out = _correct_pred(pred, fx, fy)
            ref = canonical()
            np.testing.assert_allclose(np.asarray(out['rot']), ref['rot'],
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(out['vel']), ref['vel'],
                                       atol=1e-6)

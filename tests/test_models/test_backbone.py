import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.models import LSSFPN, ResNet, SECONDFPN


@pytest.mark.slow
def test_resnet18_bev_trunk_strides():
    """mmdet-style trunk: stem /4, stages at /4, /8, /16 — the property that
    makes the head output 2x its input (see SURVEY quirks)."""
    model = ResNet(depth=18, base_channels=16, num_stages=3, strides=(1, 2, 2),
                   out_indices=(0, 1, 2))
    x = jnp.zeros((1, 32, 64, 8))
    var = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(var, x)
    assert [o.shape for o in outs] == [(1, 8, 16, 16), (1, 4, 8, 32), (1, 2, 4, 64)]


@pytest.mark.slow
def test_resnet50_channels():
    model = ResNet(depth=50, out_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    var = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(var, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_second_fpn_image_neck():
    """Image-neck configuration: strides (0.25, 0.5, 1, 2) align all levels
    at /16 and concat to 512 channels (conf_aim.py:62-68)."""
    neck = SECONDFPN(out_channels=(128, 128, 128, 128),
                     upsample_strides=(0.25, 0.5, 1, 2))
    feats = [jnp.zeros((1, 16, 16, 256)), jnp.zeros((1, 8, 8, 512)),
             jnp.zeros((1, 4, 4, 1024)), jnp.zeros((1, 2, 2, 2048))]
    var = neck.init(jax.random.PRNGKey(0), feats)
    out = neck.apply(var, feats)
    assert out.shape == (1, 4, 4, 512)


@pytest.mark.slow
def test_lss_fpn_end_to_end_tiny():
    cfg = tiny_test_config(use_cam=True)
    bb = cfg.get_backbone_conf()
    model = LSSFPN(bb)
    b, s, n = 1, 1, 2
    h, w = bb.final_dim
    imgs = jnp.zeros((b, s, n, h, w, 3))
    s2e = jnp.broadcast_to(jnp.eye(4), (b, s, n, 4, 4))
    # a plausible pinhole intrinsic
    intr = jnp.array([[100.0, 0, w / 2, 0], [0, 100.0, h / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
    intr = jnp.broadcast_to(intr, (b, s, n, 4, 4))
    flipped = jnp.zeros((b * s * n,), bool)

    var = model.init(jax.random.PRNGKey(0), imgs, s2e, intr, flipped)
    bev, depth = model.apply(var, imgs, s2e, intr, flipped)
    bh, bw = bb.bev_hw
    assert bev.shape == (b, bh, bw, bb.output_channels)
    assert depth.shape == (b * n, h // 16, w // 16, bb.depth_channels)
    # depth is a softmax distribution
    np.testing.assert_allclose(np.asarray(depth.sum(-1)), 1.0, atol=1e-4)

"""Multi-sweep camera path (lss_fpn.py:469-529 parity): non-key sweeps are
stop-gradient and concat on channels."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.models import LSSFPN


@pytest.mark.slow
def test_two_sweep_forward_concats_channels():
    cfg = tiny_test_config(use_cam=True)
    bb = cfg.get_backbone_conf()
    model = LSSFPN(bb)
    b, s, n = 1, 2, 2
    h, w = bb.final_dim
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (b, s, n, h, w, 3))
    s2e = jnp.broadcast_to(jnp.eye(4), (b, s, n, 4, 4))
    intr = jnp.array([[100.0, 0, w / 2, 0], [0, 100.0, h / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
    intr = jnp.broadcast_to(intr, (b, s, n, 4, 4))
    flipped = jnp.zeros((b * s * n,), bool)

    var = jax.jit(model.init, static_argnums=(6,))(
        key, imgs, s2e, intr, flipped, None, False)
    bev, depth = model.apply(var, imgs, s2e, intr, flipped)
    bh, bw = bb.bev_hw
    assert bev.shape == (b, bh, bw, s * bb.output_channels)  # channel concat
    assert depth.shape == (b * n, h // 16, w // 16, bb.depth_channels)

    # gradient flows only through the key sweep: d(bev)/d(imgs[:,1]) == 0
    def key_sum(img_in):
        out, _ = model.apply(var, img_in, s2e, intr, flipped)
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(key_sum)(imgs)
    assert float(jnp.abs(g[:, 0]).sum()) > 0      # key sweep learns
    assert float(jnp.abs(g[:, 1]).sum()) == 0.0   # no_grad sweep (parity)

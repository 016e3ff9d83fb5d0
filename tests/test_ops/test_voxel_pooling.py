"""Golden test for voxel pooling: JAX op vs. a pure-python triple-loop
scatter-add, mirroring the reference's own validation strategy
(test/test_ops/test_voxel_pooling.py:12-37) — but CPU-runnable."""
import jax
import jax.numpy as jnp
import numpy as np

from mm_training_tpu.ops import lift_splat, voxel_pooling


def _reference_voxel_pooling(geom, feats, voxel_num):
    nx, ny, nz = voxel_num
    b, n, c = feats.shape
    out = np.zeros((b, ny, nx, c), np.float32)
    for bi in range(b):
        for pi in range(n):
            x, y, z = geom[bi, pi]
            if 0 <= x < nx and 0 <= y < ny and 0 <= z < nz:
                out[bi, y, x] += feats[bi, pi]
    return out


def test_voxel_pooling_matches_loop_reference():
    rng = np.random.default_rng(0)
    b, n, c = 2, 500, 8
    voxel_num = (16, 12, 1)
    geom = rng.integers(-3, 18, size=(b, n, 3)).astype(np.int32)
    geom[..., 2] = rng.integers(-1, 2, size=(b, n))
    feats = rng.normal(size=(b, n, c)).astype(np.float32)

    got = np.asarray(voxel_pooling(jnp.asarray(geom), jnp.asarray(feats), voxel_num))
    want = _reference_voxel_pooling(geom, feats, voxel_num)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lift_splat_equals_materialized_outer_product():
    """The factorized (ray-matrix @ context) splat must equal scatter-adding
    the full depth (x) context outer product per frustum point."""
    rng = np.random.default_rng(1)
    m, d, p, c, g = 3, 20, 40, 16, 50
    depth = rng.random((m, d, p)).astype(np.float32)
    ctx = rng.normal(size=(m, p, c)).astype(np.float32)
    idx = rng.integers(0, g + 1, size=(m, d, p)).astype(np.int32)  # g == trash

    got = np.asarray(lift_splat(jnp.asarray(depth), jnp.asarray(ctx),
                                jnp.asarray(idx), g))

    want = np.zeros((m, g, c), np.float32)
    for mi in range(m):
        for di in range(d):
            for pi in range(p):
                cell = idx[mi, di, pi]
                if cell < g:
                    want[mi, cell] += depth[mi, di, pi] * ctx[mi, pi]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lift_splat_matrix_variant_matches_lift_splat():
    """The MatrixVT-style ray-matrix formulation (lift_splat_matrix) is an
    algebraic rearrangement of lift_splat — identical output on the same
    inputs (it exists as the documented alternative formulation and a
    benchmark comparator; this pins that it stays equivalent)."""
    from mm_training_tpu.ops import lift_splat_matrix
    rng = np.random.default_rng(2)
    m, d, p, c, g = 2, 12, 24, 8, 30
    depth = jnp.asarray(rng.random((m, d, p)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(m, p, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, g + 1, size=(m, d, p)).astype(np.int32))
    a = np.asarray(lift_splat(depth, ctx, idx, g))
    b = np.asarray(lift_splat_matrix(depth, ctx, idx, g))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_voxel_pooling_gradient_is_gather():
    """VJP parity with the reference backward (voxel_pooling.py:57-69):
    d(out)/d(feat_i) routes the output-cell gradient back to each in-bounds
    point."""
    geom = jnp.array([[[0, 0, 0], [1, 1, 0], [1, 1, 0], [-1, 2, 0]]], jnp.int32)
    feats = jnp.ones((1, 4, 2), jnp.float32)

    def loss(f):
        out = voxel_pooling(geom, f, (4, 4, 1))
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * w)

    g = jax.grad(loss)(feats)
    out_grad = np.arange(4 * 4 * 2, dtype=np.float32).reshape(4, 4, 2)
    np.testing.assert_allclose(np.asarray(g[0, 0]), out_grad[0, 0])
    np.testing.assert_allclose(np.asarray(g[0, 1]), out_grad[1, 1])
    np.testing.assert_allclose(np.asarray(g[0, 2]), out_grad[1, 1])
    np.testing.assert_allclose(np.asarray(g[0, 3]), 0.0)  # out of bounds


def test_factorized_splat_matches_general_path():
    """lift_splat_factorized == lift_splat through the full LSSFPN on a
    zero-roll/pitch rig (the virtualized-camera invariant it relies on)."""
    import dataclasses

    import jax
    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.data.fake_batch import make_fake_batch
    from mm_training_tpu.models.lss_fpn import LSSFPN
    from mm_training_tpu.training.train_step import normalize_images

    cfg = tiny_test_config(use_cam=True, use_lidar=False, use_radar=False,
                           batch_size=2)
    bb = cfg.get_backbone_conf()
    assert bb.factorized_splat  # the production default
    batch = make_fake_batch(cfg, seed=0)
    imgs = normalize_images(jnp.asarray(batch['imgs']))
    s2e = jnp.asarray(batch['sensor2ego'])
    intr = jnp.asarray(batch['intrin'])
    b, s, n = imgs.shape[:3]
    flipped = jnp.zeros((b * s * n,), bool)

    model_f = LSSFPN(bb)
    model_g = LSSFPN(dataclasses.replace(bb, factorized_splat=False))
    variables = jax.jit(model_f.init, static_argnums=(6,))(
        jax.random.PRNGKey(0), imgs, s2e, intr, flipped, None, False)

    bev_f, depth_f = model_f.apply(variables, imgs, s2e, intr, flipped,
                                   None, False)
    bev_g, depth_g = model_g.apply(variables, imgs, s2e, intr, flipped,
                                   None, False)
    np.testing.assert_allclose(np.asarray(depth_f), np.asarray(depth_g))
    diff = float(jnp.max(jnp.abs(bev_f - bev_g)))
    scale = float(jnp.max(jnp.abs(bev_g))) + 1e-9
    assert diff / scale < 1e-5, (diff, scale)

"""Deploy-time conv-BN folding (models/bn_fold.py, the mmcv fuse_conv_bn
equivalent): the folded params + bias-only FoldedBN modules must reproduce
the eval-mode forward of the unfolded model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.models.bn_fold import batch_norm, fold_conv_bn

from tests.test_models.test_torch_export import (_init_variables,
                                                 _randomized)


@pytest.mark.slow
def test_folded_forward_matches_eval_bn():
    """Full tiny fusion model, randomized params AND running stats: fold,
    apply the SAME model object to the folded tree (folded-ness is read
    from the weights), compare every head map + the depth logits — then
    re-apply the unfolded tree to prove nothing leaked between the two."""
    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True)
    model, batch, variables = _init_variables(cfg)
    variables = _randomized(variables)

    ref_preds, ref_depth, _, _ = model.apply(variables, batch, None, False)

    p2, s2, n = fold_conv_bn(variables['params'], variables['batch_stats'])
    assert n >= 20, f'only {n} conv+BN pairs folded'
    # every BN scope this model traces as foldable lost its stats
    assert not jax.tree_util.tree_leaves(s2), 'dense tiny model folds fully'
    got_preds, got_depth, _, _ = model.apply(
        {'params': p2, 'batch_stats': s2}, batch, None, False)

    for rp, gp in zip(ref_preds, got_preds):
        for k in rp:
            diff = float(jnp.max(jnp.abs(rp[k] - gp[k])))
            assert diff < 2e-3, (k, diff)
    assert float(jnp.max(jnp.abs(ref_depth - got_depth))) < 2e-3

    # unfolded weights still trace real BN after a folded apply
    again_preds, again_depth, _, _ = model.apply(variables, batch, None,
                                                 False)
    for rp, ap in zip(ref_preds, again_preds):
        for k in rp:
            np.testing.assert_array_equal(np.asarray(rp[k]),
                                          np.asarray(ap[k]))
    np.testing.assert_array_equal(np.asarray(ref_depth),
                                  np.asarray(again_depth))


def test_folded_param_tree_shape():
    """The folded tree: BN scopes hold only {'bias'}, conv biases zeroed,
    kernels rescaled by scale/sqrt(var+eps) on the output-channel axis."""
    cfg = tiny_test_config(use_cam=True, use_lidar=False, use_radar=False)
    _, _, variables = _init_variables(cfg)
    variables = _randomized(variables)
    p, s = variables['params'], variables['batch_stats']
    p2, _, n = fold_conv_bn(p, s)
    assert n > 0

    flat = dict(jax.tree_util.tree_leaves_with_path(p))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    assert set(jax.tree_util.keystr(k) for k in flat2) <= \
        set(jax.tree_util.keystr(k) for k in flat)  # no new leaf names
    # spot-check one ConvBN pair end to end
    sub = p2
    ref_p, ref_s = p, s
    while 'Conv_0' not in sub:
        key = next(k for k, v in sub.items() if isinstance(v, dict))
        sub, ref_p, ref_s = sub[key], ref_p[key], ref_s.get(key, {})
    svec = (np.asarray(ref_p['BatchNorm_0']['scale'])
            / np.sqrt(np.asarray(ref_s['BatchNorm_0']['var']) + 1e-5))
    np.testing.assert_allclose(
        np.asarray(sub['Conv_0']['kernel']),
        np.asarray(ref_p['Conv_0']['kernel']) * svec, rtol=1e-6)
    assert set(sub['BatchNorm_0']) == {'bias'}


def test_sparse_encoder_stats_pass_through():
    """The lidar sparse encoder's BNs (names 'bn', 'bn1'… match no pairing
    rule; eps=1e-3; post-BN mask semantics) must NOT fold — their params
    and running stats pass through untouched."""
    from mm_training_tpu.configs import LidarEncoderConf, VoxelizationConf
    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True)
    cfg = cfg.replace(lidar_conf=LidarEncoderConf(
        variant='sparse_import',
        voxelization=VoxelizationConf(max_num_points=8, max_voxels=256)))
    _, _, variables = _init_variables(cfg)
    p2, s2, n = fold_conv_bn(variables['params'], variables['batch_stats'])
    assert n > 0  # the BEV trunk/neck/head still fold
    remaining = [jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_leaves_with_path(s2)]
    assert remaining and all('lidar_encoder' in k for k in remaining)
    sparse_p = [ks for k, v in jax.tree_util.tree_leaves_with_path(p2)
                if 'lidar_encoder' in (ks := jax.tree_util.keystr(k))
                and 'scale' in ks]
    assert sparse_p  # BN scale params intact inside the sparse encoder


def test_folded_training_raises():
    """Training on FOLDED weights must refuse at trace time; the same
    model trains fine on the unfolded tree (no process state involved)."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            x = nn.Conv(4, (1, 1), use_bias=False)(x)
            return batch_norm(self, x, train)

    m = Tiny()
    x = jnp.ones((1, 4, 4, 4))
    v = m.init(jax.random.PRNGKey(0), x, False)
    p2, s2, n = fold_conv_bn(v['params'], v['batch_stats'])
    assert n == 1
    with pytest.raises(ValueError, match='inference-only'):
        m.apply({'params': p2, 'batch_stats': s2}, x, True,
                mutable=['batch_stats'])
    # unfolded training still works
    m.apply(v, x, True, mutable=['batch_stats'])
    # folded eval works and matches unfolded eval
    ref = m.apply(v, x, False)
    got = m.apply({'params': p2, 'batch_stats': s2}, x, False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

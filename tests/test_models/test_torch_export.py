"""torch_export: flax -> reference-format state dict -> flax round trip.

The export is the inverse of torch_import, so converting an exported
checkpoint back must reproduce the original flax trees — exactly, except
for the documented eval-exact fold (SeparateHead branch-conv biases move
into the following BN's running_mean because mmdet3d's ConvModule has no
conv bias under BN). This is the deploy-back path: models trained here
load into the reference stack.
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_training_tpu.configs import (LidarEncoderConf, VoxelizationConf,
                                     tiny_test_config)
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR
from mm_training_tpu.models import torch_export as te
from mm_training_tpu.models import torch_import as ti

# the only intentionally-inexact leaves (all eval-exact folds, verified
# functionally below): SeparateHead branch-conv biases -> next BN mean;
# DCN bias -> depth_pred bias (the 1x1 conv right after it)
_FOLDED_BIAS = re.compile(r"task\d+.*_conv\d+.*bias|\['dcn'\]\['bias'\]")
_FOLDED_MEAN = re.compile(
    r"task\d+.*_bn\d+.*mean|\['depth_pred'\]\['bias'\]")


def _init_variables(cfg, seed=0):
    model = BEVDepthLiDAR(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_fake_batch(cfg, batch_size=1, seed=1).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(seed), batch, None, False)
    return model, batch, variables


def _randomized(variables, seed=7):
    """Non-default leaves everywhere (incl. batch_stats) so identity bugs
    can't hide behind zeros/ones. Kernels are fan-in-scaled and BN leaves
    stay near their stable ranges so the 50-conv forward doesn't overflow
    (the functional round-trip test runs the full model)."""
    rng = np.random.default_rng(seed)

    def walk(tree, name=''):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        arr = np.asarray(tree)
        if not np.issubdtype(arr.dtype, np.floating):
            return arr
        if name == 'var':
            return rng.uniform(0.5, 1.5, arr.shape).astype(np.float32)
        if name == 'scale':
            return rng.normal(1.0, 0.1, arr.shape).astype(np.float32)
        if name in ('bias', 'mean'):
            return rng.normal(0.0, 0.1, arr.shape).astype(np.float32)
        fan = max(1, int(np.prod(arr.shape[:-1])))
        return rng.normal(0.0, 1.0 / np.sqrt(fan),
                          arr.shape).astype(np.float32)
    out = walk(jax.tree_util.tree_map(np.asarray, variables))
    # preserve the s2d stem's structural invariant: taps with no 7x7
    # counterpart are zero in EVERY real kernel (masked init, masked grads,
    # masked import) — a dense random kernel there is unrepresentable
    stem = out['params']['backbone']['img_backbone']['stem']['Conv_0']
    if stem['kernel'].shape[:2] == (4, 4):
        from mm_training_tpu.models.resnet import stem_s2d_mask
        cin = stem['kernel'].shape[2] // 4
        stem['kernel'] = stem['kernel'] * stem_s2d_mask(
            cin, stem['kernel'].shape[3])
    return out


def _roundtrip(cfg, variables):
    sd = te.export_reference_checkpoint(variables['params'],
                                        variables['batch_stats'], cfg)
    assert all(k.startswith('model.') for k in sd)
    sd = {k[len('model.'):]: v for k, v in sd.items()}
    # dead context_se present so strict reference loads succeed
    assert 'backbone.depth_net.context_se.conv_reduce.weight' in sd
    return ti.convert_reference_checkpoint(sd, cfg)


@pytest.mark.parametrize('lidar_variant', ['sparse_import'])
def test_export_import_roundtrip_bitexact(lidar_variant):
    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True)
    cfg = cfg.replace(lidar_conf=LidarEncoderConf(
        variant=lidar_variant,
        voxelization=VoxelizationConf(max_num_points=8, max_voxels=1024)))
    _, _, variables = _init_variables(cfg)
    variables = _randomized(variables)
    p2, s2 = _roundtrip(cfg, variables)

    orig = {'params': variables['params'], 'stats': variables['batch_stats']}
    got = {'params': p2, 'stats': s2}
    orig_leaves = dict(jax.tree_util.tree_leaves_with_path(orig))
    n_checked = n_folded = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(got):
        key = jax.tree_util.keystr(path)
        ref = orig_leaves[path]
        if _FOLDED_BIAS.search(key):
            np.testing.assert_allclose(np.asarray(leaf), 0.0, err_msg=key)
            n_folded += 1
        elif _FOLDED_MEAN.search(key):
            n_folded += 1  # shifted by the folded bias; checked functionally
        else:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref),
                                          err_msg=key)
            n_checked += 1
    assert n_checked > 200 and n_folded > 0


@pytest.mark.slow
def test_eval_forward_identical_after_roundtrip():
    """The functional invariant: eval-mode forward of the re-imported
    weights equals the original — the bias->BN folds must cancel exactly."""
    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True)
    cfg = cfg.replace(lidar_conf=LidarEncoderConf(
        variant='sparse_import',
        voxelization=VoxelizationConf(max_num_points=8, max_voxels=1024)))
    model, batch, variables = _init_variables(cfg)
    variables = _randomized(variables)
    p2, s2 = _roundtrip(cfg, variables)
    merged = ti.merge_subtree(dict(variables), p2, s2)

    ref_preds, ref_depth, _, _ = model.apply(variables, batch, None, False)
    got_preds, got_depth, _, _ = model.apply(merged, batch, None, False)
    for rp, gp in zip(ref_preds, got_preds):
        for k in rp:
            diff = float(jnp.max(jnp.abs(rp[k] - gp[k])))
            assert diff < 1e-4, (k, diff)
    assert float(jnp.max(jnp.abs(ref_depth - got_depth))) < 1e-4

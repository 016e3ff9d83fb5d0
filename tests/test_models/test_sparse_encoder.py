"""ImportSparseEncoder vs a true gather-based sparse-conv reference.

The reference's lidar middle encoder is an spconv SparseEncoder
(conf_aim.py:202-212). models/sparse_encoder.py claims an exact reduction to
a masked dense 2D network (single occupied z-plane + per-conv z-slice
extraction). These tests prove the claim against an independent numpy
implementation of REAL sparse 3D convolutions (submanifold + regular) that
follows spconv semantics site-by-site — full 3D kernels, dict-of-active-site
gathers, BN with random running stats, the stage-3 z-pad-0 quirk, and the
final dense().view(N, C*D, H, W) plane interleave.

A weight state dict in exact mmcv/mmdet3d naming + layout ([kd,kh,kw,I,O])
is generated here, converted via torch_import.convert_sparse_encoder, and
fed to the flax module — so the converter's tap selection is under test too.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_training_tpu.configs import LidarEncoderConf
from mm_training_tpu.models import torch_import as ti
from mm_training_tpu.models.sparse_encoder import ImportSparseEncoder

BN_EPS = 1e-3
CHANNELS = ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
# reference encoder_paddings ((0,0,1),(0,0,1),(0,0,[0,1,1]),(0,0)): strided
# convs of stages 0-1 pad z, stage 2 does not (basicblock entries unused)
DOWN_PADDINGS = [(1, 1, 1), (1, 1, 1), (0, 1, 1)]


# ---------------------------------------------------------------- numpy ref

def _subm_conv(sites, weight):
    """Submanifold sparse conv: outputs at the input active set only."""
    kd, kh, kw, _, o = weight.shape
    out = {}
    for p in sites:
        acc = np.zeros(o, np.float64)
        for a in range(kd):
            for b in range(kh):
                for c in range(kw):
                    q = (p[0] + a - kd // 2, p[1] + b - kh // 2,
                         p[2] + c - kw // 2)
                    f = sites.get(q)
                    if f is not None:
                        acc = acc + f @ weight[a, b, c]
        out[p] = acc
    return out


def _sparse_conv(sites, weight, stride, padding, out_shape):
    """Regular sparse conv: a site is output-active iff its receptive field
    touches an input-active site (spconv rule)."""
    kd, kh, kw, _, o = weight.shape
    out = {}
    for p, f in sites.items():
        for a in range(kd):
            for b in range(kh):
                for c in range(kw):
                    num = (p[0] + padding[0] - a, p[1] + padding[1] - b,
                           p[2] + padding[2] - c)
                    if any(n % s for n, s in zip(num, stride)):
                        continue
                    q = tuple(n // s for n, s in zip(num, stride))
                    if all(0 <= qi < si for qi, si in zip(q, out_shape)):
                        acc = out.setdefault(q, np.zeros(o, np.float64))
                        acc += f @ weight[a, b, c]
    return out


def _bn_eval(sites, sd, name):
    scale = sd[f'{name}.weight'] / np.sqrt(sd[f'{name}.running_var'] + BN_EPS)
    shift = sd[f'{name}.bias'] - sd[f'{name}.running_mean'] * scale
    return {p: f * scale + shift for p, f in sites.items()}


def _relu(sites):
    return {p: np.maximum(f, 0.0) for p, f in sites.items()}


def _basic_block(sites, sd, prefix):
    out = _relu(_bn_eval(_subm_conv(sites, sd[f'{prefix}.conv1.weight']),
                         sd, f'{prefix}.bn1'))
    out = _bn_eval(_subm_conv(out, sd[f'{prefix}.conv2.weight']),
                   sd, f'{prefix}.bn2')
    return _relu({p: out[p] + sites[p] for p in sites})


def _down_dim(n, k, s, p):
    return (n + 2 * p - k) // s + 1


def np_sparse_encoder(sd, sites, sparse_shape):
    """Full SparseEncoder forward (eval mode) -> dense [C*D, H/8, W/8]."""
    shape = tuple(sparse_shape)
    x = _relu(_bn_eval(_subm_conv(sites, sd['conv_input.0.weight']),
                       sd, 'conv_input.1'))
    for si, stage in enumerate(CHANNELS):
        has_down = si < len(CHANNELS) - 1
        for j in range(len(stage) - (1 if has_down else 0)):
            x = _basic_block(x, sd, f'encoder_layers.encoder_layer{si + 1}.{j}')
        if has_down:
            pad = DOWN_PADDINGS[si]
            shape = tuple(_down_dim(n, 3, 2, p) for n, p in zip(shape, pad))
            pre = f'encoder_layers.encoder_layer{si + 1}.{len(stage) - 1}'
            x = _relu(_bn_eval(
                _sparse_conv(x, sd[f'{pre}.0.weight'], (2, 2, 2), pad, shape),
                sd, f'{pre}.1'))
    shape = (_down_dim(shape[0], 3, 2, 0), shape[1], shape[2])
    x = _relu(_bn_eval(
        _sparse_conv(x, sd['conv_out.0.weight'], (2, 1, 1), (0, 0, 0), shape),
        sd, 'conv_out.1'))
    c = sd['conv_out.0.weight'].shape[-1]
    dense = np.zeros((c,) + shape, np.float64)
    for (d, h, w), f in x.items():
        dense[:, d, h, w] = f
    # out.dense().view(N, C*D, H, W): channel index = c*D + d (interleaved)
    return dense.reshape(c * shape[0], shape[1], shape[2])


# --------------------------------------------------- synthetic state dict

def _make_state_dict(rng, in_channels=5):
    """Random SparseEncoder weights in exact mmcv naming + [kd,kh,kw,I,O]
    layout, with random BN running stats/affine (fresh stats would hide the
    inactive-site BN-pollution masking under test)."""
    sd = {}

    def bn(name, c):
        sd[f'{name}.weight'] = rng.normal(1.0, 0.1, c)
        sd[f'{name}.bias'] = rng.normal(0.0, 0.2, c)
        sd[f'{name}.running_mean'] = rng.normal(0.0, 0.5, c)
        sd[f'{name}.running_var'] = rng.uniform(0.5, 1.5, c)
        sd[f'{name}.num_batches_tracked'] = np.asarray(0)

    def conv(name, ci, co, k=(3, 3, 3)):
        # fan-in-scaled so activations stay O(1) through the 13-conv chain
        # (unscaled weights blow the scale up ~2000x and fp32 rounding with
        # it; the equivalence itself is exact — verified in f64 to 1e-12)
        fan = ci * int(np.prod(k))
        sd[f'{name}.weight'] = rng.normal(0.0, 1.0 / np.sqrt(fan),
                                          k + (ci, co))

    conv('conv_input.0', in_channels, CHANNELS[0][0])
    bn('conv_input.1', CHANNELS[0][0])
    cin = CHANNELS[0][0]
    for si, stage in enumerate(CHANNELS):
        has_down = si < len(CHANNELS) - 1
        for j in range(len(stage) - (1 if has_down else 0)):
            pre = f'encoder_layers.encoder_layer{si + 1}.{j}'
            conv(f'{pre}.conv1', stage[j], stage[j])
            bn(f'{pre}.bn1', stage[j])
            conv(f'{pre}.conv2', stage[j], stage[j])
            bn(f'{pre}.bn2', stage[j])
            cin = stage[j]
        if has_down:
            pre = f'encoder_layers.encoder_layer{si + 1}.{len(stage) - 1}'
            conv(f'{pre}.0', cin, stage[-1])
            bn(f'{pre}.1', stage[-1])
            cin = stage[-1]
    conv('conv_out.0', cin, 128, k=(3, 1, 1))
    bn('conv_out.1', 128)
    return sd


def _random_plane_sites(rng, hw, n, nf=5):
    """Random active pillars on the single occupied z-plane d=0."""
    hidx = rng.choice(hw[0] * hw[1], size=n, replace=False)
    return {(0, int(i // hw[1]), int(i % hw[1])):
            rng.normal(0.0, 1.0, nf) for i in hidx}


def _flax_encoder(grid_hw):
    conf = LidarEncoderConf(variant='sparse_import')
    return ImportSparseEncoder(
        conf, pc_range=(-204.8, -25.6, -5.0, 204.8, 25.6, 3.0),
        voxel_size=(0.2, 0.2, 8.0), grid_hw=grid_hw)


def _encode(model, sd, grid, occ, train=False):
    variables = model.init(jax.random.PRNGKey(0), grid, occ, False,
                           method=ImportSparseEncoder.encode)
    params, stats = ti.convert_sparse_encoder(sd, CHANNELS)
    merged = ti.merge_subtree(variables, params, stats)
    return model.apply(merged, grid, occ, train,
                       method=ImportSparseEncoder.encode), merged


class TestSparseGolden:
    def test_matches_true_sparse_conv(self):
        rng = np.random.default_rng(0)
        hw = (16, 32)
        sd = _make_state_dict(rng)
        sites = _random_plane_sites(rng, hw, n=48)

        ref = np_sparse_encoder(sd, sites, (41,) + hw)  # [256, 2, 4]

        grid = np.zeros((1,) + hw + (5,), np.float32)
        occ = np.zeros((1,) + hw + (1,), np.float32)
        for (_, h, w), f in sites.items():
            grid[0, h, w] = f
            occ[0, h, w] = 1.0
        model = _flax_encoder(hw)
        (out, _) = _encode(model, sd, jnp.asarray(grid), jnp.asarray(occ))

        got = np.transpose(np.asarray(out[0]), (2, 0, 1))  # -> [256, 2, 4]
        scale = max(1.0, float(np.abs(ref).max()))
        diff = float(np.max(np.abs(got - ref))) / scale
        assert diff < 1e-4, f'sparse-vs-dense max rel diff {diff}'
        # the odd (plane-1) channels must be identically zero
        assert np.abs(got[1::2]).max() == 0.0

    def test_empty_input_all_zero(self):
        """No active sites -> all-zero BEV despite nonzero BN affine."""
        rng = np.random.default_rng(1)
        hw = (16, 16)
        sd = _make_state_dict(rng)
        grid = jnp.zeros((1,) + hw + (5,))
        occ = jnp.zeros((1,) + hw + (1,))
        out, _ = _encode(_flax_encoder(hw), sd, grid, occ)
        assert float(jnp.abs(out).max()) == 0.0

    @pytest.mark.slow
    def test_full_call_voxelizes_and_trains(self):
        """points -> voxelize -> encode; train-mode grads exist + finite."""
        rng = np.random.default_rng(2)
        hw = (16, 32)
        model = ImportSparseEncoder(
            LidarEncoderConf(variant='sparse_import'),
            pc_range=(-3.2, -1.6, -5.0, 3.2, 1.6, 3.0),
            voxel_size=(0.2, 0.2, 8.0), grid_hw=hw)
        pts = jnp.asarray(rng.uniform(-3, 3, (1, 200, 8)), jnp.float32)
        mask = jnp.ones((1, 200), bool)
        variables = model.init(jax.random.PRNGKey(0), pts, mask, False)
        out = model.apply(variables, pts, mask, False)
        assert out.shape == (1, hw[0] // 8, hw[1] // 8, 256)

        def loss(p):
            o, _ = model.apply({'params': p, **{k: v for k, v in
                                                variables.items()
                                                if k != 'params'}},
                               pts, mask, True, mutable=['batch_stats'])
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(variables['params'])
        flat = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(x).all()) for x in flat)
        assert any(float(jnp.abs(x).max()) > 0 for x in flat)


class TestConverterCoverage:
    def test_all_keys_consumed(self):
        """Every SparseEncoder weight key is consumed by the converter (the
        zero-skipped-keys contract for full-checkpoint import)."""
        rng = np.random.default_rng(3)
        sd = _make_state_dict(rng)
        params, stats = ti.convert_sparse_encoder(sd, CHANNELS)
        n_leaves = len(jax.tree_util.tree_leaves((params, stats)))
        n_weights = sum(1 for k in sd if not k.endswith('num_batches_tracked'))
        assert n_leaves == n_weights

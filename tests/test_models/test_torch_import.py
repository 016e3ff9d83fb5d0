"""Weight-import parity: a randomly initialized torch-format ResNet
state_dict converted to flax must produce numerically identical features to
a minimal torch forward of the same weights (eval mode)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from mm_training_tpu.models import ResNet  # noqa: E402
from mm_training_tpu.models.torch_import import (  # noqa: E402
    convert_torchvision_resnet, merge_pretrained_backbone)

_STAGE_BLOCKS = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}


def _make_state_dict(depth, gen):
    """Random torchvision-named ResNet state_dict (no torchvision needed)."""
    bottleneck = depth == 50
    sd = {}

    def conv(name, o, i, k):
        sd[f'{name}.weight'] = torch.randn(o, i, k, k, generator=gen) * 0.05

    def bn(name, c):
        sd[f'{name}.weight'] = torch.rand(c, generator=gen) + 0.5
        sd[f'{name}.bias'] = torch.randn(c, generator=gen) * 0.1
        sd[f'{name}.running_mean'] = torch.randn(c, generator=gen) * 0.1
        sd[f'{name}.running_var'] = torch.rand(c, generator=gen) + 0.5

    conv('conv1', 64, 3, 7); bn('bn1', 64)
    in_ch = 64
    width = 64
    for i, blocks in enumerate(_STAGE_BLOCKS[depth], start=1):
        out_ch = width * (4 if bottleneck else 1)
        for j in range(blocks):
            pre = f'layer{i}.{j}'
            if bottleneck:
                conv(f'{pre}.conv1', width, in_ch, 1); bn(f'{pre}.bn1', width)
                conv(f'{pre}.conv2', width, width, 3); bn(f'{pre}.bn2', width)
                conv(f'{pre}.conv3', out_ch, width, 1); bn(f'{pre}.bn3', out_ch)
            else:
                conv(f'{pre}.conv1', width, in_ch, 3); bn(f'{pre}.bn1', width)
                conv(f'{pre}.conv2', out_ch, width, 3); bn(f'{pre}.bn2', out_ch)
            stride = 1 if (i == 1 or j > 0) else 2
            if j == 0 and (in_ch != out_ch or stride != 1):
                conv(f'{pre}.downsample.0', out_ch, in_ch, 1)
                bn(f'{pre}.downsample.1', out_ch)
            in_ch = out_ch
        width *= 2
    return sd


def _torch_bn(x, sd, name):
    return F.batch_norm(x, sd[f'{name}.running_mean'], sd[f'{name}.running_var'],
                        sd[f'{name}.weight'], sd[f'{name}.bias'], False, 0.0, 1e-5)


def _torch_forward(sd, x, depth):
    bottleneck = depth == 50
    x = F.conv2d(x, sd['conv1.weight'], stride=2, padding=3)
    x = F.relu(_torch_bn(x, sd, 'bn1'))
    x = F.max_pool2d(x, 3, 2, 1)
    outs = []
    for i, blocks in enumerate(_STAGE_BLOCKS[depth], start=1):
        for j in range(blocks):
            pre = f'layer{i}.{j}'
            stride = 2 if (i > 1 and j == 0) else 1
            identity = x
            if bottleneck:
                o = F.relu(_torch_bn(F.conv2d(x, sd[f'{pre}.conv1.weight']), sd, f'{pre}.bn1'))
                o = F.relu(_torch_bn(F.conv2d(o, sd[f'{pre}.conv2.weight'],
                                              stride=stride, padding=1), sd, f'{pre}.bn2'))
                o = _torch_bn(F.conv2d(o, sd[f'{pre}.conv3.weight']), sd, f'{pre}.bn3')
            else:
                o = F.relu(_torch_bn(F.conv2d(x, sd[f'{pre}.conv1.weight'],
                                              stride=stride, padding=1), sd, f'{pre}.bn1'))
                o = _torch_bn(F.conv2d(o, sd[f'{pre}.conv2.weight'], padding=1), sd, f'{pre}.bn2')
            if f'{pre}.downsample.0.weight' in sd:
                identity = _torch_bn(F.conv2d(x, sd[f'{pre}.downsample.0.weight'],
                                              stride=stride), sd, f'{pre}.downsample.1')
            x = F.relu(o + identity)
        outs.append(x)
    return outs


@pytest.mark.parametrize('depth', [18, 50])
@pytest.mark.slow
def test_converted_weights_match_torch_forward(depth):
    gen = torch.Generator().manual_seed(0)
    sd = _make_state_dict(depth, gen)
    sd_np = {k: v.numpy() for k, v in sd.items()}

    model = ResNet(depth=depth, out_indices=(0, 1, 2, 3))
    x_np = np.random.default_rng(0).normal(size=(1, 64, 96, 3)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_np)

    params, stats = convert_torchvision_resnet(sd_np, depth)
    import flax
    variables = flax.core.unfreeze(variables)
    variables['params'] = params
    variables['batch_stats'] = stats

    flax_outs = model.apply(variables, x_np)

    with torch.no_grad():
        torch_outs = _torch_forward(sd, torch.from_numpy(
            np.transpose(x_np, (0, 3, 1, 2))), depth)

    assert len(flax_outs) == len(torch_outs)
    for fo, to in zip(flax_outs, torch_outs):
        t = np.transpose(to.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(fo), t, rtol=2e-3, atol=1e-2)


def test_merge_pretrained_backbone_grafts_into_model_tree():
    gen = torch.Generator().manual_seed(1)
    sd = {k: v.numpy() for k, v in _make_state_dict(18, gen).items()}
    model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = {'backbone_vars': None}
    inner = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    import flax
    inner = flax.core.unfreeze(inner)
    tree = {'params': {'backbone': {'img_backbone': inner['params']}},
            'batch_stats': {'backbone': {'img_backbone': inner['batch_stats']}}}
    out = merge_pretrained_backbone(tree, convert_torchvision_resnet(sd, 18))
    k = out['params']['backbone']['img_backbone']['stem']['Conv_0']['kernel']
    np.testing.assert_allclose(np.asarray(k),
                               np.transpose(sd['conv1.weight'], (2, 3, 1, 0)))


def test_merge_subtree_bn_free_scope():
    """Grafting into a scope that exists under params but NOT batch_stats
    (a BN-free module) must not KeyError on the stats traversal."""
    import numpy as np
    from mm_training_tpu.models import torch_import as ti
    variables = {
        'params': {'fuse': {'kernel': np.zeros((2, 2), np.float32)},
                   'trunk': {'bn': {'scale': np.ones((2,), np.float32)}}},
        'batch_stats': {'trunk': {'bn': {'mean': np.zeros((2,), np.float32)}}},
    }
    merged = ti.merge_subtree(
        variables, {'kernel': np.ones((2, 2), np.float32)}, {}, scope='fuse')
    assert float(merged['params']['fuse']['kernel'].sum()) == 4.0
    # untouched collections survive
    assert 'trunk' in merged['batch_stats']

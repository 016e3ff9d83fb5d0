"""Torch-format pretrained-weight import for the flax ResNet backbone.

The reference initializes its image backbone from torchvision's
ImageNet-pretrained ResNet-50 (conf_aim.py:60 ``pretrained='torchvision://
resnet50'`` via mmcv). The TPU framework loads the same .pth state_dict
(torchvision naming: conv1/bn1/layer{1..4}.{j}.conv{1..3}/bn{1..3}/
downsample.{0,1}) and converts it into the flax ResNet's params/batch_stats
trees (models/resnet.py naming: stem + layer{i}_{j}/ConvBN_{k}).

Conv kernels transpose OIHW -> HWIO; BN weight/bias -> scale/bias and
running_mean/var -> batch_stats mean/var.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ['convert_torchvision_resnet', 'load_torch_state_dict',
           'merge_pretrained_backbone']

_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3)}
_BOTTLENECK = {50, 101}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth/.pt file into a flat {name: np.ndarray} dict. Accepts raw
    state_dicts and {'state_dict': ...} checkpoints; strips common prefixes."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    sd = obj.get('state_dict', obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        for prefix in ('module.', 'model.', 'backbone.'):
            if k.startswith(prefix):
                k = k[len(prefix):]
        if hasattr(v, 'numpy'):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv(sd, name):
    return np.transpose(sd[f'{name}.weight'], (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, name):
    params = {'scale': sd[f'{name}.weight'], 'bias': sd[f'{name}.bias']}
    stats = {'mean': sd[f'{name}.running_mean'],
             'var': sd[f'{name}.running_var']}
    return params, stats


def _convbn(sd, conv_name, bn_name):
    bn_p, bn_s = _bn(sd, bn_name)
    return ({'Conv_0': {'kernel': _conv(sd, conv_name)}, 'BatchNorm_0': bn_p},
            {'BatchNorm_0': bn_s})


def convert_torchvision_resnet(state_dict: Dict[str, np.ndarray],
                               depth: int = 50
                               ) -> Tuple[Dict, Dict]:
    """torchvision-named state_dict -> (params, batch_stats) pytrees for
    models.resnet.ResNet(depth, num_stages=4)."""
    sd = state_dict
    params, stats = {}, {}
    params['stem'], stats['stem'] = _convbn(sd, 'conv1', 'bn1')

    n_convs = 3 if depth in _BOTTLENECK else 2
    for i, blocks in enumerate(_STAGE_BLOCKS[depth], start=1):
        for j in range(blocks):
            p, s = {}, {}
            for c in range(n_convs):
                key = f'ConvBN_{c}'
                p[key], s[key] = _convbn(sd, f'layer{i}.{j}.conv{c + 1}',
                                         f'layer{i}.{j}.bn{c + 1}')
            if f'layer{i}.{j}.downsample.0.weight' in sd:
                key = f'ConvBN_{n_convs}'
                p[key], s[key] = _convbn(sd, f'layer{i}.{j}.downsample.0',
                                         f'layer{i}.{j}.downsample.1')
            params[f'layer{i}_{j}'] = p
            stats[f'layer{i}_{j}'] = s
    return params, stats


def merge_pretrained_backbone(variables: Dict, pretrained: Tuple[Dict, Dict],
                              scope: str = 'backbone/img_backbone') -> Dict:
    """Graft converted (params, batch_stats) into a model's variables at
    ``scope`` (path into both collections, '/'-separated). Shapes are
    checked leaf-by-leaf."""
    import jax

    p_new, s_new = pretrained
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy tree

    def graft(dst, src, path):
        for k, v in src.items():
            if isinstance(v, dict):
                graft(dst[k], v, f'{path}/{k}')
            else:
                old = dst[k]
                assert tuple(old.shape) == tuple(v.shape), (
                    f'{path}/{k}: {old.shape} vs {v.shape}')
                dst[k] = np.asarray(v, dtype=np.asarray(old).dtype)

    import flax
    out = flax.core.unfreeze(out) if hasattr(flax.core, 'unfreeze') else out
    node_p = out['params']
    node_s = out.get('batch_stats', {})
    for part in scope.split('/'):
        node_p = node_p[part]
        node_s = node_s[part] if node_s else node_s
    graft(node_p, p_new, scope)
    if node_s:
        graft(node_s, s_new, scope)
    return out

"""Torch-format weight EXPORT: flax trees -> reference-shaped state dicts.

The exact inverse of models/torch_import.py: a model trained (or fine-tuned)
in this framework exports to the mmdet/mmdet3d state_dict naming of the
reference (exps/mm_training_aim.py BEVDepthLightningModel, 'model.*' keys),
so reference-stack consumers — the reference's own eval.py/inference.py, the
OpenPCDet exporter, released-checkpoint tooling — can load it.

Exactness notes (each the inverse of an import-side rule):
  * conv kernels HWIO -> OIHW; ConvTranspose kernels un-flip spatially and
    go [kH,kW,I,O] -> [I,O,kH,kW].
  * a flax Conv bias feeding a bias-free torch ConvModule (SeparateHead
    branches) is folded into the FOLLOWING BatchNorm's running_mean
    (mean' = mean - bias: BN_S'(y) = BN_S(y + b); eval-exact, train batch
    statistics are shift-invariant).
  * torch convs that carry a bias our ConvBN lacks (reduce_conv) get zeros.
  * the DCN kernel [9, g, cg, og] reassembles to mmcv's [O, I/g, 3, 3].
  * the import-compatible sparse lidar encoder exports its 2D kernels into
    the active z-slice of the 3D sparse kernels with the OTHER slices
    zeroed — exact for any single-occupied-z-plane input (the reference
    geometry; see models/sparse_encoder.py).
  * the reference's dead ``context_se`` module (instantiated, never called;
    lss_fpn.py:184) is emitted zero-initialized so strict state_dict loads
    succeed.

Round-tripping through convert_reference_checkpoint reproduces the flax
trees bit-exactly for shared modules (tested).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ['export_reference_checkpoint', 'export_mmdet_resnet',
           'export_second_fpn', 'export_depth_net', 'export_bev_head',
           'export_sparse_encoder', 'save_torch_checkpoint']

_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3)}
_BOTTLENECK = {50, 101}


def _np(x):
    return np.asarray(x)


def _conv(out, name, kernel):
    out[f'{name}.weight'] = np.transpose(_np(kernel), (3, 2, 0, 1))  # HWIO->OIHW


def _bn(out, name, bn_p, bn_s, bias_fold=None):
    out[f'{name}.weight'] = _np(bn_p['scale'])
    out[f'{name}.bias'] = _np(bn_p['bias'])
    mean = _np(bn_s['mean'])
    if bias_fold is not None:
        mean = mean - _np(bias_fold)
    out[f'{name}.running_mean'] = mean
    out[f'{name}.running_var'] = _np(bn_s['var'])
    out[f'{name}.num_batches_tracked'] = np.asarray(0, np.int64)


def _convbn(out, conv_name, bn_name, p, s, torch_conv_bias=False):
    _conv(out, conv_name, p['Conv_0']['kernel'])
    if torch_conv_bias:
        c = p['Conv_0']['kernel'].shape[-1]
        out[f'{conv_name}.bias'] = np.zeros((c,), np.float32)
    _bn(out, bn_name, p['BatchNorm_0'], s['BatchNorm_0'])


def export_mmdet_resnet(params: Dict, stats: Dict, depth: int,
                        num_stages: int = 4, prefix: str = '',
                        stem_s2d: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of torch_import.convert_mmdet_resnet. With ``stem_s2d`` the
    [4,4,4*cin,cout] space-to-depth stem kernel maps back to the reference
    7x7 form (exact: the structurally-masked taps are zero)."""
    out: Dict[str, np.ndarray] = {}
    if stem_s2d:
        from .torch_import import stem_7x7_from_s2d
        stem_p = {'Conv_0': {'kernel': stem_7x7_from_s2d(
            np.asarray(params['stem']['Conv_0']['kernel']))},
            'BatchNorm_0': params['stem']['BatchNorm_0']}
        _convbn(out, f'{prefix}conv1', f'{prefix}bn1', stem_p, stats['stem'])
    else:
        _convbn(out, f'{prefix}conv1', f'{prefix}bn1',
                params['stem'], stats['stem'])
    n_convs = 3 if depth in _BOTTLENECK else 2
    for i, blocks in enumerate(_STAGE_BLOCKS[depth][:num_stages], start=1):
        for j in range(blocks):
            p, s = params[f'layer{i}_{j}'], stats[f'layer{i}_{j}']
            for c in range(n_convs):
                _convbn(out, f'{prefix}layer{i}.{j}.conv{c + 1}',
                        f'{prefix}layer{i}.{j}.bn{c + 1}',
                        p[f'ConvBN_{c}'], s[f'ConvBN_{c}'])
            if f'ConvBN_{n_convs}' in p:
                _convbn(out, f'{prefix}layer{i}.{j}.downsample.0',
                        f'{prefix}layer{i}.{j}.downsample.1',
                        p[f'ConvBN_{n_convs}'], s[f'ConvBN_{n_convs}'])
    return out


def export_second_fpn(params: Dict, stats: Dict, upsample_strides,
                      prefix: str = '') -> Dict[str, np.ndarray]:
    """Inverse of convert_second_fpn."""
    out: Dict[str, np.ndarray] = {}
    for i, us in enumerate(upsample_strides):
        k = _np(params[f'deblock{i}_conv']['kernel'])
        if us >= 1:  # flax ConvTranspose [kH,kW,I,O] -> torch [I,O,kH,kW]+flip
            out[f'{prefix}deblocks.{i}.0.weight'] = np.ascontiguousarray(
                np.transpose(k[::-1, ::-1], (2, 3, 0, 1)))
        else:
            out[f'{prefix}deblocks.{i}.0.weight'] = np.transpose(
                k, (3, 2, 0, 1))
        _bn(out, f'{prefix}deblocks.{i}.1', params[f'deblock{i}_bn'],
            stats[f'deblock{i}_bn'])
    return out


def _basic_block(out, prefix, p, s):
    for c in (0, 1):
        _convbn(out, f'{prefix}.conv{c + 1}', f'{prefix}.bn{c + 1}',
                p[f'ConvBN_{c}'], s[f'ConvBN_{c}'])
    if 'ConvBN_2' in p:
        _convbn(out, f'{prefix}.downsample.0', f'{prefix}.downsample.1',
                p['ConvBN_2'], s['ConvBN_2'])


def export_depth_net(params: Dict, stats: Dict, mid_channels: int,
                     prefix: str = '') -> Dict[str, np.ndarray]:
    """Inverse of convert_depth_net (+ zero-init dead context_se for strict
    loads)."""
    out: Dict[str, np.ndarray] = {}
    _convbn(out, f'{prefix}reduce_conv.0', f'{prefix}reduce_conv.1',
            params['reduce_conv'], stats['reduce_conv'], torch_conv_bias=True)
    _conv(out, f'{prefix}context_conv', params['context_conv']['kernel'])
    out[f'{prefix}context_conv.bias'] = _np(params['context_conv']['bias'])
    for i in range(3):
        _basic_block(out, f'{prefix}depth_conv.{i}',
                     params[f'depth_block{i}'], stats[f'depth_block{i}'])
    aspp_names = ['aspp1.atrous_conv|aspp1.bn', 'aspp2.atrous_conv|aspp2.bn',
                  'aspp3.atrous_conv|aspp3.bn', 'aspp4.atrous_conv|aspp4.bn',
                  'global_avg_pool.1|global_avg_pool.2', 'conv1|bn1']
    for k, pair in enumerate(aspp_names):
        cn, bnn = pair.split('|')
        _convbn(out, f'{prefix}depth_conv.3.{cn}', f'{prefix}depth_conv.3.{bnn}',
                params['aspp'][f'ConvBN_{k}'], stats['aspp'][f'ConvBN_{k}'])
    pred_bias = _np(params['depth_pred']['bias'])
    if 'dcn' in params:
        k = _np(params['dcn']['kernel'])               # [9, g, cg, og]
        nt, g, cg, og = k.shape
        w = np.transpose(k.reshape(3, 3, g, cg, og), (2, 4, 3, 0, 1))
        out[f'{prefix}depth_conv.4.weight'] = np.ascontiguousarray(
            w.reshape(g * og, cg, 3, 3))
        _conv(out, f'{prefix}depth_conv.4.conv_offset',
              params['dcn']['conv_offset']['kernel'])
        out[f'{prefix}depth_conv.4.conv_offset.bias'] = _np(
            params['dcn']['conv_offset']['bias'])
        # mmcv's DCN is bias-free; our DeformConv2d has a bias. The DCN
        # feeds the 1x1 depth_conv.5 directly (no BN/activation between,
        # lss_fpn.py:189-202), so fold exactly:
        # W(d + b) + c = Wd + (c + W b)
        k5 = _np(params['depth_pred']['kernel'])       # [1, 1, mid, D]
        pred_bias = pred_bias + _np(params['dcn']['bias']) @ k5[0, 0]
    _conv(out, f'{prefix}depth_conv.5', params['depth_pred']['kernel'])
    out[f'{prefix}depth_conv.5.bias'] = pred_bias
    # dead module (lss_fpn.py:184): zero-init for strict state_dict loads
    for nm in ('conv_reduce', 'conv_expand'):
        out[f'{prefix}context_se.{nm}.weight'] = np.zeros(
            (mid_channels, mid_channels, 1, 1), np.float32)
        out[f'{prefix}context_se.{nm}.bias'] = np.zeros(
            (mid_channels,), np.float32)
    return out


def _separate_head(out, prefix, p, s, heads):
    for name, (_, num_conv) in heads:
        for i in range(num_conv - 1):
            _conv(out, f'{prefix}{name}.{i}.conv', p[f'{name}_conv{i}']['kernel'])
            # flax conv bias -> folded into the following BN (mmdet3d
            # ConvModule(bias='auto') has no conv bias under BN)
            _bn(out, f'{prefix}{name}.{i}.bn', p[f'{name}_bn{i}'],
                s[f'{name}_bn{i}'], bias_fold=p[f'{name}_conv{i}']['bias'])
        f = num_conv - 1
        _conv(out, f'{prefix}{name}.{f}', p[f'{name}_final']['kernel'])
        out[f'{prefix}{name}.{f}.bias'] = _np(p[f'{name}_final']['bias'])


def export_bev_head(params: Dict, stats: Dict, head_conf, prefix: str = ''
                    ) -> Dict[str, np.ndarray]:
    """Inverse of convert_bev_head."""
    out: Dict[str, np.ndarray] = {}
    bb = head_conf.bev_backbone_conf
    out.update(export_mmdet_resnet(params['trunk'], stats['trunk'], depth=18,
                                   num_stages=bb.num_stages,
                                   prefix=f'{prefix}trunk.'))
    out.update(export_second_fpn(params['neck'], stats['neck'],
                                 head_conf.bev_neck_conf.upsample_strides,
                                 prefix=f'{prefix}neck.'))
    _convbn(out, f'{prefix}shared_conv.conv', f'{prefix}shared_conv.bn',
            params['shared_conv'], stats['shared_conv'], torch_conv_bias=True)
    for t, task in enumerate(head_conf.tasks):
        heads = tuple(head_conf.common_heads) + (
            ('heatmap', (task.num_class, 2)),)
        _separate_head(out, f'{prefix}task_heads.{t}.', params[f'task{t}'],
                       stats[f'task{t}'], heads)
    return out


def export_sparse_encoder(params: Dict, stats: Dict,
                          encoder_channels=((16, 16, 32), (32, 32, 64),
                                            (64, 64, 128), (128, 128)),
                          prefix: str = '') -> Dict[str, np.ndarray]:
    """Inverse of convert_sparse_encoder: the 2D kernels go into the active
    z-slice of the [kd,kh,kw,I,O] sparse kernels, other slices zero (exact
    for single-occupied-z-plane inputs — the reference geometry)."""
    out: Dict[str, np.ndarray] = {}

    def unit(name, p, s, tap, kd=3):
        k2 = _np(p['conv']['kernel'])                   # [kh, kw, I, O]
        k3 = np.zeros((kd,) + k2.shape, k2.dtype)
        k3[min(tap, kd - 1)] = k2
        out[f'{name}.0.weight'] = k3
        _bn(out, f'{name}.1', p['bn'], s['bn'])

    def subm(name, p, s):
        for cn, bnn in (('conv1', 'bn1'), ('conv2', 'bn2')):
            k2 = _np(p[cn]['kernel'])
            k3 = np.zeros((3,) + k2.shape, k2.dtype)
            k3[1] = k2
            out[f'{name}.{cn}.weight'] = k3
            _bn(out, f'{name}.{bnn}', p[bnn], s[bnn])

    unit(f'{prefix}conv_input', params['conv_input'], stats['conv_input'], 1)
    n_stages = len(encoder_channels)
    for si, stage in enumerate(encoder_channels):
        has_down = si < n_stages - 1
        for j in range(len(stage) - (1 if has_down else 0)):
            subm(f'{prefix}encoder_layers.encoder_layer{si + 1}.{j}',
                 params[f'stage{si}_block{j}'], stats[f'stage{si}_block{j}'])
        if has_down:
            tap = 0 if si == n_stages - 2 else 1
            unit(f'{prefix}encoder_layers.encoder_layer{si + 1}.'
                 f'{len(stage) - 1}',
                 params[f'stage{si}_down'], stats[f'stage{si}_down'], tap)
    # conv_out: flax kernel is (1,1) spatial, so the stack is already the
    # reference's (3,1,1) z-majority layout with the active slice at kd=0
    unit(f'{prefix}conv_out', params['conv_out'], stats['conv_out'], 0, kd=3)
    return out


def export_reference_checkpoint(params: Dict, stats: Dict, cfg,
                                lightning_prefix: bool = True
                                ) -> Dict[str, np.ndarray]:
    """Full flax model trees -> reference state dict ('model.*' keys like a
    Lightning checkpoint when ``lightning_prefix``). Inverse of
    convert_reference_checkpoint; the lidar branch exports only for the
    import-compatible encoder (LidarEncoderConf.variant='sparse_import')."""
    out: Dict[str, np.ndarray] = {}
    if cfg.use_cam:
        bb = cfg.get_backbone_conf()
        out.update(export_mmdet_resnet(
            params['backbone']['img_backbone'], stats['backbone']['img_backbone'],
            depth=bb.img_backbone_conf.depth, prefix='backbone.img_backbone.',
            stem_s2d=bb.img_backbone_conf.stem_s2d))
        out.update(export_second_fpn(
            params['backbone']['img_neck'], stats['backbone']['img_neck'],
            bb.img_neck_conf.upsample_strides, prefix='backbone.img_neck.'))
        out.update(export_depth_net(
            params['backbone']['depth_net'], stats['backbone']['depth_net'],
            bb.depth_net_conf.mid_channels, prefix='backbone.depth_net.'))
    out.update(export_bev_head(params['head'], stats['head'],
                               cfg.get_head_conf(), prefix='head.'))
    if 'bev_fuse' in params:
        for nm in ('conv_3', 'conv_1'):
            _conv(out, f'bev_fuse.{nm}', params['bev_fuse'][nm]['kernel'])
            out[f'bev_fuse.{nm}.bias'] = _np(params['bev_fuse'][nm]['bias'])
    if (cfg.use_lidar and 'lidar_encoder' in params
            and cfg.get_lidar_conf().variant == 'sparse_import'):
        out.update(export_sparse_encoder(
            params['lidar_encoder'], stats['lidar_encoder'],
            cfg.get_lidar_conf().encoder_channels,
            prefix='lidar_encoder.pts_middle_encoder.'))
    if lightning_prefix:
        out = {f'model.{k}': v for k, v in out.items()}
    return out


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray]):
    """Write a reference-loadable .ckpt ({'state_dict': {...torch tensors}})."""
    import torch
    torch.save({'state_dict': {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in state_dict.items()}}, path)

"""Torch-format weight import: pretrained backbones AND full reference
checkpoints.

The reference initializes its image backbone from torchvision's
ImageNet-pretrained ResNet-50 (conf_aim.py:60 ``pretrained='torchvision://
resnet50'`` via mmcv), and ships four trained checkpoints (README.md:65-72)
whose state_dicts follow the mmdet/mmdet3d naming of its modules:

  model.backbone.img_backbone.*   mmdet ResNet-50 (lss_fpn.py:293)
  model.backbone.img_neck.*       SECONDFPN 'deblocks.{i}.{0,1}' (lss_fpn.py:294)
  model.backbone.depth_net.*      DepthNet (lss_fpn.py:160-248)
  model.head.trunk.*              mmdet ResNet-18 BEV trunk (bev_depth_head.py:75)
  model.head.neck.*               SECONDFPN (bev_depth_head.py:77)
  model.head.shared_conv.*        ConvModule (mmdet3d CenterHead)
  model.head.task_heads.{t}.*     SeparateHead branches
  model.bev_fuse.*                BEVFuseLayer (models/bev_depth.py:133-145)
  model.lidar_encoder.*           spconv SparseEncoder — converted (z-slice
                                  extraction, convert_sparse_encoder) when the
                                  config selects the import-compatible
                                  encoder (LidarEncoderConf.variant ==
                                  'sparse_import'); skipped for the TPU-first
                                  dense encoder (models/lidar_encoder.py)

Each converter maps one torch module family into the flax params/batch_stats
trees of the corresponding module here. Conv kernels transpose OIHW -> HWIO
(ConvTranspose: IOHW -> HWIO with a spatial flip — flax's conv_transpose does
not mirror the kernel, torch's does); BN weight/bias -> scale/bias and
running_mean/var -> batch_stats mean/var; a torch conv bias feeding a
bias-free ConvBN is folded into the BN running_mean (exact: batchnorm is
shift-invariant).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ['convert_torchvision_resnet', 'convert_mmdet_resnet',
           'convert_second_fpn', 'convert_depth_net', 'convert_separate_head',
           'convert_bev_head', 'convert_fuse_layer', 'convert_sparse_encoder',
           'convert_reference_checkpoint', 'load_torch_state_dict',
           'merge_pretrained_backbone', 'merge_subtree']

_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3)}
_BOTTLENECK = {50, 101}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth/.pt file into a flat {name: np.ndarray} dict. Accepts raw
    state_dicts and {'state_dict': ...} checkpoints. Wrapper prefixes
    ('module.', 'model.', 'backbone.') are stripped only when EVERY key
    shares them — 'backbone.' is a real scope inside full reference
    checkpoints and must survive there."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    sd = obj.get('state_dict', obj) if isinstance(obj, dict) else obj
    keys = list(sd.keys())
    for prefix in ('module.', 'model.', 'backbone.'):
        while keys and all(k.startswith(prefix) for k in keys):
            keys = [k[len(prefix):] for k in keys]
    out = {}
    for k, v in zip(keys, sd.values()):
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


# the bijective 7x7 <-> blocked space-to-depth stem kernel rewrite lives
# with the stem module (single source of truth for the tap mapping)
from .resnet import stem_7x7_from_s2d, stem_s2d_from_7x7  # noqa: E402,F401


def convert_mmdet_resnet(state_dict: Dict[str, np.ndarray], depth: int = 50,
                         num_stages: int = 4, prefix: str = '',
                         stem_s2d: bool = False) -> Tuple[Dict, Dict]:
    """mmdet/torchvision-named ResNet state_dict (conv1/bn1/layer{i}.{j}) ->
    (params, batch_stats) for models.resnet.ResNet(depth, num_stages).
    Covers both the image backbone (depth 50) and the BEV trunk (depth 18,
    3 stages, conf_aim.py:100-110) — mmdet keeps torchvision naming.
    ``stem_s2d`` rewrites the 7x7 stem kernel to the exact space-to-depth
    form."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params, stats = {}, {}
    params['stem'], stats['stem'] = _convbn(sd, 'conv1', 'bn1')
    if stem_s2d:
        params['stem']['Conv_0']['kernel'] = stem_s2d_from_7x7(
            params['stem']['Conv_0']['kernel'])

    n_convs = 3 if depth in _BOTTLENECK else 2
    for i, blocks in enumerate(_STAGE_BLOCKS[depth][:num_stages], start=1):
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


def convert_torchvision_resnet(state_dict: Dict[str, np.ndarray],
                               depth: int = 50, stem_s2d: bool = False
                               ) -> Tuple[Dict, Dict]:
    """torchvision-named state_dict -> trees for ResNet(depth, num_stages=4)."""
    return convert_mmdet_resnet(state_dict, depth=depth, num_stages=4,
                                stem_s2d=stem_s2d)


def _deconv(sd, name):
    """torch ConvTranspose2d weight [I, O, kH, kW] -> flax ConvTranspose
    kernel [kH, kW, I, O]. flax's lax.conv_transpose does NOT mirror the
    kernel while torch's transposed conv does, so flip both spatial axes."""
    w = np.transpose(sd[f'{name}.weight'], (2, 3, 0, 1))
    return w[::-1, ::-1].copy()


def convert_second_fpn(state_dict: Dict[str, np.ndarray],
                       upsample_strides, prefix: str = ''
                       ) -> Tuple[Dict, Dict]:
    """mmdet3d SECONDFPN ('deblocks.{i}.0' conv/deconv + '.1' BN) ->
    models.second_fpn.SECONDFPN trees (deblock{i}_conv / deblock{i}_bn)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params, stats = {}, {}
    for i, us in enumerate(upsample_strides):
        if us >= 1:
            kernel = _deconv(sd, f'deblocks.{i}.0')
        else:
            kernel = _conv(sd, f'deblocks.{i}.0')
        params[f'deblock{i}_conv'] = {'kernel': kernel}
        bn_p, bn_s = _bn(sd, f'deblocks.{i}.1')
        params[f'deblock{i}_bn'] = bn_p
        stats[f'deblock{i}_bn'] = bn_s
    return params, stats


def _fold_bias_into_bn(stats_entry: Dict, bias: np.ndarray) -> Dict:
    """BatchNorm is shift-invariant: BN(x + b) == BN'(x) with the running
    mean shifted by -b. Folds a torch conv bias into the following BN so it
    can feed our bias-free ConvBN exactly (eval mode; train-mode batch
    statistics are unaffected by a constant shift)."""
    out = dict(stats_entry)
    out['mean'] = stats_entry['mean'] - bias
    return out


def _convbn_maybe_bias(sd, conv_name, bn_name):
    """Like _convbn but folds an optional torch conv bias into the BN."""
    p, s = _convbn(sd, conv_name, bn_name)
    if f'{conv_name}.bias' in sd:
        s['BatchNorm_0'] = _fold_bias_into_bn(s['BatchNorm_0'],
                                              sd[f'{conv_name}.bias'])
    return p, s


def _basic_block(sd, prefix):
    """mmdet BasicBlock (conv1/bn1/conv2/bn2[/downsample]) ->
    models.resnet.BasicBlock (ConvBN_0/ConvBN_1[/ConvBN_2])."""
    p, s = {}, {}
    for c in (0, 1):
        p[f'ConvBN_{c}'], s[f'ConvBN_{c}'] = _convbn(
            sd, f'{prefix}.conv{c + 1}', f'{prefix}.bn{c + 1}')
    if f'{prefix}.downsample.0.weight' in sd:
        p['ConvBN_2'], s['ConvBN_2'] = _convbn(
            sd, f'{prefix}.downsample.0', f'{prefix}.downsample.1')
    return p, s


def convert_depth_net(state_dict: Dict[str, np.ndarray], prefix: str = ''
                      ) -> Tuple[Dict, Dict]:
    """Reference DepthNet (lss_fpn.py:160-248) -> models.depth_net.DepthNet.

    Mapping:
      reduce_conv.{0,1}        -> reduce_conv (ConvBN; torch conv bias folded
                                  into BN running_mean)
      context_conv             -> context_conv
      depth_conv.{0,1,2}       -> depth_block{0,1,2} (mmdet BasicBlocks)
      depth_conv.3 (ASPP)      -> aspp: aspp{1..4} -> ConvBN_{0..3},
                                  global_avg_pool.{1,2} -> ConvBN_4,
                                  conv1+bn1 -> ConvBN_5
      depth_conv.4 (mmcv DCN)  -> dcn: weight [O,I/g,3,3] -> kernel
                                  [9,g,I/g,O/g] (+ zero bias; mmcv DCN has
                                  none), conv_offset kept ((dy,dx)-interleaved
                                  offset channels match)
      depth_conv.5             -> depth_pred
      context_se.*             -> dropped (dead in both: the reference
                                  instantiates but never calls it)
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params, stats = {}, {}
    params['reduce_conv'], stats['reduce_conv'] = _convbn_maybe_bias(
        sd, 'reduce_conv.0', 'reduce_conv.1')
    params['context_conv'] = {'kernel': _conv(sd, 'context_conv'),
                              'bias': sd['context_conv.bias']}
    for i in range(3):
        params[f'depth_block{i}'], stats[f'depth_block{i}'] = _basic_block(
            sd, f'depth_conv.{i}')

    aspp_p, aspp_s = {}, {}
    for k, (cn, bnn) in enumerate([
            ('depth_conv.3.aspp1.atrous_conv', 'depth_conv.3.aspp1.bn'),
            ('depth_conv.3.aspp2.atrous_conv', 'depth_conv.3.aspp2.bn'),
            ('depth_conv.3.aspp3.atrous_conv', 'depth_conv.3.aspp3.bn'),
            ('depth_conv.3.aspp4.atrous_conv', 'depth_conv.3.aspp4.bn'),
            ('depth_conv.3.global_avg_pool.1', 'depth_conv.3.global_avg_pool.2'),
            ('depth_conv.3.conv1', 'depth_conv.3.bn1')]):
        aspp_p[f'ConvBN_{k}'], aspp_s[f'ConvBN_{k}'] = _convbn(sd, cn, bnn)
    params['aspp'], stats['aspp'] = aspp_p, aspp_s

    if 'depth_conv.4.weight' in sd:  # DCN present (use_dcn)
        w = sd['depth_conv.4.weight']          # [O, I/g, 3, 3]
        o, cg = w.shape[0], w.shape[1]
        g = 4
        og = o // g
        # -> [9, g, cg, og]: tap t = kh*3 + kw (row-major, matching the
        # DeformConv2d base-offset meshgrid)
        k = np.transpose(w.reshape(g, og, cg, 3, 3), (3, 4, 0, 2, 1))
        k = k.reshape(9, g, cg, og)
        params['dcn'] = {
            'kernel': k,
            'bias': np.zeros((o,), w.dtype),   # mmcv DCN is bias-free
            'conv_offset': {
                'kernel': _conv(sd, 'depth_conv.4.conv_offset'),
                'bias': sd['depth_conv.4.conv_offset.bias'],
            },
        }
    params['depth_pred'] = {'kernel': _conv(sd, 'depth_conv.5'),
                            'bias': sd['depth_conv.5.bias']}
    return params, stats


def convert_separate_head(state_dict: Dict[str, np.ndarray], heads,
                          prefix: str = '') -> Tuple[Dict, Dict]:
    """mmdet3d SeparateHead ('{name}.{i}.conv/bn' ConvModules + final conv)
    -> models.centerpoint_head.SeparateHead ({name}_conv{i}/{name}_bn{i}/
    {name}_final). heads: iterable of (name, (out_ch, num_conv))."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params, stats = {}, {}
    for name, (_, num_conv) in heads:
        for i in range(num_conv - 1):
            params[f'{name}_conv{i}'] = {
                'kernel': _conv(sd, f'{name}.{i}.conv'),
                # mmdet3d ConvModule(bias='auto') drops the conv bias under
                # BN; flax Conv keeps one — zero is exact
                'bias': np.zeros(sd[f'{name}.{i}.conv.weight'].shape[0],
                                 sd[f'{name}.{i}.conv.weight'].dtype),
            }
            bn_p, bn_s = _bn(sd, f'{name}.{i}.bn')
            params[f'{name}_bn{i}'] = bn_p
            stats[f'{name}_bn{i}'] = bn_s
        f = num_conv - 1
        params[f'{name}_final'] = {'kernel': _conv(sd, f'{name}.{f}'),
                                   'bias': sd[f'{name}.{f}.bias']}
    return params, stats


def convert_bev_head(state_dict: Dict[str, np.ndarray], head_conf,
                     prefix: str = '') -> Tuple[Dict, Dict]:
    """Reference BEVDepthHead (bev_depth_head.py:31-111) ->
    models.centerpoint_head.BEVDepthHead trees."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params, stats = {}, {}
    bb = head_conf.bev_backbone_conf
    params['trunk'], stats['trunk'] = convert_mmdet_resnet(
        sd, depth=18, num_stages=bb.num_stages, prefix='trunk.')
    params['neck'], stats['neck'] = convert_second_fpn(
        sd, head_conf.bev_neck_conf.upsample_strides, prefix='neck.')
    params['shared_conv'], stats['shared_conv'] = _convbn_maybe_bias(
        sd, 'shared_conv.conv', 'shared_conv.bn')
    for t, task in enumerate(head_conf.tasks):
        heads = tuple(head_conf.common_heads) + (
            ('heatmap', (task.num_class, 2)),)
        params[f'task{t}'], stats[f'task{t}'] = convert_separate_head(
            sd, heads, prefix=f'task_heads.{t}.')
    return params, stats


def convert_fuse_layer(state_dict: Dict[str, np.ndarray], prefix: str = ''
                       ) -> Dict:
    """BEVFuseLayer (models/bev_depth.py:133-145) -> models.fusion
    .BEVFuseLayer params (conv_3 / conv_1, both biased, no BN)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    return {'conv_3': {'kernel': _conv(sd, 'conv_3'),
                       'bias': sd['conv_3.bias']},
            'conv_1': {'kernel': _conv(sd, 'conv_1'),
                       'bias': sd['conv_1.bias']}}


def convert_sparse_encoder(state_dict: Dict[str, np.ndarray],
                           encoder_channels=((16, 16, 32), (32, 32, 64),
                                             (64, 64, 128), (128, 128)),
                           prefix: str = '') -> Tuple[Dict, Dict]:
    """mmdet3d SparseEncoder (conf_aim.py:202-212, torch keys
    ``conv_input.{0,1}`` / ``encoder_layers.encoder_layer{i}.{j}[...]`` /
    ``conv_out.{0,1}``) -> models.sparse_encoder.ImportSparseEncoder trees.

    mmcv/spconv-1.x sparse conv weights are laid out ``[kd, kh, kw, I, O]``,
    so the z-slice at the active tap is already HWIO. Tap selection follows
    the single-occupied-z-plane reduction (see models/sparse_encoder.py):
    the central slice (kd=1) for submanifold convs and the z-padded strided
    convs of stages 0-1, slice kd=0 for stage-2's strided conv
    (encoder_paddings z-pad 0) and conv_out (kernel (3,1,1), padding 0).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    def conv_slice(name, tap):
        w = sd[f'{name}.weight']
        assert w.ndim == 5, f'{name}: expected sparse [kd,kh,kw,I,O], got ' \
                            f'{w.shape}'
        return np.ascontiguousarray(w[min(tap, w.shape[0] - 1)])

    def unit(name, tap):  # one make_sparse_convmodule (conv .0 + BN .1)
        bn_p, bn_s = _bn(sd, f'{name}.1')
        return ({'conv': {'kernel': conv_slice(f'{name}.0', tap)}, 'bn': bn_p},
                {'bn': bn_s})

    params, stats = {}, {}
    params['conv_input'], stats['conv_input'] = unit('conv_input', 1)
    n_stages = len(encoder_channels)
    # z-pad per strided conv from the reference encoder_paddings
    # ((0,0,1), (0,0,1), (0,0,[0,1,1]), (0,0)): stages 0-1 pad z, stage 2
    # does not. Generalized: the LAST strided stage in the chain uses tap 0.
    for si, stage in enumerate(encoder_channels):
        has_down = si < n_stages - 1
        for j in range(len(stage) - (1 if has_down else 0)):
            pref = f'encoder_layers.encoder_layer{si + 1}.{j}'
            p = {'conv1': {'kernel': conv_slice(f'{pref}.conv1', 1)},
                 'conv2': {'kernel': conv_slice(f'{pref}.conv2', 1)}}
            s = {}
            p['bn1'], s['bn1'] = _bn(sd, f'{pref}.bn1')
            p['bn2'], s['bn2'] = _bn(sd, f'{pref}.bn2')
            params[f'stage{si}_block{j}'] = p
            stats[f'stage{si}_block{j}'] = s
        if has_down:
            tap = 0 if si == n_stages - 2 else 1
            params[f'stage{si}_down'], stats[f'stage{si}_down'] = unit(
                f'encoder_layers.encoder_layer{si + 1}.{len(stage) - 1}', tap)
    params['conv_out'], stats['conv_out'] = unit('conv_out', 0)
    return params, stats


def convert_reference_checkpoint(state_dict: Dict[str, np.ndarray], cfg
                                 ) -> Tuple[Dict, Dict]:
    """Full reference checkpoint -> (params, batch_stats) trees covering
    every module of BEVDepthLiDAR: the LSSFPN camera branch (img_backbone /
    img_neck / depth_net), the head, the fuse layer, and — when the config
    selects the import-compatible encoder (LidarEncoderConf.variant ==
    'sparse_import') — the SparseEncoder lidar branch. With the TPU-first
    dense lidar encoder the lidar keys are skipped (architecturally
    different; retrain or distill — see models/lidar_encoder.py).

    state_dict keys may carry the Lightning 'model.' prefix
    (load_torch_state_dict strips it)."""
    sd = state_dict
    params, stats = {}, {}
    if cfg.use_cam:
        bb = cfg.get_backbone_conf()
        bk_p, bk_s = {}, {}
        bk_p['img_backbone'], bk_s['img_backbone'] = convert_mmdet_resnet(
            sd, depth=bb.img_backbone_conf.depth, num_stages=4,
            prefix='backbone.img_backbone.',
            stem_s2d=bb.img_backbone_conf.stem_s2d)
        bk_p['img_neck'], bk_s['img_neck'] = convert_second_fpn(
            sd, bb.img_neck_conf.upsample_strides,
            prefix='backbone.img_neck.')
        bk_p['depth_net'], bk_s['depth_net'] = convert_depth_net(
            sd, prefix='backbone.depth_net.')
        params['backbone'], stats['backbone'] = bk_p, bk_s
    params['head'], stats['head'] = convert_bev_head(
        sd, cfg.get_head_conf(), prefix='head.')
    if cfg.use_cam and cfg.use_lidar and any(
            k.startswith('bev_fuse.') for k in sd):
        params['bev_fuse'] = convert_fuse_layer(sd, prefix='bev_fuse.')
    lconf = cfg.get_lidar_conf()
    if (cfg.use_lidar and lconf.variant == 'sparse_import'
            and any(k.startswith('lidar_encoder.') for k in sd)):
        params['lidar_encoder'], stats['lidar_encoder'] = \
            convert_sparse_encoder(sd, lconf.encoder_channels,
                                   prefix='lidar_encoder.pts_middle_encoder.')
    return params, stats


def merge_subtree(variables: Dict, params: Dict, stats: Dict,
                  scope: str = '') -> Dict:
    """Graft converted (params, batch_stats) into a model's variables at
    ``scope`` ('' = the whole model). Shape-checked leaf-by-leaf."""
    return _merge(variables, (params, stats), scope)


def _merge(variables: Dict, pretrained: Tuple[Dict, Dict],
           scope: str) -> Dict:
    import flax
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

    out = flax.core.unfreeze(out) if hasattr(flax.core, 'unfreeze') else out
    node_p = out['params']
    node_s = out.get('batch_stats', {})
    parts = [p for p in scope.split('/') if p]
    for part in parts:
        node_p = node_p[part]
        # per-part membership, not collection truthiness: a BN-free scope
        # (e.g. the fuse layer) exists under params but not batch_stats,
        # and indexing the non-empty stats tree would KeyError
        node_s = node_s[part] if part in node_s else {}
    graft(node_p, p_new, scope)
    if node_s and s_new:
        graft(node_s, s_new, scope)
    return out


def merge_pretrained_backbone(variables: Dict, pretrained: Tuple[Dict, Dict],
                              scope: str = 'backbone/img_backbone') -> Dict:
    """Graft converted (params, batch_stats) into a model's variables at
    ``scope`` (path into both collections, '/'-separated). Shapes are
    checked leaf-by-leaf."""
    return _merge(variables, pretrained, scope)

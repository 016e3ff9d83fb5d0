"""Full-pipeline decode parity: converted torch weights, forward -> boxes.

VERDICT r2 item 6: per-module activation parity (<1e-4) cannot catch error
COMPOUNDING across the ~50 modules of the camera branch + head, nor a
decode-semantics drift. Here the torch replicas (mmdet naming, randomized
weights AND BN running stats) are chained into one reference-shaped camera
model, converted via convert_reference_checkpoint, and both stacks run the
whole pipeline on the same batch:

  torch:  ResNet18 -> SECONDFPN -> DepthNet(+DCN) -> softmax-depth lift ->
          numpy splat (independent scatter loops over the golden-tested
          frustum geometry) -> BEVDepthHead -> independent numpy decode
          (CenterPointBBoxCoder semantics) + the numba-replica circle NMS
  flax:   BEVDepthLiDAR.apply -> decode_boxes

Pass = box-level agreement: same kept-box count, centers < 1e-3 m apart,
scores < 1e-4, labels equal.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.core.geometry import (create_frustum, get_geometry,
                                           quantize_geometry)
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR
from mm_training_tpu.models import torch_import as ti

from tests.test_models.test_activation_parity import (TBEVHead, TDepthNet,
                                                      TResNet, TSECONDFPN,
                                                      _randomize_bn)
from tests.test_ops.test_circle_nms import _reference_circle_nms


def _build_torch_model(cfg):
    import torch.nn as nn
    bb = cfg.get_backbone_conf()

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

    torch.manual_seed(7)
    m = TModel()
    _randomize_bn(m)
    return m.eval()


def _bev_geometry(bb):
    """Mirror of LSSFPN._bev_geometry (splat grid with bev_pool_downsample)."""
    ds = bb.bev_pool_downsample
    bounds = [(bb.x_bound[0], bb.x_bound[1], bb.x_bound[2] * ds),
              (bb.y_bound[0], bb.y_bound[1], bb.y_bound[2] * ds),
              bb.z_bound]
    vs = tuple(b[2] for b in bounds)
    vc = tuple(b[0] + b[2] / 2.0 for b in bounds)
    vn = tuple(int(round((b[1] - b[0]) / b[2])) for b in bounds)
    return vc, vs, vn


def _numpy_splat(depth, context, s2e, intr, bb):
    """General (non-factorized) lift-splat via np.add.at scatter loops.
    depth [B,N,D,fh,fw], context [B,N,C,fh,fw] -> [B, ny, nx, C]."""
    b, n, d, fh, fw = depth.shape
    c = context.shape[2]
    frustum = np.asarray(create_frustum(bb.d_bound, bb.final_dim,
                                        bb.downsample_factor))
    geom = np.asarray(get_geometry(jnp.asarray(frustum), jnp.asarray(s2e),
                                   jnp.asarray(intr)))     # [B,N,D,fh,fw,3]
    vc, vs, vn = _bev_geometry(bb)
    gidx = np.asarray(quantize_geometry(jnp.asarray(geom), vc, vs))
    nx, ny, nz = vn
    bev = np.zeros((b, ny * nx, c), np.float64)
    xi, yi, zi = gidx[..., 0], gidx[..., 1], gidx[..., 2]
    valid = ((xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
             & (zi >= 0) & (zi < nz))
    flat = yi * nx + xi
    for bi in range(b):
        for ni in range(n):
            # [D, fh, fw, C] outer product, scattered by BEV cell
            vals = (depth[bi, ni][..., None].astype(np.float64)
                    * context[bi, ni].transpose(1, 2, 0)[None])
            m = valid[bi, ni]
            np.add.at(bev[bi], flat[bi, ni][m], vals[m])
    return bev.reshape(b, ny, nx, c).astype(np.float32)


def _numpy_decode(conf, task_preds):
    """Independent CenterPointBBoxCoder.decode + circle NMS replica
    (mmdet3d semantics; conf_aim.py:138-175). task_preds: list over tasks of
    dicts of NHWC numpy maps. Returns per-batch list of (boxes, scores,
    labels) for kept boxes."""
    bc, tc = conf.bbox_coder, conf.test_cfg
    osf, vx, vy = bc.out_size_factor, bc.voxel_size[0], bc.voxel_size[1]
    out = None
    for t, pred in enumerate(task_preds):
        heat = 1.0 / (1.0 + np.exp(-pred['heatmap']))
        b, h, w, c = heat.shape
        k = min(bc.max_num, h * w * c)
        if out is None:
            out = [([], [], []) for _ in range(b)]
        offs = 0
        for tt in range(t):
            offs += task_preds[tt]['heatmap'].shape[-1]
        for bi in range(b):
            flat = heat[bi].reshape(-1)
            idx = np.argsort(-flat)[:k]
            scores = flat[idx]
            cls = idx % c
            pix = idx // c
            ys, xs = (pix // w).astype(np.float64), (pix % w).astype(np.float64)
            reg = pred['reg'][bi].reshape(h * w, -1)[pix]
            hei = pred['height'][bi].reshape(h * w)[pix]
            dim = np.exp(pred['dim'][bi].reshape(h * w, 3)[pix])
            rot = pred['rot'][bi].reshape(h * w, 2)[pix]
            vel = pred['vel'][bi].reshape(h * w, 2)[pix]
            x = (xs + reg[:, 0]) * osf * vx + bc.pc_range[0]
            y = (ys + reg[:, 1]) * osf * vy + bc.pc_range[1]
            yaw = np.arctan2(rot[:, 0], rot[:, 1])
            boxes = np.stack([x, y, hei, dim[:, 0], dim[:, 1], dim[:, 2],
                              yaw, vel[:, 0], vel[:, 1]], -1)
            pr = np.asarray(bc.post_center_range)
            valid = (scores > bc.score_threshold)
            valid &= (boxes[:, :3] >= pr[:3]).all(-1)
            valid &= (boxes[:, :3] <= pr[3:]).all(-1)
            keep = _reference_circle_nms(boxes[:, :2], scores, valid,
                                         tc.min_radius[t])
            order = np.argsort(-np.where(keep, scores, -np.inf))
            order = order[:min(tc.post_max_size, k)]
            order = order[keep[order]]
            kb = boxes[order].copy()
            kb[:, 2] -= kb[:, 5] / 2.0  # gravity z -> bottom z
            out[bi][0].append(kb)
            out[bi][1].append(scores[order])
            out[bi][2].append(cls[order] + offs)
    return [(np.concatenate(bs), np.concatenate(ss), np.concatenate(ls))
            for bs, ss, ls in out]


@pytest.mark.slow
def test_full_pipeline_box_parity():
    cfg = tiny_test_config(use_cam=True, use_lidar=False, use_radar=False,
                           batch_size=1)
    import dataclasses
    # general splat on both sides: exact for any rig
    cfg = cfg.replace(backbone_conf=dataclasses.replace(
        cfg.get_backbone_conf(), factorized_splat=False))
    bb = cfg.get_backbone_conf()
    head_conf = cfg.get_head_conf()

    tmodel = _build_torch_model(cfg)
    sd = {k: v for k, v in tmodel.state_dict().items()}
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params, stats = ti.convert_reference_checkpoint(sd, cfg)

    # ---- shared inputs: normalized images + rig mats
    fb = make_fake_batch(cfg, batch_size=1, seed=3)
    rng = np.random.default_rng(11)
    b, s, n = 1, 1, cfg.num_cameras
    h, w = cfg.final_dim
    imgs = rng.standard_normal((b, s, n, h, w, 3)).astype(np.float32)
    batch = {'imgs': jnp.asarray(imgs),
             'sensor2ego': jnp.asarray(fb['sensor2ego']),
             'intrin': jnp.asarray(fb['intrin']),
             'flipped': jnp.zeros((b * s * n,), bool),
             'bda_mat': jnp.eye(4)[None].repeat(b, 0),
             'points': jnp.asarray(fb['points']),
             'point_mask': jnp.asarray(fb['point_mask'])}

    # ---- flax pipeline
    model = BEVDepthLiDAR(cfg)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch, None, False)
    merged = ti.merge_subtree(variables, params, stats)
    preds, _, _, _ = model.apply(merged, batch, None, False)
    from mm_training_tpu.models import decode_boxes
    fboxes, fscores, flabels, fvalid = decode_boxes(head_conf, preds)

    # ---- torch + numpy pipeline
    with torch.no_grad():
        x = torch.from_numpy(imgs.reshape(b * n, h, w, 3)
                             .transpose(0, 3, 1, 2)).contiguous()
        feats = tmodel.backbone.img_backbone(x)
        neck = tmodel.backbone.img_neck(feats)
        dout = tmodel.backbone.depth_net(neck).numpy()   # [BN, D+C, fh, fw]
    d_ch, c_out = bb.depth_channels, bb.output_channels
    logits = dout[:, :d_ch]
    depth = np.exp(logits - logits.max(1, keepdims=True))
    depth /= depth.sum(1, keepdims=True)
    context = dout[:, d_ch:d_ch + c_out]
    fh, fw = bb.feat_hw
    bev = _numpy_splat(depth.reshape(b, n, d_ch, fh, fw),
                       context.reshape(b, n, c_out, fh, fw),
                       fb['sensor2ego'][:, 0], fb['intrin'][:, 0], bb)
    with torch.no_grad():
        touts = tmodel.head(torch.from_numpy(
            bev.transpose(0, 3, 1, 2)).contiguous())
    task_preds = [{k: v.numpy().transpose(0, 2, 3, 1) for k, v in d.items()}
                  for d in touts]
    ref = _numpy_decode(head_conf, task_preds)

    # ---- box-level comparison
    for bi in range(b):
        rb, rs, rl = ref[bi]
        v = np.asarray(fvalid[bi])
        gb, gs, gl = (np.asarray(fboxes[bi])[v], np.asarray(fscores[bi])[v],
                      np.asarray(flabels[bi])[v])
        assert len(gb) == len(rb), (len(gb), len(rb))
        assert len(rb) > 0, 'degenerate test: no boxes decoded'
        # greedy nearest-center 1-1 matching per label (score-order matching
        # is fragile: near-tied scores can swap rank under ~1e-6 fp noise,
        # pairing unrelated far-apart boxes)
        used = np.zeros(len(rb), bool)
        for k in range(len(gb)):
            cand = np.flatnonzero((rl == gl[k]) & ~used)
            assert len(cand), f'no unmatched ref box with label {gl[k]}'
            d = np.linalg.norm(rb[cand, :2] - gb[k, :2], axis=1)
            j = cand[int(d.argmin())]
            used[j] = True
            err = float(np.linalg.norm(gb[k, :2] - rb[j, :2]))
            assert err < 1e-3, f'center error {err} (label {gl[k]})'
            np.testing.assert_allclose(gs[k], rs[j], atol=1e-4)
            np.testing.assert_allclose(gb[k, 3:6], rb[j, 3:6],
                                       rtol=1e-3, atol=1e-3)
        assert used.all()


def _numpy_voxelize(points, mask, pc_range, voxel, grid_hw, cap):
    """Hard-voxelize + HardSimpleVFE mean over the first 5 features with the
    reference's first-``cap``-points-in-order subsampling (mmdet3d
    Voxelization max_num_points=15 semantics; conf_aim.py:194-201).
    Independent loop formulation (generalizes tests/test_ops/test_voxelize
    ._reference to arbitrary geometry)."""
    ny, nx = grid_hw
    sums = np.zeros((ny, nx, 5), np.float64)
    cnts = np.zeros((ny, nx), np.int64)
    for p, m in zip(points, mask):
        if not m:
            continue
        xi = int(np.floor((p[0] - pc_range[0]) / voxel[0]))
        yi = int(np.floor((p[1] - pc_range[1]) / voxel[1]))
        zi = int(np.floor((p[2] - pc_range[2]) / voxel[2]))
        if not (0 <= xi < nx and 0 <= yi < ny and zi == 0):
            continue
        if cnts[yi, xi] >= cap:
            continue
        sums[yi, xi] += p[:5]
        cnts[yi, xi] += 1
    grid = (sums / np.maximum(cnts[..., None], 1)).astype(np.float32)
    return grid, cnts > 0


@pytest.mark.slow
def test_full_pipeline_box_parity_fused_lrc():
    """VERDICT r4 #2: the fused LiDAR+radar+camera chain — the configuration
    every released reference checkpoint ships in (bev_depth.py:163-200) —
    compared at BOX level. torch/numpy side: voxelize -> HardSimpleVFE ->
    the site-by-site sparse-conv SparseEncoder reference -> TFuse gating ->
    TBEVHead -> independent numpy decode + circle NMS. flax side: one
    BEVDepthLiDAR.apply on weights converted with the production
    convert_reference_checkpoint (lidar_encoder/bev_fuse/backbone/head all
    through the one full-checkpoint path)."""
    import dataclasses
    import torch as _torch
    from mm_training_tpu.configs import LidarEncoderConf, VoxelizationConf
    from mm_training_tpu.models import decode_boxes
    from tests.test_models.test_activation_parity import TFuse
    from tests.test_models.test_sparse_encoder import (CHANNELS,
                                                       _make_state_dict,
                                                       np_sparse_encoder)

    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True,
                           batch_size=1)
    cfg = cfg.replace(
        backbone_conf=dataclasses.replace(cfg.get_backbone_conf(),
                                          factorized_splat=False),
        lidar_conf=LidarEncoderConf(
            variant='sparse_import',
            voxelization=VoxelizationConf(max_num_points=15,
                                          max_voxels=25000)))
    bb = cfg.get_backbone_conf()
    head_conf = cfg.get_head_conf()
    ny, nx = cfg.out_shape

    # ---- one combined reference-named state dict, converted in one call
    tmodel = _build_torch_model(cfg)
    tfuse = TFuse(cfg.fuse_layer_in_channels).eval()
    rng = np.random.default_rng(21)
    sparse_sd = _make_state_dict(rng)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    sd.update({f'bev_fuse.{k}': v.detach().numpy()
               for k, v in tfuse.state_dict().items()})
    sd.update({f'lidar_encoder.pts_middle_encoder.{k}': np.asarray(v)
               for k, v in sparse_sd.items()})
    params, stats = ti.convert_reference_checkpoint(sd, cfg)

    # ---- shared inputs
    fb = make_fake_batch(cfg, batch_size=1, seed=5)
    b, s, n = 1, 1, cfg.num_cameras
    h, w = cfg.final_dim
    imgs = rng.standard_normal((b, s, n, h, w, 3)).astype(np.float32)
    npts = 512
    pts = np.zeros((npts, 8), np.float32)
    pc = cfg.point_cloud_range
    pts[:, 0] = rng.uniform(pc[0] - 2, pc[3] + 2, npts)  # some out of range
    pts[:, 1] = rng.uniform(pc[1] - 2, pc[4] + 2, npts)
    pts[:, 2] = rng.uniform(pc[2], pc[5], npts)
    pts[:, 3:] = rng.normal(size=(npts, 5)).astype(np.float32)
    pmask = rng.random(npts) > 0.1
    batch = {'imgs': jnp.asarray(imgs),
             'sensor2ego': jnp.asarray(fb['sensor2ego']),
             'intrin': jnp.asarray(fb['intrin']),
             'flipped': jnp.zeros((b * s * n,), bool),
             'bda_mat': jnp.eye(4)[None].repeat(b, 0),
             'points': jnp.asarray(pts)[None],
             'point_mask': jnp.asarray(pmask)[None]}

    # ---- flax: the whole fused pipeline in one apply
    model = BEVDepthLiDAR(cfg)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch, None, False)
    merged = ti.merge_subtree(variables, params, stats)
    preds, _, _, _ = model.apply(merged, batch, None, False)
    fboxes, fscores, flabels, fvalid = decode_boxes(head_conf, preds)

    # ---- torch/numpy: camera branch
    with torch.no_grad():
        x = torch.from_numpy(imgs.reshape(b * n, h, w, 3)
                             .transpose(0, 3, 1, 2)).contiguous()
        feats = tmodel.backbone.img_backbone(x)
        neck = tmodel.backbone.img_neck(feats)
        dout = tmodel.backbone.depth_net(neck).numpy()
    d_ch, c_out = bb.depth_channels, bb.output_channels
    logits = dout[:, :d_ch]
    depth = np.exp(logits - logits.max(1, keepdims=True))
    depth /= depth.sum(1, keepdims=True)
    context = dout[:, d_ch:d_ch + c_out]
    fh, fw = bb.feat_hw
    cam_bev = _numpy_splat(depth.reshape(b, n, d_ch, fh, fw),
                           context.reshape(b, n, c_out, fh, fw),
                           fb['sensor2ego'][:, 0], fb['intrin'][:, 0], bb)

    # ---- torch/numpy: lidar branch (voxelize -> VFE -> sparse encoder)
    grid, occ = _numpy_voxelize(pts, pmask, pc, cfg.voxel_size, (ny, nx),
                                cap=15)
    sites = {(0, int(yi), int(xi)): grid[yi, xi].astype(np.float64)
             for yi, xi in zip(*np.nonzero(occ))}
    lidar_chw = np_sparse_encoder(sparse_sd, sites, (41, ny, nx))
    lidar_bev = lidar_chw[None].transpose(0, 2, 3, 1)  # [1, ny/8, nx/8, 256]
    assert lidar_bev.shape[1:3] == cam_bev.shape[1:3], \
        'fused test requires matching BEV grids (no resize fallback)'

    # ---- torch/numpy: fuse -> head -> decode
    fused_in = np.concatenate([cam_bev, lidar_bev.astype(np.float32)], -1)
    with torch.no_grad():
        fused = tfuse(_torch.from_numpy(
            fused_in.transpose(0, 3, 1, 2)).contiguous())
        touts = tmodel.head(fused)
    task_preds = [{k: v.numpy().transpose(0, 2, 3, 1) for k, v in d.items()}
                  for d in touts]
    ref = _numpy_decode(head_conf, task_preds)

    # ---- box-level comparison (same protocol as the camera-only test)
    for bi in range(b):
        rb, rs, rl = ref[bi]
        v = np.asarray(fvalid[bi])
        gb, gs, gl = (np.asarray(fboxes[bi])[v], np.asarray(fscores[bi])[v],
                      np.asarray(flabels[bi])[v])
        assert len(gb) == len(rb), (len(gb), len(rb))
        assert len(rb) > 0, 'degenerate test: no boxes decoded'
        used = np.zeros(len(rb), bool)
        for k in range(len(gb)):
            cand = np.flatnonzero((rl == gl[k]) & ~used)
            assert len(cand), f'no unmatched ref box with label {gl[k]}'
            d = np.linalg.norm(rb[cand, :2] - gb[k, :2], axis=1)
            j = cand[int(d.argmin())]
            used[j] = True
            err = float(np.linalg.norm(gb[k, :2] - rb[j, :2]))
            assert err < 1e-3, f'center error {err} (label {gl[k]})'
            np.testing.assert_allclose(gs[k], rs[j], atol=1e-4)
            np.testing.assert_allclose(gb[k, 3:6], rb[j, 3:6],
                                       rtol=1e-3, atol=1e-3)
        assert used.all()

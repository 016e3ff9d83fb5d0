"""CenterPoint-style BEV detection head (flax, NHWC) + targets/loss/decode.

Re-design of layers/heads/bev_depth_head.py (BEVDepthHead subclassing mmdet3d
CenterHead) and the mmdet3d pieces it inherits:
  * forward: ResNet18 BEV trunk -> SECONDFPN neck -> shared conv -> per-task
    SeparateHead branches {reg, height, dim, rot, vel, heatmap}
    (bev_depth_head.py:75-111; CenterHead/SeparateHead from mmdet3d)
  * get_targets: the reference's per-object Python loop
    (bev_depth_head.py:113-254) becomes a fully vectorized, jitted scatter
    over max_objs padded boxes
  * loss: GaussianFocalLoss(alpha 2, gamma 4) heatmap + masked L1 on the
    10-dim anno_box with code_weights, cross-device `reduce_mean` of the
    normalizers via lax.pmean (bev_depth_head.py:256-312)
  * get_bboxes: CenterPointBBoxCoder decode (top-k, exp dims, atan2 rot,
    post-center-range mask) + on-device circle NMS, fixed-shape outputs
    (conf_aim.py:138-148,163-175)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import HeadConf
from ..ops.circle_nms import circle_nms_mask
from ..ops.gaussian import draw_heatmap, gaussian_radius
from .bn_fold import batch_norm
from .resnet import ConvBN, ResNet
from .second_fpn import SECONDFPN

__all__ = ['BEVDepthHead', 'get_targets', 'detection_loss', 'decode_boxes',
           'clip_sigmoid']


# --------------------------------------------------------------------- modules

class SeparateHead(nn.Module):
    """Per-task branch heads (mmdet3d SeparateHead: num_conv-1 ConvModules +
    final conv; heatmap final bias = init_bias)."""
    heads: Tuple[Tuple[str, Tuple[int, int]], ...]
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = {}
        k = self.final_kernel
        for name, (out_ch, num_conv) in self.heads:
            h = x
            for i in range(num_conv - 1):
                h = nn.Conv(self.head_conv, (k, k), padding='SAME',
                            name=f'{name}_conv{i}')(h)
                h = batch_norm(self, h, train, axis_name=self.bn_axis_name,
                               name=f'{name}_bn{i}')
                h = nn.relu(h)
            bias_init = (nn.initializers.constant(self.init_bias)
                         if name == 'heatmap' else nn.initializers.zeros)
            h = nn.Conv(out_ch, (k, k), padding='SAME', bias_init=bias_init,
                        name=f'{name}_final')(h)
            out[name] = h
        return out


class BEVDepthHead(nn.Module):
    """BEV trunk + neck + CenterPoint task heads.

    Input:  [B, H/8, W/8, C_fuse] BEV features.
    Output: list over tasks of dicts of [B, H/4, W/4, ch] maps (NHWC;
    the output map is 2x the input — trunk stem /4 + neck x8 deconvs,
    bev_depth_head.py:108-110).
    """
    conf: HeadConf
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bb = self.conf.bev_backbone_conf
        trunk = ResNet(depth=18, base_channels=bb.base_channels,
                       num_stages=bb.num_stages, strides=bb.strides,
                       out_indices=bb.out_indices,
                       bn_axis_name=self.bn_axis_name, name='trunk')
        nk = self.conf.bev_neck_conf
        neck = SECONDFPN(out_channels=nk.out_channels,
                         upsample_strides=nk.upsample_strides,
                         bn_axis_name=self.bn_axis_name, name='neck')
        feats = trunk(x, train)
        fpn = neck(feats, train)
        shared = ConvBN(64, 3, 1, bn_axis_name=self.bn_axis_name,
                        name='shared_conv')(fpn, train)
        rets = []
        for ti, task in enumerate(self.conf.tasks):
            heads = self.conf.common_heads + (
                ('heatmap', (task.num_class, 2)),)
            rets.append(SeparateHead(heads=heads,
                                     init_bias=self.conf.init_bias,
                                     final_kernel=self.conf.final_kernel,
                                     bn_axis_name=self.bn_axis_name,
                                     name=f'task{ti}')(shared, train))
        return rets


# ------------------------------------------------------------------ targets

def clip_sigmoid(x, eps: float = 1e-4):
    """mmdet3d clip_sigmoid (bev_depth_head.py:272)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def _task_class_offsets(conf: HeadConf) -> List[int]:
    offs, flag = [], 0
    for t in conf.tasks:
        offs.append(flag)
        flag += t.num_class
    return offs


def get_targets(conf: HeadConf, gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                gt_mask: jnp.ndarray):
    """Vectorized target generation for one sample.

    Args:
      gt_boxes:  [K, 9] padded boxes (x, y, z, dx, dy, dz, yaw, vx, vy).
      gt_labels: [K] int32 class ids (global, 0-based).
      gt_mask:   [K] bool.

    Returns per-task lists (length n_tasks):
      heatmaps [C_t, H, W], anno_boxes [max_objs, 10], inds [max_objs] int32,
      masks [max_objs] float32.
    Classes not covered by any task (e.g. class 4 'other') produce no targets,
    exactly like the reference's per-task torch.where selection
    (bev_depth_head.py:139-162).
    """
    tc = conf.train_cfg
    osf = tc.out_size_factor
    vx, vy = tc.voxel_size[0], tc.voxel_size[1]
    pcx, pcy = tc.point_cloud_range[0], tc.point_cloud_range[1]
    w = tc.grid_size[0] // osf
    h = tc.grid_size[1] // osf
    max_objs = tc.max_objs * tc.dense_reg
    k = gt_boxes.shape[0]

    # feature-map geometry for every padded object
    coor_x = (gt_boxes[:, 0] - pcx) / vx / osf
    coor_y = (gt_boxes[:, 1] - pcy) / vy / osf
    cx_int = coor_x.astype(jnp.int32)
    cy_int = coor_y.astype(jnp.int32)
    width_f = gt_boxes[:, 3] / vx / osf
    length_f = gt_boxes[:, 4] / vy / osf
    radius_f = gaussian_radius((length_f, width_f), tc.gaussian_overlap)
    radius = jnp.maximum(tc.min_radius, radius_f.astype(jnp.int32))
    size_ok = (width_f > 0) & (length_f > 0)
    in_map = (cx_int >= 0) & (cx_int < w) & (cy_int >= 0) & (cy_int < h)

    yaw = gt_boxes[:, 6]
    anno_all = jnp.stack([
        coor_x - cx_int.astype(coor_x.dtype),
        coor_y - cy_int.astype(coor_y.dtype),
        gt_boxes[:, 2],
        jnp.log(jnp.maximum(gt_boxes[:, 3], 1e-12)),
        jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-12)),
        jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-12)),
        jnp.sin(yaw), jnp.cos(yaw),
        gt_boxes[:, 7], gt_boxes[:, 8],
    ], axis=-1)                                                   # [K, 10]
    ind_all = cy_int * w + cx_int

    heatmaps, anno_boxes, inds, masks = [], [], [], []
    offs = _task_class_offsets(conf)
    for ti, task in enumerate(conf.tasks):
        member = gt_mask & (gt_labels >= offs[ti]) & (gt_labels < offs[ti] + task.num_class)
        draw_ok = member & size_ok & in_map

        hm = []
        for ci in range(task.num_class):
            cls_ok = draw_ok & (gt_labels == offs[ti] + ci)
            hm.append(draw_heatmap(jnp.stack([cx_int, cy_int], -1), radius,
                                   cls_ok, (h, w)))
        heatmaps.append(jnp.stack(hm, axis=0))

        # order-preserving slot assignment within the task (the reference
        # enumerates each task's own box list; bev_depth_head.py:184-186)
        slot = jnp.cumsum(member.astype(jnp.int32)) - 1
        slot = jnp.where(draw_ok & (slot < max_objs), slot, max_objs)

        anno = jnp.zeros((max_objs + 1, 10), jnp.float32).at[slot].set(anno_all)
        ind = jnp.zeros((max_objs + 1,), jnp.int32).at[slot].set(ind_all)
        msk = jnp.zeros((max_objs + 1,), jnp.float32).at[slot].set(1.0)
        anno_boxes.append(anno[:max_objs])
        inds.append(ind[:max_objs])
        masks.append(msk[:max_objs])

    return heatmaps, anno_boxes, inds, masks


def get_targets_batch(conf: HeadConf, gt_boxes, gt_labels, gt_mask):
    """vmapped get_targets over the batch dimension."""
    return jax.vmap(lambda b, l, m: get_targets(conf, b, l, m))(
        gt_boxes, gt_labels, gt_mask)


# -------------------------------------------------------------------- losses

def gaussian_focal_loss(pred, target, avg_factor, alpha=2.0, gamma=4.0,
                        weight=None):
    """mmdet GaussianFocalLoss with reduction='mean' + avg_factor.
    ``weight`` (broadcastable to pred) masks eval-padding samples."""
    eps = 1e-12
    pos = (target == 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - target, gamma)
    pos_loss = -jnp.log(pred + eps) * jnp.power(1 - pred, alpha) * pos
    neg_loss = -jnp.log(1 - pred + eps) * jnp.power(pred, alpha) * neg_weights * (1 - pos)
    loss = pos_loss + neg_loss
    if weight is not None:
        loss = loss * weight
    return loss.sum() / avg_factor


def _pmean(x, axis_name: Optional[str]):
    """Cross-device mean — the TPU equivalent of mmdet's reduce_mean over
    NCCL (bev_depth_head.py:274,300)."""
    return jax.lax.pmean(x, axis_name) if axis_name is not None else x


def detection_loss(conf: HeadConf, targets, preds: List[Dict[str, jnp.ndarray]],
                   axis_name: Optional[str] = None,
                   sample_mask: Optional[jnp.ndarray] = None):
    """Total detection loss (bev_depth_head.py:256-312).

    targets: batched (heatmaps, anno_boxes, inds, masks) from
      get_targets_batch — heatmaps[t] is [B, C_t, H, W].
    preds:   list over tasks of NHWC head maps.
    sample_mask: optional [B] validity — padded eval samples (loader
      pad_last) are excluded from every sum and normalizer, so the loss of
      a padded batch equals the loss of its valid prefix exactly.
    """
    heatmaps, anno_boxes, inds, masks = targets
    sm = None if sample_mask is None else sample_mask.astype(jnp.float32)
    total = 0.0
    for t, pred in enumerate(preds):
        hm_pred = clip_sigmoid(pred['heatmap'])                  # [B, H, W, C]
        hm_tgt = jnp.transpose(heatmaps[t], (0, 2, 3, 1))        # NCHW->NHWC
        pos = (hm_tgt == 1.0).astype(jnp.float32)
        hm_w = None if sm is None else sm[:, None, None, None]
        num_pos = (pos if hm_w is None else pos * hm_w).sum()
        cls_avg = jnp.maximum(_pmean(num_pos, axis_name), 1.0)
        loss_hm = gaussian_focal_loss(hm_pred, hm_tgt, cls_avg, weight=hm_w)

        anno_pred = jnp.concatenate(
            [pred['reg'], pred['height'], pred['dim'], pred['rot'], pred['vel']],
            axis=-1)                                             # [B, H, W, 10]
        b = anno_pred.shape[0]
        flat = anno_pred.reshape(b, -1, anno_pred.shape[-1])     # [B, HW, 10]
        gathered = jnp.take_along_axis(flat, inds[t][..., None], axis=1)

        tgt = anno_boxes[t]                                      # [B, K, 10]
        obj_m = masks[t] if sm is None else masks[t] * sm[:, None]
        m = obj_m[..., None] * jnp.isfinite(tgt).astype(jnp.float32)
        num = obj_m.sum()
        avg = jnp.maximum(_pmean(num, axis_name), 1e-4)
        cw = jnp.asarray(conf.train_cfg.code_weights, jnp.float32)
        tgt_safe = jnp.where(jnp.isfinite(tgt), tgt, 0.0)
        loss_bbox = (jnp.abs(gathered - tgt_safe) * m * cw).sum() / avg
        total = total + loss_hm + conf.loss_bbox_weight * loss_bbox
    return total


# -------------------------------------------------------------------- decode

def decode_boxes(conf: HeadConf, preds: List[Dict[str, jnp.ndarray]]):
    """CenterPoint decode + circle NMS, fixed shapes (on device, one jit).

    Returns (boxes [B, T*post_max, 9], scores, labels, valid) with z already
    converted to bottom-center (mmdet3d CenterHead.get_bboxes subtracts dz/2
    before wrapping in LiDARInstance3DBoxes).
    """
    bc = conf.bbox_coder
    tc = conf.test_cfg
    osf, vx, vy = bc.out_size_factor, bc.voxel_size[0], bc.voxel_size[1]
    pcx, pcy = bc.pc_range[0], bc.pc_range[1]
    post_range = jnp.asarray(bc.post_center_range, jnp.float32)
    offs = _task_class_offsets(conf)

    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for t, pred in enumerate(preds):
        heat = jax.nn.sigmoid(pred['heatmap'])                   # [B, H, W, C]
        b, h, w, c = heat.shape
        k = min(bc.max_num, h * w * c)
        flat = heat.reshape(b, -1)
        scores, idx = jax.lax.top_k(flat, k)                     # [B, K]
        cls = idx % c
        pix = idx // c
        ys = (pix // w).astype(jnp.float32)
        xs = (pix % w).astype(jnp.float32)

        def gather(m):
            return jnp.take_along_axis(m.reshape(b, h * w, -1), pix[..., None],
                                       axis=1)
        reg = gather(pred['reg'])
        hei = gather(pred['height'])[..., 0]
        dim = jnp.exp(gather(pred['dim']))
        rot = gather(pred['rot'])
        vel = gather(pred['vel'])

        x = (xs + reg[..., 0]) * osf * vx + pcx
        y = (ys + reg[..., 1]) * osf * vy + pcy
        yaw = jnp.arctan2(rot[..., 0], rot[..., 1])

        boxes = jnp.stack([x, y, hei, dim[..., 0], dim[..., 1], dim[..., 2],
                           yaw, vel[..., 0], vel[..., 1]], axis=-1)  # [B,K,9]

        valid = scores > bc.score_threshold
        center = boxes[..., :3]
        valid &= jnp.all(center >= post_range[:3], axis=-1)
        valid &= jnp.all(center <= post_range[3:], axis=-1)

        thresh = tc.min_radius[t]
        keep = jax.vmap(lambda cen, sc, va: circle_nms_mask(cen, sc, va, thresh))(
            boxes[..., :2], scores, valid)

        # top post_max_size kept, score order (candidates are already sorted)
        sel_scores = jnp.where(keep, scores, -jnp.inf)
        topv, topi = jax.lax.top_k(sel_scores, min(tc.post_max_size, k))
        boxes = jnp.take_along_axis(boxes, topi[..., None], axis=1)
        cls = jnp.take_along_axis(cls, topi, axis=1)
        kvalid = topv > -jnp.inf

        # gravity-center z -> bottom z (CenterHead.get_bboxes parity)
        boxes = boxes.at[..., 2].add(-boxes[..., 5] / 2.0)

        all_boxes.append(boxes)
        all_scores.append(jnp.where(kvalid, topv, 0.0))
        all_labels.append(cls + offs[t])
        all_valid.append(kvalid)

    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1),
            jnp.concatenate(all_labels, axis=1),
            jnp.concatenate(all_valid, axis=1))

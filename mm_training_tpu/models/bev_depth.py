"""Top-level multimodal BEV detector (flax, NHWC).

Re-design of models/bev_depth.py (BEVDepth / BEVDepthLiDAR): camera branch
(LSSFPN) and LiDAR/radar branch (pillar BEV encoder) fused by a gated concat
(BEVFuseLayer) and decoded by the CenterPoint head.

Branch plumbing parity (models/bev_depth.py:163-200):
  * BDA augmentation reaches the camera BEV as an on-device affine warp
    (bev_augment_image, :69-84) while the point cloud is BDA-transformed on
    the host (aimotive_dataset.py:152) — both reproduced here.
  * returns (preds, depth_pred, lidar_bev, cam_bev) like the reference.
  * both BEVs live on the grid/8 head-input resolution by design (see
    configs/base.py docstring), so no lidar upsample is needed; a bilinear
    resize fallback keeps parity with :188-189 for exotic configs.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops.warp import bda_bev_warp, resize_bilinear
from .centerpoint_head import BEVDepthHead
from .fusion import BEVFuseLayer
from .lidar_encoder import LidarBEVEncoder
from .lss_fpn import LSSFPN
from .sparse_encoder import ImportSparseEncoder

__all__ = ['BEVDepthLiDAR']


class BEVDepthLiDAR(nn.Module):
    cfg: Config
    bn_axis_name: Optional[str] = None
    # mesh axis name for spatial (BEV-x) sharding — the conv-net analog of
    # tensor/sequence parallelism: the 2048-cell x axis is split across the
    # axis and XLA SPMD inserts the conv halo exchanges. None = replicated.
    spatial_axis: Optional[str] = None

    def setup(self):
        cfg = self.cfg
        if cfg.use_cam:
            self.backbone = LSSFPN(cfg.get_backbone_conf(),
                                   bn_axis_name=self.bn_axis_name)
        if cfg.use_lidar:
            lconf = cfg.get_lidar_conf()
            enc_cls = (ImportSparseEncoder if lconf.variant == 'sparse_import'
                       else LidarBEVEncoder)
            self.lidar_encoder = enc_cls(
                lconf, pc_range=cfg.point_cloud_range,
                voxel_size=cfg.voxel_size, grid_hw=cfg.out_shape,
                bn_axis_name=self.bn_axis_name)
        if cfg.use_cam and cfg.use_lidar:
            self.bev_fuse = BEVFuseLayer(cfg.fuse_layer_in_channels)
        self.head = BEVDepthHead(cfg.get_head_conf(),
                                 bn_axis_name=self.bn_axis_name)

    def __call__(self, batch, depth_oracle=None, train: bool = False):
        """batch: dict with
             imgs        [B, S, N, H, W, C]   (normalized, timestamp dropped)
             sensor2ego  [B, S, N, 4, 4]
             intrin      [B, S, N, 4, 4]
             flipped     [B*S*N] bool
             points      [B, P, F]
             point_mask  [B, P]
             bda_mat     [B, 4, 4]
           depth_oracle: [B*N, fH, fW, D] or None
        Returns (preds, depth_pred, lidar_bev, cam_bev)."""
        cfg = self.cfg
        depth_pred, img_bev, lidar_bev = None, None, None
        # mixed precision: activations in compute dtype, geometry (points,
        # matrices) stays fp32 — bf16 ulp at 200 m is ~1 m, which would
        # corrupt voxel/pixel indices. Params are cast by the caller.
        cdtype = jnp.bfloat16 if cfg.precision == 'bf16' else jnp.float32

        if cfg.use_cam:
            img_bev, depth_pred = self.backbone(
                batch['imgs'].astype(cdtype), batch['sensor2ego'],
                batch['intrin'], batch['flipped'], depth_oracle, train)
            img_bev = bda_bev_warp(img_bev, batch['bda_mat'])

        if cfg.use_lidar:
            lidar_bev = self.lidar_encoder(batch['points'], batch['point_mask'],
                                           train, compute_dtype=cdtype)

        if cfg.use_cam and cfg.use_lidar:
            lb = lidar_bev
            if lb.shape[1:3] != img_bev.shape[1:3]:
                lb = resize_bilinear(lb, img_bev.shape[1:3])
            fused = self.bev_fuse(jnp.concatenate([img_bev, lb], axis=-1))
        elif cfg.use_cam:
            fused = img_bev
        else:
            fused = lidar_bev

        if self.spatial_axis is not None:
            from jax.sharding import PartitionSpec as P
            fused = jax.lax.with_sharding_constraint(
                fused, P(None, None, self.spatial_axis, None))

        preds = self.head(fused, train)
        return preds, depth_pred, lidar_bev, img_bev

"""LSSFPN: camera images -> BEV features (flax, NHWC, fully jitted).

Re-design of layers/backbones/lss_fpn.py:251-529. Differences from the
reference's CUDA path, by design:
  * the lift (softmax-depth x context outer product, lss_fpn.py:441-443) and
    the splat (voxel_pooling CUDA scatter, :463) are fused into the factorized
    ray-matrix matmul of ops.voxel_pooling.lift_splat — no D x C outer product
    is ever materialized.
  * the camera BEV is splatted directly onto the head-input grid (grid/8);
    sum-pooling is linear so this equals 4x-avg-pooling the reference's
    grid/4 splat (see configs/base.py for the rationale).
  * per-image horizontal flip undo is applied to the depth/context feature
    map before lifting (parity with lss_fpn.py:425).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import BackboneConf
from ..core.geometry import create_frustum, flat_bev_index, get_geometry, quantize_geometry
from ..ops.voxel_pooling import lift_splat, lift_splat_factorized
from .depth_net import DepthNet
from .resnet import ResNet
from .second_fpn import SECONDFPN

__all__ = ['LSSFPN']


class LSSFPN(nn.Module):
    conf: BackboneConf
    bn_axis_name: Optional[str] = None

    def setup(self):
        bb = self.conf.img_backbone_conf
        self.img_backbone = ResNet(depth=bb.depth, out_indices=bb.out_indices,
                                   bn_axis_name=self.bn_axis_name,
                                   stem_s2d=bb.stem_s2d)
        nk = self.conf.img_neck_conf
        self.img_neck = SECONDFPN(out_channels=nk.out_channels,
                                  upsample_strides=nk.upsample_strides,
                                  bn_axis_name=self.bn_axis_name)
        dn = self.conf.depth_net_conf
        self.depth_net = DepthNet(
            mid_channels=dn.mid_channels,
            context_channels=self.conf.output_channels,
            depth_channels=self.conf.depth_channels,
            use_dcn=dn.use_dcn,
            num_blocks=dn.num_blocks,
            bn_axis_name=self.bn_axis_name)

    @property
    def _bev_geometry(self):
        """(voxel_coord, voxel_size, voxel_num) of the splat grid —
        lss_fpn.py:278-289 with the extra bev_pool_downsample folded in."""
        c = self.conf
        ds = c.bev_pool_downsample
        bounds = [(c.x_bound[0], c.x_bound[1], c.x_bound[2] * ds),
                  (c.y_bound[0], c.y_bound[1], c.y_bound[2] * ds),
                  c.z_bound]
        voxel_size = tuple(b[2] for b in bounds)
        voxel_coord = tuple(b[0] + b[2] / 2.0 for b in bounds)
        voxel_num = tuple(int(round((b[1] - b[0]) / b[2])) for b in bounds)
        return voxel_coord, voxel_size, voxel_num

    def get_cam_feats(self, imgs, train: bool):
        """[B*N, H, W, 3] -> [B*N, fH, fW, 512] (lss_fpn.py:363-373)."""
        feats = self.img_backbone(imgs, train)
        return self.img_neck(feats, train)

    def _forward_single_sweep(self, imgs, sensor2ego, intrin, flipped,
                              depth_oracle, train: bool):
        """imgs [B, N, H, W, C]; mats [B, N, 4, 4]; flipped [B*N] bool;
        depth_oracle [B*N, fH, fW, D] or None.
        Returns (bev [B, bev_h, bev_w, C_out], depth [B*N, fH, fW, D])."""
        b, n = imgs.shape[0], imgs.shape[1]
        conf = self.conf
        d_ch = conf.depth_channels
        c_out = conf.output_channels

        x = imgs.reshape((b * n,) + imgs.shape[2:])
        feats = self.get_cam_feats(x, train)
        feat = self.depth_net(feats, train)          # [BN, fH, fW, D + C]
        depth = jax.nn.softmax(feat[..., :d_ch], axis=-1)

        # undo per-image hflip on the lifted features (lss_fpn.py:425).
        # softmax over the bin axis commutes with the spatial flip, so the
        # already-softmaxed depth is flipped directly (one softmax over
        # D~400 bins on the per-sweep hot path, not two); the flip-select
        # touches only the context slice, not all D+C channels
        flip_sel = flipped[:, None, None, None]
        depth_unflipped = jnp.where(flip_sel, jnp.flip(depth, axis=-2), depth)
        ctx = feat[..., d_ch:d_ch + c_out]
        context = jnp.where(flip_sel, jnp.flip(ctx, axis=-2), ctx)

        if depth_oracle is not None:
            # quirk parity: fg mask = max(oracle) > 0 is all-true for the
            # reference's one-hot labels, so the oracle fully replaces the
            # predicted depth (lss_fpn.py:427-439)
            fg = (jnp.max(depth_oracle, axis=-1, keepdims=True) > 0.0)
            lift_depth = jnp.where(fg, depth_oracle.astype(depth_unflipped.dtype),
                                   depth_unflipped)
        else:
            lift_depth = depth_unflipped

        frustum = jnp.asarray(create_frustum(conf.d_bound, conf.final_dim,
                                             conf.downsample_factor))
        geom = get_geometry(frustum, sensor2ego, intrin)       # [B,N,D,fH,fW,3]
        vc, vs, vn = self._bev_geometry
        gidx = quantize_geometry(geom, vc, vs)
        nx, ny, nz = vn
        g = nx * ny
        fh, fw = conf.feat_hw

        if conf.factorized_splat:
            # zero-roll/pitch rig: BEV (x, y) is image-row-independent, so
            # row 0's cells stand for every row; z validity stays per-row
            # (see ops/voxel_pooling.lift_splat_factorized)
            xi, yi = gidx[..., 0], gidx[..., 1]
            valid_xy = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
            flat_xy = jnp.where(valid_xy, yi * nx + xi, g)[:, :, :, 0, :]
            zvalid = (gidx[..., 2] >= 0) & (gidx[..., 2] < nz)
            dep4 = lift_depth.transpose(0, 3, 1, 2)            # [BN,D,fH,fW]
            bev_per_cam = lift_splat_factorized(
                dep4, context, flat_xy.reshape(b * n, d_ch, fw),
                zvalid.reshape(b * n, d_ch, fh, fw), g)        # [BN,G,C]
        else:
            flat = flat_bev_index(gidx, vn)                    # [B,N,D,fH,fW]
            p = fh * fw
            dep = lift_depth.reshape(b * n, p, d_ch).transpose(0, 2, 1)
            ctx = context.reshape(b * n, p, c_out)
            # index trash bin g stays g; cells are y*nx+x
            fi = flat.reshape(b * n, d_ch, p)
            bev_per_cam = lift_splat(dep, ctx, fi, g)          # [BN,G,C]

        bev = bev_per_cam.reshape(b, n, g, c_out).sum(axis=1)
        bev = bev.reshape(b, ny, nx, c_out)
        return bev, depth

    def __call__(self, imgs, sensor2ego, intrin, flipped, depth_oracle=None,
                 train: bool = False):
        """Multi-sweep forward (lss_fpn.py:469-529).

        imgs:        [B, S, N, H, W, C]
        sensor2ego:  [B, S, N, 4, 4]
        intrin:      [B, S, N, 4, 4]
        flipped:     [B*S*N] bool (aug bookkeeping; mm_training_aim.py:259)
        depth_oracle:[B*N, fH, fW, D] or None (key frame only)

        Returns (bev [B, bev_h, bev_w, S*C_out], key-frame depth).
        """
        b, s, n = imgs.shape[:3]
        flip_sweeps = flipped.reshape(b, s, n)  # [B*S*N] -> per-sweep masks
        key_bev, key_depth = self._forward_single_sweep(
            imgs[:, 0], sensor2ego[:, 0], intrin[:, 0],
            flip_sweeps[:, 0].reshape(-1), depth_oracle, train)
        if s == 1:
            return key_bev, key_depth
        bevs = [key_bev]
        for si in range(1, s):
            bev, _ = self._forward_single_sweep(
                imgs[:, si], sensor2ego[:, si], intrin[:, si],
                flip_sweeps[:, si].reshape(-1), None, train)
            bevs.append(jax.lax.stop_gradient(bev))  # no_grad sweeps (lss_fpn.py:517)
        return jnp.concatenate(bevs, axis=-1), key_depth

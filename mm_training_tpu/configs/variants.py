"""Experiment variants — data, not file copies.

Mirrors the reference's exps/configs/*.py ladder (lidar_only, lidar_radar,
lidar_cam, lidar_cam_radar, eval_*), which differ from the base config only in
modality flags, batch size, lr, eval split, and checkpoint path.
"""
from __future__ import annotations

from typing import Optional

from .base import (BackboneConf, BDAAugConf, Config, DepthNetConf, HeadConf,
                   ImageBackboneConf, ImageNeckConf, LidarEncoderConf,
                   VoxelizationConf)


def lidar_only(**kw) -> Config:
    """exps/configs/lidar_only.py: LiDAR-only, batch 4."""
    base = dict(experiment_name='lidar_only', batch_size=4,
                use_cam=False, use_lidar=True, use_radar=False,
                use_depth_loss=False)
    base.update(kw)
    return Config(**base)


def lidar_radar(**kw) -> Config:
    """exps/configs/lidar_radar.py: LiDAR+radar, batch 4."""
    base = dict(experiment_name='lidar_radar', batch_size=4,
                use_cam=False, use_lidar=True, use_radar=True,
                use_depth_loss=False)
    base.update(kw)
    return Config(**base)


def lidar_cam(**kw) -> Config:
    """exps/configs/lidar_cam.py: LiDAR+camera, batch 4."""
    base = dict(experiment_name='lidar_cam', batch_size=4,
                use_cam=True, use_lidar=True, use_radar=False,
                use_depth_loss=True)
    base.update(kw)
    return Config(**base)


def lidar_cam_radar(**kw) -> Config:
    """exps/configs/lidar_cam_radar.py: full fusion, batch 4, lr 3e-4/64*b."""
    base = dict(experiment_name='lidar_radar_cam', batch_size=4,
                use_cam=True, use_lidar=True, use_radar=True,
                use_depth_loss=True, base_learning_rate=3e-4)
    base.update(kw)
    return Config(**base)


def eval_lidar_only(eval_split: Optional[str] = 'night', ckpt_path: Optional[str] = None, **kw) -> Config:
    """exps/configs/eval_lidar_only.py."""
    return lidar_only(experiment_name='lidar_only_eval', eval_split=eval_split,
                      ckpt_path=ckpt_path, **kw)


def eval_lidar_radar(eval_split: Optional[str] = 'night', ckpt_path: Optional[str] = None, **kw) -> Config:
    """exps/configs/eval_lidar_radar.py."""
    return lidar_radar(experiment_name='lidar_radar_eval', eval_split=eval_split,
                       ckpt_path=ckpt_path, **kw)


def tiny_test_config(use_cam: bool = False, use_lidar: bool = True,
                     use_radar: bool = True, **kw) -> Config:
    """A miniature geometry for CPU tests: 51.2 x 25.6 m range, 256x128 grid,
    64x128 images, tiny capacities. Keeps all structural invariants
    (grid/8 head input, grid/4 target map, 409-like depth binning scaled
    down). The y extent keeps the BEV height a multiple of 128 so the head
    trunk (/4 stem + two stride-2 stages below the /8 input) never rounds.
    """
    pc = (-25.6, -12.8, -5.0, 25.6, 12.8, 3.0)
    base = dict(
        experiment_name='tiny', batch_size=2,
        H=64, W=128,
        precision='fp32',  # CPU tests: bf16 is emulated there; a dedicated
                           # test covers the bf16 path explicitly
        point_cloud_range=pc,
        use_cam=use_cam, use_lidar=use_lidar, use_radar=use_radar,
        use_depth_loss=use_cam,
        max_points_per_frame=2048,
        max_objs=32,
        num_cameras=2,
        backbone_conf=BackboneConf(
            x_bound=(pc[0], pc[3], 0.8), y_bound=(pc[1], pc[4], 0.8),
            z_bound=(pc[2], pc[5], 8.0), d_bound=(2.0, 27.2, 0.5),
            final_dim=(64, 128), output_channels=80, downsample_factor=16,
            img_backbone_conf=ImageBackboneConf(depth=18),
            img_neck_conf=ImageNeckConf(in_channels=(64, 128, 256, 512)),
            depth_net_conf=DepthNetConf(in_channels=512, mid_channels=64),
        ),
        lidar_conf=LidarEncoderConf(
            voxelization=VoxelizationConf(max_num_points=8, max_voxels=1024),
        ),
    )
    base.update(kw)
    return Config(**base)

from .base import (
    CATEGORY_MAPPING,
    CLASSES,
    BackboneConf,
    BBoxCoderConf,
    BDAAugConf,
    BEVBackboneConf,
    BEVNeckConf,
    Config,
    DepthNetConf,
    HeadConf,
    ImageBackboneConf,
    ImageNeckConf,
    LidarEncoderConf,
    TaskConf,
    TestCfg,
    TrainCfg,
    VoxelizationConf,
)
from .variants import (
    eval_lidar_only,
    eval_lidar_radar,
    lidar_cam,
    lidar_cam_radar,
    lidar_only,
    lidar_radar,
    tiny_test_config,
)

__all__ = [
    'CATEGORY_MAPPING', 'CLASSES', 'BackboneConf', 'BBoxCoderConf',
    'BDAAugConf', 'BEVBackboneConf', 'BEVNeckConf', 'Config', 'DepthNetConf',
    'HeadConf', 'ImageBackboneConf', 'ImageNeckConf', 'LidarEncoderConf',
    'TaskConf', 'TestCfg', 'TrainCfg', 'VoxelizationConf',
    'lidar_only', 'lidar_radar', 'lidar_cam', 'lidar_cam_radar',
    'eval_lidar_only', 'eval_lidar_radar', 'tiny_test_config',
]

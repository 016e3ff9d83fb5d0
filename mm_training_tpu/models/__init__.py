from .bev_depth import BEVDepthLiDAR
from .bn_fold import batch_norm, fold_conv_bn, fold_state
from .centerpoint_head import (BEVDepthHead, clip_sigmoid, decode_boxes,
                               detection_loss, get_targets, get_targets_batch)
from .depth_net import ASPP, DeformConv2d, DepthNet
from .fusion import BEVFuseLayer
from .lidar_encoder import LidarBEVEncoder
from .lss_fpn import LSSFPN
from .resnet import BasicBlock, Bottleneck, ConvBN, ResNet
from .second_fpn import SECONDFPN
from .sparse_encoder import ImportSparseEncoder

__all__ = [
    'ASPP', 'BEVDepthHead', 'BEVDepthLiDAR', 'BEVFuseLayer', 'BasicBlock',
    'Bottleneck', 'ConvBN', 'DeformConv2d', 'DepthNet', 'ImportSparseEncoder',
    'LSSFPN', 'LidarBEVEncoder', 'ResNet', 'SECONDFPN',
    'clip_sigmoid', 'decode_boxes', 'detection_loss', 'fold_conv_bn',
    'fold_state', 'get_targets', 'get_targets_batch', 'batch_norm',
]

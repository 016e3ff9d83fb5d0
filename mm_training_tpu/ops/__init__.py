from .circle_nms import circle_nms_mask
from .depth_labels import depth_labels, depth_labels_single_cam
from .gaussian import draw_heatmap, gaussian_radius
from .voxel_pooling import lift_splat, lift_splat_matrix, voxel_pooling
from .voxelize import voxelize_pillars_dense
from .warp import bda_bev_warp, hflip, resize_bilinear, warp_affine_nhwc

__all__ = [
    'circle_nms_mask', 'depth_labels', 'depth_labels_single_cam',
    'draw_heatmap', 'gaussian_radius', 'lift_splat', 'lift_splat_matrix',
    'voxel_pooling',
    'voxelize_pillars_dense', 'bda_bev_warp', 'hflip', 'resize_bilinear',
    'warp_affine_nhwc',
]

"""TPU-native compute ops replacing the reference CUDA extensions
(/root/reference/jmodt/ops): pointnet2 (FPS, ball query, grouping, 3-NN
interpolation), iou3d (rotated IoU + NMS), roipool3d (RoI point pooling)."""

from jmodt_tpu.ops.geometry import (
    boxes3d_to_bev,
    boxes3d_to_corners3d,
    boxes_center_dist_affinity,
    enlarge_box3d,
    height_overlap,
    points_in_boxes3d,
    rotate_points_along_y,
)
from jmodt_tpu.ops.grouping import (
    ball_query,
    group_all,
    group_points,
    group_xyz,
    query_and_group,
)
from jmodt_tpu.ops.interpolate import three_interpolate, three_nn
from jmodt_tpu.ops.nms import nms_bev
from jmodt_tpu.ops.roipool3d import roipool3d
from jmodt_tpu.ops.rotated_iou import (
    boxes_iou3d,
    boxes_iou_bev,
    boxes_overlap_bev,
    iou_bev_one_to_many,
    iou_normal_one_to_many,
)
from jmodt_tpu.ops.sampling import farthest_point_sample, gather_points, gather_xyz

__all__ = [
    'ball_query', 'boxes3d_to_bev', 'boxes3d_to_corners3d',
    'boxes_center_dist_affinity', 'boxes_iou3d', 'boxes_iou_bev',
    'boxes_overlap_bev', 'enlarge_box3d', 'farthest_point_sample',
    'gather_points', 'gather_xyz', 'group_all', 'group_points', 'group_xyz',
    'height_overlap', 'iou_bev_one_to_many', 'iou_normal_one_to_many',
    'nms_bev', 'points_in_boxes3d', 'query_and_group', 'roipool3d',
    'rotate_points_along_y', 'three_interpolate', 'three_nn',
]

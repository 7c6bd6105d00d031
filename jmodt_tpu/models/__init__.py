"""Flax model stack: LI-Fusion backbone, RPN, proposal layers, RCNN with
ReID branches, and the PointRCNN composite (reference
jmodt/detection/modeling + jmodt/detection/layers)."""

from jmodt_tpu.models.bbox_codec import decode_bbox_target
from jmodt_tpu.models.point_rcnn import PointRCNN

__all__ = ['PointRCNN', 'decode_bbox_target']

"""Offline evaluators: KITTI detection AP and CLEAR-MOT tracking metrics."""

from jmodt_tpu.eval.detection_ap import (evaluate_detections,
                                         get_label_annos,
                                         get_official_eval_result)

__all__ = ['evaluate_detections', 'get_label_annos',
           'get_official_eval_result']

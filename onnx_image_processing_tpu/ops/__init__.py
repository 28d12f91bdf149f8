"""Operator library: detectors, descriptors, orientation, matching, and utilities.

Functional analogue of the reference's ``pytorch_model/{detector,descriptor,
orientation,matching,utils,threshold,depth,pointcloud}`` nn.Module zoo
(SURVEY.md section 2): every op is a pure jit-compilable function with static shapes.
"""

from .shi_tomasi import shi_tomasi_score
from .orientation import angle_estimation, angle_estimation_multiscale
from .keypoints import nms_maxpool, select_topk_keypoints

__all__ = [
    "shi_tomasi_score",
    "angle_estimation",
    "angle_estimation_multiscale",
    "nms_maxpool",
    "select_topk_keypoints",
]

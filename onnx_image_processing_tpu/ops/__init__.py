"""Operator library: detectors, descriptors, orientation, matching, and utilities.

Functional analogue of the reference's ``pytorch_model/{detector,descriptor,
orientation,matching,utils,threshold,depth,pointcloud}`` nn.Module zoo
(SURVEY.md section 2): every op is a pure jit-compilable function with static shapes.
"""

from .shi_tomasi import shi_tomasi_score
from .fast import fast_score
from .dog import dog_responses, dog_score
from .akaze import nonlinear_diffusion, hessian_score, akaze_detect
from .orientation import (angle_estimation, angle_moments,
                          angle_estimation_multiscale)
from .keypoints import (
    nms_maxpool,
    select_topk_keypoints,
    nms_select_topk,
    refine_keypoints_subpixel,
)
from .bad import (
    BADParams,
    load_bad_params,
    dense_bad,
    sparse_bad,
    extract_descriptors_at_keypoints,
    extract_descriptors_at_keypoints_subpixel,
)
from .sinkhorn import (
    sinkhorn_match,
    sinkhorn_match_with_scores,
    sinkhorn_match_with_filters,
    probability_ratio_mask,
    dustbin_margin_mask,
)
from .match_extraction import extract_mutual_matches
from .outlier_filters import probability_ratio_filter, dustbin_margin_filter
from .threshold import otsu_threshold, multi_otsu_threshold
from .depth import (
    depth_to_pointcloud,
    depth_to_pointcloud_with_normal,
    depth_alignment,
    transform_points,
    points_to_pixels,
)
from .pointcloud import voxel_downsampling

__all__ = [
    "shi_tomasi_score",
    "fast_score",
    "dog_responses",
    "dog_score",
    "nonlinear_diffusion",
    "hessian_score",
    "akaze_detect",
    "angle_estimation",
    "angle_moments",
    "angle_estimation_multiscale",
    "nms_maxpool",
    "select_topk_keypoints",
    "nms_select_topk",
    "refine_keypoints_subpixel",
    "BADParams",
    "load_bad_params",
    "dense_bad",
    "sparse_bad",
    "extract_descriptors_at_keypoints",
    "extract_descriptors_at_keypoints_subpixel",
    "sinkhorn_match",
    "sinkhorn_match_with_scores",
    "sinkhorn_match_with_filters",
    "probability_ratio_mask",
    "dustbin_margin_mask",
    "extract_mutual_matches",
    "probability_ratio_filter",
    "dustbin_margin_filter",
    "otsu_threshold",
    "multi_otsu_threshold",
    "depth_to_pointcloud",
    "depth_to_pointcloud_with_normal",
    "depth_alignment",
    "transform_points",
    "points_to_pixels",
    "voxel_downsampling",
]

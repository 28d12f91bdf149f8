"""Geometry: in-graph weighted 8-point essential-matrix estimation
(`pytorch_model/geometry/`, SURVEY.md §2.5)."""

from .essential_matrix import (
    min_eigvec9,
    project_onto_essential_manifold,
    hartley_normalization,
    bidirectional_topk_weights,
    sampson_error_matched,
    essential_from_weighted_points,
    essential_from_matched_points,
    essential_ransac_from_candidates,
    estimate_essential_matrix,
    estimate_essential_from_keypoints,
)

__all__ = [
    "min_eigvec9",
    "project_onto_essential_manifold",
    "hartley_normalization",
    "bidirectional_topk_weights",
    "sampson_error_matched",
    "essential_from_weighted_points",
    "essential_from_matched_points",
    "essential_ransac_from_candidates",
    "estimate_essential_matrix",
    "estimate_essential_from_keypoints",
]

"""Core contracts: config dataclasses and framework-wide shape/dtype conventions.

Data contract (SURVEY.md §1): grayscale images are (B, 1, H, W) float32 in
[0, 255]; keypoints are (B, K, 2) float32 in (y, x) order with (-1, -1) padding
for invalid slots; matching output is (B, K+1, K+1) with a dustbin last
row/column (`pytorch_model/utils/keypoint_utils.py:104-114`,
`pytorch_model/matching/sinkhorn.py:164-168`).
"""

from .config import (
    MatcherConfig, AKAZEConfig, FASTConfig, DoGConfig, CameraConfig)

__all__ = ["MatcherConfig", "AKAZEConfig", "FASTConfig", "DoGConfig",
           "CameraConfig"]

"""AKAZE pipeline family: AKAZE detect → NMS/top-k → oriented SparseBAD → Sinkhorn.

Functional re-design of `pytorch_model/feature_detection/akaze_sparse_bad_sinkhorn
.py:27-196`. Shares the stacked-pair batching and keypoint-selection helpers with
the Shi-Tomasi family; descriptors sample the AKAZE orientation map at keypoints
and rotate BAD pair offsets (SparseBAD oriented mode).
"""

from __future__ import annotations

import jax

from ..core.config import MatcherConfig
from ..ops import akaze_detect, load_bad_params, sparse_bad, sinkhorn_match
from .shi_tomasi_family import (
    _resolve_border_margin,
    _select_keypoints,
    _stack_pair,
    _split_pair,
)


def akaze_detect_cfg(image: jax.Array, cfg: MatcherConfig):
    """AKAZE scores + orientations under a pipeline config."""
    a = cfg.akaze
    return akaze_detect(
        image, num_scales=a.num_scales,
        diffusion_iterations=a.diffusion_iterations, kappa=a.kappa,
        threshold=a.threshold, nms_size=a.nms_size,
        orientation_patch_size=a.orientation_patch_size,
        orientation_sigma=a.orientation_sigma,
        # The fused AKAZE ladder kernel is a measured-slower opt-in
        # (docs/KERNELS.md); it rides the fused-detect flag, NOT
        # cfg.use_pallas (which selects the descriptor SAMPLER backend and is
        # set True on TPU where the sampler kernel wins).
        use_pallas=cfg.fused_detect)


def akaze_sparse_detect_describe(images: jax.Array, cfg: MatcherConfig):
    """AKAZE sparse frontend: keypoints + scores + descriptors per image.

    Batch-parallel, so it serves the stacked two-image matcher and the
    per-image streaming frontend (`models/streaming.py`) identically. Note
    the descriptor samples the ORIGINAL image (not the diffused scale); only
    the orientation comes from AKAZE — matching the reference wiring
    (`akaze_sparse_bad_sinkhorn.py:190-192`).

    Returns:
        keypoints (B, K, 2), scores (B, K), descriptors (B, K, P).
    """
    # Orientation stays a DENSE map here, unlike the Shi-Tomasi frontend's
    # sampled moments: measured on v5e the per-keypoint tie select (sampling
    # ss/m10/m01 at K points, 9 gathers or 1 stacked gather) is 5-12% SLOWER
    # e2e (0.878 dense vs 0.922/0.984 ms sampled) — XLA fuses the S dense
    # atan2 passes and the tie multiply-sum into the moment-conv epilogues
    # for free, while the gathers are real added ops. The sampled
    # formulation remains available (`ops/akaze.py::akaze_detect_parts` +
    # `sparse_bad(angles=...)`, bit-equality pinned in
    # tests/test_pipelines.py) for callers that never need dense maps.
    scores, orient = akaze_detect_cfg(images, cfg)
    margin = _resolve_border_margin(cfg, sparse=True)
    kpts, kscores = _select_keypoints(scores, cfg, margin)
    desc = sparse_bad(images, kpts, load_bad_params(cfg.num_pairs),
                      orientation=orient, binarize=cfg.binarize,
                      soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
                      normalize_descriptors=cfg.normalize_descriptors,
                      sampling_mode=cfg.sampling_mode,
                      use_pallas=cfg.use_pallas,
                      integer_image=cfg.integer_image)
    return kpts, kscores, desc


def akaze_sparse_bad_sinkhorn_match(image1: jax.Array, image2: jax.Array,
                                    cfg: MatcherConfig):
    """AKAZE two-image matcher.

    Parity: `akaze_sparse_bad_sinkhorn.py:27-196`.

    Returns:
        keypoints1 (B, K, 2), keypoints2 (B, K, 2), P (B, K+1, K+1).
    """
    kpts, _, desc = akaze_sparse_detect_describe(_stack_pair(image1, image2),
                                                 cfg)
    kpts1, kpts2 = _split_pair(kpts)
    desc1, desc2 = _split_pair(desc)
    probs = sinkhorn_match(desc1, desc2, iterations=cfg.sinkhorn_iterations,
                           epsilon=cfg.epsilon, unused_score=cfg.unused_score,
                           distance_type=cfg.distance_type,
                           use_pallas=cfg.use_pallas)
    return kpts1, kpts2, probs

"""Matcher pipelines with in-graph essential-matrix output.

Functional re-design of
`pytorch_model/feature_detection/shi_tomasi_angle_sparse_bad_sinkhorn_essential
_matrix.py:34-361` and `akaze_sparse_bad_sinkhorn_essential_matrix.py:34-378`:
the flagship / AKAZE matcher plus the weighted 8-point solve on the actual
detected keypoints, one jit graph, 4 outputs. Batch size must be 1 (same
constraint as the reference, `:286-288`).

The camera intrinsics enter as a (3, 3) ``k_inv`` array argument (a runtime
input, not baked into the graph) so one compiled executable serves any camera.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import MatcherConfig
from ..geometry import estimate_essential_from_keypoints
from ..ops import (
    angle_moments,
    load_bad_params,
    shi_tomasi_score,
    sparse_bad,
    sinkhorn_match,
)
from .akaze_family import akaze_detect_cfg
from .shi_tomasi_family import (
    _resolve_border_margin,
    _select_keypoints,
    _stack_pair,
    _split_pair,
    _fused_detect_select,
    _use_fused_detect,
    shi_tomasi_with_angle,
)

# 8-point solve hyperparameters (reference defaults,
# `essential_matrix_estimator.py:71-77`).
_TOP_K = 3
_N_ITER = 30
_N_ITER_MANIFOLD = 10


def _matcher_with_essential(image1, image2, k_inv, cfg: MatcherConfig,
                            detect_fn):
    if image1.shape[0] != 1:
        raise ValueError(
            f"essential-matrix pipelines require batch size 1, got {image1.shape[0]}")
    both = _stack_pair(image1, image2)
    margin = _resolve_border_margin(cfg, sparse=True)
    if detect_fn is shi_tomasi_with_angle and _use_fused_detect(cfg):
        # Fused Pallas detect front-end (kernels/detect_frontend.py); the
        # AKAZE variant keeps its own detect path.
        kpts, kscores, orientation_mm = _fused_detect_select(both, cfg,
                                                             margin, True)
        angles = None
    elif detect_fn is shi_tomasi_with_angle:
        # Same moments-not-angles routing as the flagship matcher: atan2 runs
        # per sampled keypoint inside sparse_bad (bit-identical, no dense
        # atan2 pass — see models/shi_tomasi_family._sparse_detect_describe).
        scores = shi_tomasi_score(both, block_size=cfg.block_size)
        orientation_mm = angle_moments(both, patch_size=cfg.patch_size,
                                       sigma=cfg.sigma)
        angles = None
        kpts, kscores = _select_keypoints(scores, cfg, margin)
    else:
        scores, angles = detect_fn(both, cfg)
        kpts, kscores = _select_keypoints(scores, cfg, margin)
        orientation_mm = None
    desc = sparse_bad(both, kpts, load_bad_params(cfg.num_pairs),
                      orientation=angles, orientation_mm=orientation_mm,
                      binarize=cfg.binarize,
                      soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
                      normalize_descriptors=cfg.normalize_descriptors,
                      sampling_mode=cfg.sampling_mode,
                      use_pallas=cfg.use_pallas,
                      integer_image=cfg.integer_image)
    kpts1, kpts2 = _split_pair(kpts)
    ks1, ks2 = _split_pair(kscores)
    desc1, desc2 = _split_pair(desc)
    probs = sinkhorn_match(desc1, desc2, iterations=cfg.sinkhorn_iterations,
                           epsilon=cfg.epsilon, unused_score=cfg.unused_score,
                           distance_type=cfg.distance_type)

    e = estimate_essential_from_keypoints(
        probs[0], kpts1[0], kpts2[0],
        valid1=ks1[0] > 0, valid2=ks2[0] > 0,
        k_inv=jnp.asarray(k_inv), top_k=_TOP_K,
        n_iter=_N_ITER, n_iter_manifold=_N_ITER_MANIFOLD,
        irls_iters=cfg.essential_irls_iters,
        irls_px=cfg.essential_irls_px,
        ransac_hypotheses=cfg.essential_ransac_hypotheses,
        ransac_px=cfg.essential_ransac_px)
    return kpts1, kpts2, probs, e


def shi_tomasi_angle_sparse_bad_sinkhorn_essential_match(
        image1: jax.Array, image2: jax.Array, k_inv: jax.Array,
        cfg: MatcherConfig):
    """Flagship matcher + in-graph E from actual keypoints.

    Returns:
        keypoints1 (1, K, 2), keypoints2 (1, K, 2), P (1, K+1, K+1), E (3, 3).
    """
    return _matcher_with_essential(image1, image2, k_inv, cfg,
                                   shi_tomasi_with_angle)


def akaze_sparse_bad_sinkhorn_essential_match(
        image1: jax.Array, image2: jax.Array, k_inv: jax.Array,
        cfg: MatcherConfig):
    """AKAZE matcher + in-graph E (parity:
    `akaze_sparse_bad_sinkhorn_essential_matrix.py:34-378`)."""
    return _matcher_with_essential(image1, image2, k_inv, cfg, akaze_detect_cfg)

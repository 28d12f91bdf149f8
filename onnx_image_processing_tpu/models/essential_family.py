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
from ..ops import sinkhorn_match
from .akaze_family import akaze_sparse_detect_describe
from .shi_tomasi_family import (
    _sparse_detect_describe,
    _stack_pair,
    _split_pair,
)

# 8-point solve hyperparameters (reference defaults,
# `essential_matrix_estimator.py:71-77`).
_TOP_K = 3
_N_ITER = 30
_N_ITER_MANIFOLD = 10


def essential_from_match(kpts1, ks1, kpts2, ks2, probs, k_inv,
                         cfg: MatcherConfig):
    """The in-graph essential tail shared by the two-image pipelines and the
    streaming composition (`models/streaming.py`): weighted 8-point (or,
    with ``cfg.essential_ransac_hypotheses``, in-graph vectorized RANSAC)
    on the matched keypoints. Batch-1 inputs."""
    return estimate_essential_from_keypoints(
        probs[0], kpts1[0], kpts2[0],
        valid1=ks1[0] > 0, valid2=ks2[0] > 0,
        k_inv=jnp.asarray(k_inv), top_k=_TOP_K,
        n_iter=_N_ITER, n_iter_manifold=_N_ITER_MANIFOLD,
        irls_iters=cfg.essential_irls_iters,
        irls_px=cfg.essential_irls_px,
        ransac_hypotheses=cfg.essential_ransac_hypotheses,
        ransac_px=cfg.essential_ransac_px)


def _matcher_with_essential(image1, image2, k_inv, cfg: MatcherConfig,
                            frontend):
    if image1.shape[0] != 1:
        raise ValueError(
            f"essential-matrix pipelines require batch size 1, got {image1.shape[0]}")
    both = _stack_pair(image1, image2)
    kpts, kscores, desc = frontend(both, cfg)
    kpts1, kpts2 = _split_pair(kpts)
    ks1, ks2 = _split_pair(kscores)
    desc1, desc2 = _split_pair(desc)
    probs = sinkhorn_match(desc1, desc2, iterations=cfg.sinkhorn_iterations,
                           epsilon=cfg.epsilon, unused_score=cfg.unused_score,
                           distance_type=cfg.distance_type,
                           use_pallas=cfg.use_pallas)
    e = essential_from_match(kpts1, ks1, kpts2, ks2, probs, k_inv, cfg)
    return kpts1, kpts2, probs, e


def shi_tomasi_angle_sparse_bad_sinkhorn_essential_match(
        image1: jax.Array, image2: jax.Array, k_inv: jax.Array,
        cfg: MatcherConfig):
    """Flagship matcher + in-graph E from actual keypoints.

    Returns:
        keypoints1 (1, K, 2), keypoints2 (1, K, 2), P (1, K+1, K+1), E (3, 3).
    """
    return _matcher_with_essential(
        image1, image2, k_inv, cfg,
        lambda both, c: _sparse_detect_describe(both, c, with_angle=True))


def akaze_sparse_bad_sinkhorn_essential_match(
        image1: jax.Array, image2: jax.Array, k_inv: jax.Array,
        cfg: MatcherConfig):
    """AKAZE matcher + in-graph E (parity:
    `akaze_sparse_bad_sinkhorn_essential_matrix.py:34-378`)."""
    return _matcher_with_essential(image1, image2, k_inv, cfg,
                                   akaze_sparse_detect_describe)

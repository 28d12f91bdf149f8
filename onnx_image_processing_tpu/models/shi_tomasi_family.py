"""Shi-Tomasi pipeline family: detect → NMS/top-k → describe → Sinkhorn.

Functional re-design of the reference's composite ``nn.Module`` pipelines
(`pytorch_model/feature_detection/`, SURVEY.md §2.7). Each pipeline is a pure
function of ``(config, images)`` with static shapes, built to be wrapped in
``jax.jit`` (the TPU analogue of "exports to a single ONNX graph").

TPU-first design choices (vs a module-by-module translation):

* **Two images = one batch.** Every two-image matcher stacks (img1, img2) into a
  single (2B, 1, H, W) batch so the detector/orientation/descriptor stages run
  once at doubled batch — bigger fused VPU slabs, one compilation, and the
  split costs nothing (XLA slices are views). The reference calls its detector
  twice sequentially (`shi_tomasi_angle_sparse_bad_sinkhorn.py:154-157`).
* **Separable stencils everywhere** (see ``ops/filters.py``) instead of the
  reference's multi-channel conv2d tricks.
* **Config as a frozen dataclass** (hashable → static under jit) instead of
  20-kwarg module constructors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import MatcherConfig
from ..ops import (
    shi_tomasi_score,
    angle_estimation,
    angle_moments,
    nms_maxpool,
    select_topk_keypoints,
    nms_select_topk,
    load_bad_params,
    dense_bad,
    sparse_bad,
    sinkhorn_match,
    sinkhorn_match_with_filters,
)


def _resolve_border_margin(cfg: MatcherConfig, sparse: bool) -> int:
    """None → descriptor max radius for sparse pipelines (the descriptor needs a
    valid (2r+1)^2 box at every sampled offset, `shi_tomasi_sparse_bad_sinkhorn
    .py:121-124`); dense pipelines keep the reference's no-margin default."""
    if cfg.border_margin is not None:
        return cfg.border_margin
    return load_bad_params(cfg.num_pairs).max_radius if sparse else 0


def _select_keypoints(scores_b1hw: jax.Array, cfg: MatcherConfig, margin: int):
    # topk_mode="block" (default) sorts per-(r+1)^2 block maxima instead of
    # H*W — exact for the continuous-score detectors used here except at
    # same-block score ties, where the reference keeps every tied copy;
    # cfg.topk_mode="sort" restores the reference-exact flat top-k;
    # "approx" additionally swaps the final sort for lax.approx_max_k
    # (recall 0.95 — measured 5x faster at 1080p scale, see ops/keypoints.py).
    # Mode strings are validated by MatcherConfig.__post_init__.
    # On TPU the NMS + masking + block reduction runs as one fused Pallas
    # pass (kernels/select_frontend.py, bit-identical to the XLA path).
    # cfg.select_frontend overrides per-stage; "auto" follows cfg.use_pallas
    # (None -> platform default), so TPU-traced code on a CPU mesh
    # (use_pallas=False) stays off the kernel.
    use_pallas = {"auto": cfg.use_pallas, "pallas": True,
                  "xla": False}[cfg.select_frontend]
    return nms_select_topk(scores_b1hw[:, 0], cfg.max_keypoints,
                           cfg.score_threshold, margin,
                           nms_radius=cfg.nms_radius,
                           topk_mode=cfg.topk_mode,
                           use_pallas=use_pallas)


def _use_fused_detect(cfg: MatcherConfig) -> bool:
    """Opt-in only: the fused Pallas detect front-end measured SLOWER than
    XLA's own fusion of the separable stencils (see MatcherConfig.fused_detect
    and docs/KERNELS.md) — XLA stays the default."""
    return cfg.fused_detect


def _select_premasked(masked_b1hw: jax.Array, cfg: MatcherConfig, margin: int):
    """select_topk_keypoints over a map that already carries the NMS mask
    (the fused front-end's output is score * nms_mask)."""
    masked = masked_b1hw[:, 0]
    block_r = cfg.nms_radius if cfg.topk_mode in ("block", "approx") else None
    return select_topk_keypoints(masked, jnp.ones_like(masked),
                                 cfg.max_keypoints, cfg.score_threshold,
                                 margin, nms_radius=block_r,
                                 approx=cfg.topk_mode == "approx")


def _fused_detect_select(image: jax.Array, cfg: MatcherConfig, margin: int,
                         with_angle: bool):
    """Shared fused-front-end dispatch: detect + NMS in one Pallas pass, then
    top-k select. Returns (kpts, kscores, orientation_mm) where
    orientation_mm is the (m10, m01) pair for sparse_bad (None unoriented)."""
    from ..kernels.detect_frontend import detect_frontend

    masked, m10, m01 = detect_frontend(
        image, block_size=cfg.block_size, patch_size=cfg.patch_size,
        sigma=cfg.sigma, nms_radius=cfg.nms_radius, with_angle=with_angle)
    kpts, kscores = _select_premasked(masked, cfg, margin)
    return kpts, kscores, (m10, m01) if with_angle else None


# ---------------------------------------------------------------------------
# Single-image detectors (the reference's exportable detector heads)
# ---------------------------------------------------------------------------

def shi_tomasi_bad_detect(image: jax.Array, cfg: MatcherConfig):
    """Dense detector head: Shi-Tomasi score map ∥ dense BAD descriptor map.

    Parity: `feature_detection/shi_tomasi_bad.py:20-89`.

    Returns:
        scores (B, 1, H, W), descriptor map (B, P, H, W).
    """
    scores = shi_tomasi_score(image, block_size=cfg.block_size)
    desc_map = dense_bad(image, load_bad_params(cfg.num_pairs),
                         binarize=cfg.binarize, soft_binarize=cfg.soft_binarize,
                         temperature=cfg.temperature)
    return scores, desc_map


def shi_tomasi_with_angle(image: jax.Array, cfg: MatcherConfig):
    """Score + orientation maps, AKAZE-compatible interface.

    Parity: `feature_detection/shi_tomasi_angle.py:23-98`.
    """
    scores = shi_tomasi_score(image, block_size=cfg.block_size)
    angles = angle_estimation(image, patch_size=cfg.patch_size, sigma=cfg.sigma)
    return scores, angles


def shi_tomasi_angle_sparse_bad_describe(image: jax.Array, keypoints: jax.Array,
                                         cfg: MatcherConfig):
    """Score/orientation maps + oriented descriptors at GIVEN keypoints.

    Parity: `feature_detection/shi_tomasi_angle.py:218-243`
    (ShiTomasiAngleSparseBAD.forward).

    Returns:
        scores (B, 1, H, W), angles (B, 1, H, W), descriptors (B, K, P).
    """
    scores, angles = shi_tomasi_with_angle(image, cfg)
    desc = sparse_bad(image, keypoints, load_bad_params(cfg.num_pairs),
                      orientation=angles, binarize=cfg.binarize,
                      soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
                      normalize_descriptors=cfg.normalize_descriptors,
                      sampling_mode=cfg.sampling_mode, use_pallas=cfg.use_pallas,
                      integer_image=cfg.integer_image)
    return scores, angles, desc


def shi_tomasi_angle_sparse_bad_detect(image: jax.Array, cfg: MatcherConfig):
    """Single-image keypoints + oriented sparse descriptors (export variant).

    Parity: `feature_detection/shi_tomasi_angle.py:246-356`.

    Returns:
        keypoints (B, K, 2), scores (B, K), descriptors (B, K, P).
    """
    # The reference detector variant selects WITHOUT a border margin
    # (`shi_tomasi_angle.py:344-346` passes the util's default of 0), unlike
    # the matcher variants which default to the descriptor max radius.
    margin = cfg.border_margin if cfg.border_margin is not None else 0
    if _use_fused_detect(cfg):
        kpts, kscores, orientation_mm = _fused_detect_select(image, cfg,
                                                             margin, True)
        angles = None
    else:
        scores, angles = shi_tomasi_with_angle(image, cfg)
        kpts, kscores = _select_keypoints(scores, cfg, margin)
        orientation_mm = None
    desc = sparse_bad(image, kpts, load_bad_params(cfg.num_pairs),
                      orientation=angles, orientation_mm=orientation_mm,
                      binarize=cfg.binarize,
                      soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
                      normalize_descriptors=cfg.normalize_descriptors,
                      sampling_mode=cfg.sampling_mode,
                      use_pallas=cfg.use_pallas,
                      integer_image=cfg.integer_image)
    return kpts, kscores, desc


# ---------------------------------------------------------------------------
# Two-image matchers
# ---------------------------------------------------------------------------

def _stack_pair(image1: jax.Array, image2: jax.Array) -> jax.Array:
    return jnp.concatenate([image1, image2], axis=0)  # (2B, 1, H, W)


def _split_pair(x: jax.Array):
    b = x.shape[0] // 2
    return x[:b], x[b:]


def _dense_detect_describe(images: jax.Array, cfg: MatcherConfig):
    """Dense-matcher frontend (batch-parallel; also the streaming frontend
    for `shi_tomasi_bad_sinkhorn`): Shi-Tomasi select without the sparse
    border margin, descriptors via the bilinear sparse-sampler identity
    (see :func:`shi_tomasi_bad_sinkhorn_match`).

    Returns:
        keypoints (B, K, 2), scores (B, K), descriptors (B, K, P).
    """
    scores = shi_tomasi_score(images, block_size=cfg.block_size)
    margin = _resolve_border_margin(cfg, sparse=False)
    kpts, kscores = _select_keypoints(scores, cfg, margin)
    desc = sparse_bad(images, kpts, load_bad_params(cfg.num_pairs),
                      orientation=None, binarize=cfg.binarize,
                      soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
                      normalize_descriptors=cfg.normalize_descriptors,
                      sampling_mode="bilinear", use_pallas=cfg.use_pallas,
                      integer_image=cfg.integer_image)
    return kpts, kscores, desc


def shi_tomasi_bad_sinkhorn_match(image1: jax.Array, image2: jax.Array,
                                  cfg: MatcherConfig):
    """Dense-descriptor matcher: ShiTomasi+BAD maps → NMS/top-k → sub-pixel
    descriptor extraction (invalid → zero) → optional L2 norm → Sinkhorn.

    Parity: `feature_detection/shi_tomasi_bad_sinkhorn.py:23-219`.

    TPU-first identity: the dense descriptor map is linear in the shifted box
    banks, so bilinear interpolation of the map at a keypoint equals computing
    the descriptor from bilinearly-sampled box means at that keypoint
    (interpolation weights sum to 1, so the threshold term is unchanged).
    Descriptors are therefore computed with the fused sparse sampler in
    bilinear mode — mathematically identical to materializing the
    (B, P, H, W) map (314 MB at 480x640x256) and grid_sampling it, ~15x
    faster. Note the reference keeps keypoints at integer positions here, so
    bilinear/nearest agree except at clamped borders.

    Returns:
        keypoints1 (B, K, 2), keypoints2 (B, K, 2), P (B, K+1, K+1).
    """
    kpts, _, desc = _dense_detect_describe(_stack_pair(image1, image2), cfg)
    kpts1, kpts2 = _split_pair(kpts)
    desc1, desc2 = _split_pair(desc)
    probs = sinkhorn_match(desc1, desc2, iterations=cfg.sinkhorn_iterations,
                           epsilon=cfg.epsilon, unused_score=cfg.unused_score,
                           distance_type=cfg.distance_type,
                           use_pallas=cfg.use_pallas)
    return kpts1, kpts2, probs


def _sparse_detect_describe(both: jax.Array, cfg: MatcherConfig,
                            with_angle: bool):
    """Shared sparse frontend: keypoints + scores + descriptors per image.

    Every stage is batch-parallel, so it serves both the stacked (2B)
    two-image matchers and the per-image streaming frontend
    (`models/streaming.py`) with bit-identical outputs.

    With ``cfg.fused_detect`` the detect side (Shi-Tomasi score + orientation
    moments + NMS mask) runs as ONE fused Pallas pass
    (`kernels/detect_frontend.py`); orientation reaches the descriptor as
    (m10, m01) moment maps with atan2 applied per sampled keypoint —
    identical values, no dense atan2.

    Returns:
        keypoints (B, K, 2), scores (B, K), descriptors (B, K, P).
    """
    margin = _resolve_border_margin(cfg, sparse=True)
    if _use_fused_detect(cfg):
        kpts, kscores, orientation_mm = _fused_detect_select(both, cfg, margin,
                                                             with_angle)
        desc = sparse_bad(both, kpts, load_bad_params(cfg.num_pairs),
                          orientation=None, orientation_mm=orientation_mm,
                          binarize=cfg.binarize,
                          soft_binarize=cfg.soft_binarize,
                          temperature=cfg.temperature,
                          normalize_descriptors=cfg.normalize_descriptors,
                          sampling_mode=cfg.sampling_mode,
                          use_pallas=cfg.use_pallas,
                          integer_image=cfg.integer_image)
        return kpts, kscores, desc
    scores = shi_tomasi_score(both, block_size=cfg.block_size)
    if with_angle:
        # Moments instead of the dense angle map: atan2 runs per sampled
        # keypoint inside sparse_bad (bit-identical — atan2 commutes with
        # the nearest-neighbor gather) and the full-map atan2 disappears.
        orientation_mm = angle_moments(both, patch_size=cfg.patch_size,
                                       sigma=cfg.sigma)
    else:
        orientation_mm = None
    kpts, kscores = _select_keypoints(scores, cfg, margin)
    desc = sparse_bad(both, kpts, load_bad_params(cfg.num_pairs),
                      orientation=None, orientation_mm=orientation_mm,
                      binarize=cfg.binarize,
                      soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
                      normalize_descriptors=cfg.normalize_descriptors,
                      sampling_mode=cfg.sampling_mode,
                      use_pallas=cfg.use_pallas,
                      integer_image=cfg.integer_image)
    return kpts, kscores, desc


def shi_tomasi_sparse_bad_sinkhorn_match(image1: jax.Array, image2: jax.Array,
                                         cfg: MatcherConfig):
    """Sparse unoriented matcher.

    Parity: `feature_detection/shi_tomasi_sparse_bad_sinkhorn.py:27-182`.
    """
    kpts, _, desc = _sparse_detect_describe(_stack_pair(image1, image2), cfg,
                                            with_angle=False)
    kpts1, kpts2 = _split_pair(kpts)
    desc1, desc2 = _split_pair(desc)
    probs = sinkhorn_match(desc1, desc2, iterations=cfg.sinkhorn_iterations,
                           epsilon=cfg.epsilon, unused_score=cfg.unused_score,
                           distance_type=cfg.distance_type,
                           use_pallas=cfg.use_pallas)
    return kpts1, kpts2, probs


def shi_tomasi_angle_sparse_bad_sinkhorn_match(image1: jax.Array,
                                               image2: jax.Array,
                                               cfg: MatcherConfig):
    """Rotation-invariant sparse matcher (the flagship pipeline).

    Parity: `feature_detection/shi_tomasi_angle_sparse_bad_sinkhorn.py:26-180`.
    """
    kpts, _, desc = _sparse_detect_describe(_stack_pair(image1, image2), cfg,
                                            with_angle=True)
    kpts1, kpts2 = _split_pair(kpts)
    desc1, desc2 = _split_pair(desc)
    probs = sinkhorn_match(desc1, desc2, iterations=cfg.sinkhorn_iterations,
                           epsilon=cfg.epsilon, unused_score=cfg.unused_score,
                           distance_type=cfg.distance_type,
                           use_pallas=cfg.use_pallas)
    return kpts1, kpts2, probs


def shi_tomasi_angle_sparse_bad_sinkhorn_match_with_filters(
        image1: jax.Array, image2: jax.Array, cfg: MatcherConfig):
    """Flagship matcher + in-graph ratio/dustbin outlier filters.

    Parity: `feature_detection/shi_tomasi_angle_sparse_bad_sinkhorn.py:183-340`.

    Returns:
        keypoints1, keypoints2, P_filtered (B, K+1, K+1), valid_mask (B, K).
    """
    kpts, _, desc = _sparse_detect_describe(_stack_pair(image1, image2), cfg,
                                            with_angle=True)
    kpts1, kpts2 = _split_pair(kpts)
    desc1, desc2 = _split_pair(desc)
    probs, valid = sinkhorn_match_with_filters(
        desc1, desc2, iterations=cfg.sinkhorn_iterations, epsilon=cfg.epsilon,
        unused_score=cfg.unused_score, distance_type=cfg.distance_type,
        ratio_threshold=cfg.ratio_threshold, dustbin_margin=cfg.dustbin_margin,
        use_pallas=cfg.use_pallas)
    return kpts1, kpts2, probs, valid

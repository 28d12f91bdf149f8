"""Keypoint selection utilities: max-pool NMS and static top-k selection.

Re-design of `pytorch_model/utils/keypoint_utils.py`. Keypoints follow the
framework-wide contract: (B, K, 2) float32 in (y, x) order, invalid slots padded
with (-1, -1) and zero scores (`keypoint_utils.py:104-117`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .filters import maxpool2d_same


@partial(jax.jit, static_argnames=("nms_radius",))
def nms_maxpool(scores: jax.Array, nms_radius: int) -> jax.Array:
    """Local-maximum mask via (2r+1)^2 max-pool with -inf border.

    Args:
        scores: (B, H, W) score map.
        nms_radius: window radius.

    Returns:
        (B, H, W) float mask, 1.0 where ``score >= local_max - 1e-7``.

    Parity: `pytorch_model/utils/keypoint_utils.py:12-44`.
    """
    local_max = maxpool2d_same(scores, nms_radius, pad_mode="neg_inf")
    return (scores >= local_max - 1e-7).astype(scores.dtype)


@partial(jax.jit, static_argnames=("max_keypoints", "score_threshold", "border_margin"))
def select_topk_keypoints(
    scores: jax.Array,
    nms_mask: jax.Array,
    max_keypoints: int,
    score_threshold: float = 0.0,
    border_margin: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Select the top-k surviving keypoints from a score map.

    Border masking is built by coordinate comparison (no scatter), matching
    `pytorch_model/utils/keypoint_utils.py:77-86`; selection is a flat
    ``lax.top_k`` over H*W with (y, x) decoded by div/mod and invalid slots
    padded to (-1, -1) with zero scores (`:88-117`).

    Args:
        scores: (B, H, W).
        nms_mask: (B, H, W) from :func:`nms_maxpool`.
        max_keypoints: K, static output size.
        score_threshold: keep strictly-greater scores only.
        border_margin: exclusion margin in pixels (0 disables).

    Returns:
        keypoints (B, K, 2) float (y, x); scores (B, K).
    """
    b, h, w = scores.shape
    masked = scores * nms_mask
    if border_margin > 0:
        m = border_margin
        yv = (jnp.arange(h) >= m) & (jnp.arange(h) < h - m)
        xv = (jnp.arange(w) >= m) & (jnp.arange(w) < w - m)
        masked = masked * (yv[:, None] & xv[None, :]).astype(masked.dtype)
    masked = jnp.where(masked > score_threshold, masked, 0.0)

    flat = masked.reshape(b, h * w)
    topk_scores, topk_idx = jax.lax.top_k(flat, max_keypoints)

    y = (topk_idx // w).astype(jnp.float32)
    x = (topk_idx % w).astype(jnp.float32)
    kpts = jnp.stack([y, x], axis=-1)

    valid = topk_scores > 0
    kpts = jnp.where(valid[..., None], kpts, -1.0)
    topk_scores = jnp.where(valid, topk_scores, 0.0)
    return kpts, topk_scores

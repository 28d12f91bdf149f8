"""Mutual-nearest-neighbor match extraction from a Sinkhorn probability matrix.

Re-design of `pytorch_model/matching/match_extraction.py:11-184`: in-graph mutual-NN
with fixed-size (max_matches) padded output, jit-compilable with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_mutual_matches(
    p: jax.Array,
    keypoints1: jax.Array,
    keypoints2: jax.Array,
    max_matches: int = 100,
    threshold: float = 0.1,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Extract mutual-NN matches sorted by probability.

    Args:
        p: (B, N+1, M+1) probability matrix with dustbin.
        keypoints1: (B, N, 2) (y, x) keypoints of image 1.
        keypoints2: (B, M, 2) keypoints of image 2.
        max_matches: static output size K'.
        threshold: minimum match probability.

    Returns:
        matched_kpts1 (B, K', 2), matched_kpts2 (B, K', 2),
        scores (B, K'), valid (B, K') bool.
    """
    b = p.shape[0]
    n = keypoints1.shape[1]
    m = keypoints2.shape[1]
    core = p[:, :n, :m]

    best_j = jnp.argmax(core, axis=2)                     # (B, N)
    best_p = jnp.max(core, axis=2)                        # (B, N)
    best_i = jnp.argmax(core, axis=1)                     # (B, M)

    # Mutual consistency: best_i[best_j[i]] == i  (`match_extraction.py:92-103`).
    roundtrip = jnp.take_along_axis(best_i, best_j, axis=1)  # (B, N)
    is_mutual = roundtrip == jnp.arange(n)[None, :]
    valid = is_mutual & (best_p >= threshold)

    sort_scores = jnp.where(valid, best_p, -1.0)
    k = min(max_matches, n)
    top_scores, top_idx = jax.lax.top_k(sort_scores, k)   # (B, k)
    if n < max_matches:
        pad = max_matches - n
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)))
        top_idx = jnp.pad(top_idx, ((0, 0), (0, pad)))

    idx1 = jnp.clip(top_idx, 0, n - 1)
    mk1 = jnp.take_along_axis(keypoints1, idx1[..., None].repeat(2, axis=-1), axis=1)
    j_idx = jnp.take_along_axis(best_j, idx1, axis=1)
    j_idx = jnp.clip(j_idx, 0, m - 1)
    mk2 = jnp.take_along_axis(keypoints2, j_idx[..., None].repeat(2, axis=-1), axis=1)

    valid_out = top_scores > 0.0
    return mk1, mk2, top_scores, valid_out

"""Shi-Tomasi corner score (minimum structure-tensor eigenvalue).

TPU-native re-design of `pytorch_model/detector/shi_tomasi.py:34-112`: the reference
fuses Ix/Iy into one 2-channel Sobel conv and the three structure-tensor sums into a
grouped conv; here every filter is a separable 1-D pair (Sobel = smooth (x) diff, box
sum = ones (x) ones) so the whole score is one fused VPU pipeline over (B, H, W) with
no channel dimension at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .filters import pad2d, conv1d_h, conv1d_w

_SMOOTH = np.array([1.0, 2.0, 1.0], dtype=np.float32)
_DIFF = np.array([-1.0, 0.0, 1.0], dtype=np.float32)


@partial(jax.jit, static_argnames=("block_size",))
def shi_tomasi_score(image: jax.Array, block_size: int = 3) -> jax.Array:
    """Per-pixel Shi-Tomasi score, lambda_min of the 3x3 Sobel structure tensor.

    Args:
        image: (B, 1, H, W) grayscale image, values in [0, 255] or [0, 1].
        block_size: neighborhood window for the structure-tensor sums (odd, > 0).

    Returns:
        (B, 1, H, W) score map, clamped to >= 0.

    Parity: `pytorch_model/detector/shi_tomasi.py:66-112` (replicate-padded Sobel,
    replicate-padded box sums, closed-form lambda_min with 1e-10 epsilon).
    """
    if block_size <= 0 or block_size % 2 == 0:
        raise ValueError(f"block_size must be a positive odd integer, got {block_size}")
    x = image.astype(jnp.float32)[:, 0]  # (B, H, W)
    b, h, w = x.shape

    # Sobel gradients over a replicate-padded slab (shared between Ix and Iy).
    xp = pad2d(x, 1, 1, mode="edge")
    ix = conv1d_w(conv1d_h(xp, _SMOOTH), _DIFF)
    iy = conv1d_w(conv1d_h(xp, _DIFF), _SMOOTH)

    # Structure-tensor window sums via separable box filters on a shared pad.
    r = block_size // 2
    ones = np.ones(block_size, dtype=np.float32)

    def bsum(v):
        return conv1d_w(conv1d_h(pad2d(v, r, r, mode="edge"), ones), ones)

    sxx = bsum(ix * ix)
    syy = bsum(iy * iy)
    sxy = bsum(ix * iy)

    half_trace = (sxx + syy) * 0.5
    diff_half = (sxx - syy) * 0.5
    disc = diff_half * diff_half + sxy * sxy
    lam_min = half_trace - jnp.sqrt(disc + 1e-10)
    return jnp.maximum(lam_min, 0.0)[:, None]

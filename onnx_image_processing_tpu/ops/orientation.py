"""Intensity-centroid orientation estimation (AKAZE-style).

TPU-native re-design of `pytorch_model/orientation/angle_estimation.py:28-172`.
The Gaussian-weighted moment kernels are separable outer products —
``weight_x = (t * g(t)) (x) g(t)`` and ``weight_y = g(t) (x) (t * g(t))`` — so both
moments are two 1-D passes each instead of a patch_size^2 2-channel conv.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .filters import pad2d, conv1d_h, conv1d_w, gaussian_taps


@partial(jax.jit, static_argnames=("patch_size", "sigma"))
def angle_estimation(image: jax.Array, patch_size: int = 15, sigma: float = 2.5) -> jax.Array:
    """Per-pixel dominant orientation theta = atan2(m01, m10).

    m10 / m01 are Gaussian-weighted first moments over a zero-padded patch
    (the reference uses ``F.conv2d(padding=patch//2)`` i.e. zero padding,
    `orientation/angle_estimation.py:155-170`).

    Args:
        image: (B, 1, H, W) grayscale image.
        patch_size: odd patch size (default 15).
        sigma: Gaussian weighting sigma (default 2.5).

    Returns:
        (B, 1, H, W) orientation map in radians [-pi, pi]; 0 = +x, pi/2 = +y (down).
    """
    m10, m01 = angle_moments(image, patch_size=patch_size, sigma=sigma)
    return jnp.arctan2(m01[:, 0], m10[:, 0])[:, None]


@partial(jax.jit, static_argnames=("patch_size", "sigma"))
def angle_moments(image: jax.Array, patch_size: int = 15,
                  sigma: float = 2.5) -> tuple[jax.Array, jax.Array]:
    """The (m10, m01) Gaussian-weighted moment maps behind
    :func:`angle_estimation`, each (B, 1, H, W).

    Exposed separately because sparse pipelines only need angles AT
    keypoints: sampling these maps (nearest) and applying atan2 per keypoint
    is bit-identical to sampling the dense angle map — atan2 commutes with
    the gather — while skipping a full-resolution atan2 (measured 366 us at
    B=12 pairs, 480x640, the largest single non-sampler op in the batched
    flagship graph)."""
    if patch_size % 2 == 0:
        raise ValueError(f"patch_size must be odd, got {patch_size}")
    if sigma <= 0:
        raise ValueError(f"sigma must be positive, got {sigma}")
    x = image.astype(jnp.float32)[:, 0]
    half = patch_size // 2
    g = gaussian_taps(sigma, patch_size)
    t = np.arange(-half, half + 1, dtype=np.float32)
    tg = (t * g).astype(np.float32)

    xp = pad2d(x, half, half, mode="zero")
    m10 = conv1d_w(conv1d_h(xp, g), tg)   # x-weighted moment
    m01 = conv1d_w(conv1d_h(xp, tg), g)   # y-weighted moment
    return m10[:, None], m01[:, None]


@partial(jax.jit, static_argnames=("num_scales", "patch_size", "sigma", "pooling_factor"))
def angle_estimation_multiscale(
    image: jax.Array,
    num_scales: int = 3,
    patch_size: int = 15,
    sigma: float = 2.5,
    pooling_factor: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Multi-scale orientation pyramid.

    Parity with the reference's experimental `AngleEstimatorMultiScale`
    (`orientation/angle_estimation.py:175-295`): score-based scale selection is
    not implemented upstream — it always returns scale 0 and an all-zero
    scale-index map. We reproduce that contract (computing the deeper scales so
    the cost profile matches).
    """
    b, _, h, w = image.shape
    current = image
    first = None
    for i in range(num_scales):
        ori = angle_estimation(current, patch_size=patch_size, sigma=sigma)
        if i == 0:
            first = ori
        if i < num_scales - 1:
            x = current[:, 0]
            hh = (x.shape[1] // pooling_factor) * pooling_factor
            ww = (x.shape[2] // pooling_factor) * pooling_factor
            x = x[:, :hh, :ww].reshape(b, hh // pooling_factor, pooling_factor,
                                       ww // pooling_factor, pooling_factor)
            current = x.mean(axis=(2, 4))[:, None]
    return first, jnp.zeros_like(first)

"""Difference-of-Gaussians detector.

TPU-native re-design of `pytorch_model/detector/dog.py`: the reference builds a
(num_scales, 1, K, K) 2-D Gaussian kernel bank and runs one grouped conv over a
repeated input (`dog.py:100-142`, K up to 39 for 5 scales). Gaussians are
separable, so here each scale is two 1-D passes over a single shared
replicate-padded slab — O(2K) instead of O(K^2) taps per pixel, no channel
repeat, no grouped conv.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .filters import pad2d, conv1d_h, conv1d_w


def _dog_sigmas(num_scales: int, sigma_base: float, sigma_ratio: float):
    return [sigma_base * (sigma_ratio ** i) for i in range(num_scales)]


def _dog_kernel_size(sigmas, kernel_size: int | None) -> int:
    if kernel_size is None:
        kernel_size = int(6 * sigmas[-1] + 1)
        if kernel_size % 2 == 0:
            kernel_size += 1
    if kernel_size % 2 == 0:
        raise ValueError(f"kernel_size must be odd, got {kernel_size}")
    return kernel_size


@partial(jax.jit, static_argnames=("num_scales", "sigma_base", "sigma_ratio",
                                   "kernel_size"))
def dog_responses(
    image: jax.Array,
    num_scales: int = 5,
    sigma_base: float = 1.6,
    sigma_ratio: float = math.sqrt(2),
    kernel_size: int | None = None,
) -> jax.Array:
    """DoG band responses: consecutive differences of a Gaussian pyramid.

    All scales share one kernel size (the reference normalizes each 2-D kernel
    over that full support, `dog.py:7-29`; separable equivalence holds because
    the normalized 2-D kernel is the outer product of per-axis-normalized taps).

    Args:
        image: (B, 1, H, W) grayscale.

    Returns:
        (B, num_scales-1, H, W) DoG bands. Parity: `dog.py:100-142`.
    """
    if num_scales < 2:
        raise ValueError(f"num_scales must be at least 2, got {num_scales}")
    sigmas = _dog_sigmas(num_scales, sigma_base, sigma_ratio)
    k = _dog_kernel_size(sigmas, kernel_size)
    half = k // 2

    x = image.astype(jnp.float32)[:, 0]
    xp = pad2d(x, half, half, mode="edge")  # shared replicate-padded slab

    levels = []
    for sigma in sigmas:
        t = np.arange(-half, half + 1, dtype=np.float32)
        g = np.exp(-(t ** 2) / (2.0 * sigma ** 2)).astype(np.float32)
        g = g / g.sum()
        levels.append(conv1d_w(conv1d_h(xp, g), g))
    pyr = jnp.stack(levels, axis=1)  # (B, S, H, W)
    return pyr[:, 1:] - pyr[:, :-1]


@partial(jax.jit, static_argnames=("num_scales", "sigma_base", "sigma_ratio",
                                   "kernel_size"))
def dog_score(
    image: jax.Array,
    num_scales: int = 5,
    sigma_base: float = 1.6,
    sigma_ratio: float = math.sqrt(2),
    kernel_size: int | None = None,
) -> jax.Array:
    """Single score map: max |DoG| over scales.

    Parity: `pytorch_model/detector/dog.py:182-204` (DoGDetectorWithScore).

    Returns:
        (B, 1, H, W).
    """
    bands = dog_responses(image, num_scales=num_scales, sigma_base=sigma_base,
                          sigma_ratio=sigma_ratio, kernel_size=kernel_size)
    return jnp.max(jnp.abs(bands), axis=1, keepdims=True)

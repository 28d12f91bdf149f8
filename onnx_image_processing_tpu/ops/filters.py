"""Separable stencil / filtering primitives.

Every 2-D filter in this framework (Sobel, box sums, Gaussians, Gaussian-weighted
moment kernels, Hessian second-derivative kernels, BAD box-average banks) is an outer
product of two 1-D taps. Where the reference builds fused multi-channel ``F.conv2d``
calls (e.g. ``pytorch_model/detector/shi_tomasi.py:59-64``), we decompose into 1-D
passes implemented as static shift-and-add over the lane-major image layout: each tap
is an elementwise multiply-add over a shifted (B, H, W) slab, which XLA fuses into a
single VPU pass and which avoids the degenerate 1-input-channel convolutions that
waste MXU tiles. Cost drops from O(k^2) to O(2k) per pixel.

Conventions: images and score maps are (B, H, W) float32 inside ops; public
pipeline APIs use (B, 1, H, W) to mirror the reference contract
(SURVEY.md section 1, `pytorch_model/utils/keypoint_utils.py:104-114`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pad2d(x: jax.Array, pad_h: int, pad_w: int, mode: str = "edge") -> jax.Array:
    """Pad the trailing two axes of ``x``.

    mode 'edge' replicates the border (torch ``F.pad(mode='replicate')``);
    mode 'zero' zero-pads (torch ``F.conv2d(padding=p)``);
    mode 'neg_inf' pads with -inf (NMS max-pool padding,
    `pytorch_model/utils/keypoint_utils.py:29-34`).
    """
    cfg = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    if mode == "edge":
        return jnp.pad(x, cfg, mode="edge")
    if mode == "zero":
        return jnp.pad(x, cfg, mode="constant", constant_values=0.0)
    if mode == "neg_inf":
        return jnp.pad(x, cfg, mode="constant", constant_values=-jnp.inf)
    raise ValueError(f"unknown pad mode {mode!r}")


def conv1d_h(x: jax.Array, taps) -> jax.Array:
    """Valid cross-correlation along axis -2 with static 1-D ``taps``.

    Unrolled shift-and-add: ``out[..., i, :] = sum_t taps[t] * x[..., i + t, :]``.
    Matches torch/lax correlation semantics (no tap flip).
    """
    taps = np.asarray(taps, dtype=np.float32)
    k = taps.shape[0]
    out_h = x.shape[-2] - k + 1
    acc = None
    for t in range(k):
        if taps[t] == 0.0:
            continue
        term = taps[t] * jax.lax.slice_in_dim(x, t, t + out_h, axis=-2)
        acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros(x.shape[:-2] + (out_h, x.shape[-1]), x.dtype)
    return acc


def conv1d_w(x: jax.Array, taps) -> jax.Array:
    """Valid cross-correlation along axis -1 with static 1-D ``taps``."""
    taps = np.asarray(taps, dtype=np.float32)
    k = taps.shape[0]
    out_w = x.shape[-1] - k + 1
    acc = None
    for t in range(k):
        if taps[t] == 0.0:
            continue
        term = taps[t] * jax.lax.slice_in_dim(x, t, t + out_w, axis=-1)
        acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros(x.shape[:-1] + (out_w,), x.dtype)
    return acc


def sep_conv2d(x: jax.Array, col_taps, row_taps, mode: str = "zero") -> jax.Array:
    """Separable 2-D cross-correlation with kernel ``col_taps (x) row_taps``.

    Equivalent to ``F.conv2d(pad(x), outer(col_taps, row_taps))`` in the reference.
    Output has the same spatial shape as ``x`` ("same" padding of the given mode).
    """
    col_taps = np.asarray(col_taps, dtype=np.float32)
    row_taps = np.asarray(row_taps, dtype=np.float32)
    xp = pad2d(x, col_taps.shape[0] // 2, row_taps.shape[0] // 2, mode=mode)
    return conv1d_w(conv1d_h(xp, col_taps), row_taps)


def box_sum2d(x: jax.Array, size: int, mode: str = "edge") -> jax.Array:
    """Sum over a ``size x size`` window (separable ones kernel)."""
    ones = np.ones(size, dtype=np.float32)
    return sep_conv2d(x, ones, ones, mode=mode)


def gaussian_taps(sigma: float, size: int) -> np.ndarray:
    """Unnormalized 1-D Gaussian taps exp(-t^2 / (2 sigma^2)), t centered."""
    half = size // 2
    t = np.arange(-half, half + 1, dtype=np.float32)
    return np.exp(-(t ** 2) / (2.0 * sigma ** 2)).astype(np.float32)


def gaussian_kernel2d_taps(sigma: float, size: int) -> tuple[np.ndarray, np.ndarray]:
    """Separable taps for the *normalized* 2-D Gaussian of
    `pytorch_model/detector/dog.py:7-29` (kernel / kernel.sum())."""
    g = gaussian_taps(sigma, size)
    k2d_sum = float(g.sum()) ** 2
    scale = 1.0 / np.sqrt(k2d_sum)
    return (g * scale).astype(np.float32), (g * scale).astype(np.float32)


def maxpool2d_same(x: jax.Array, radius: int, pad_mode: str = "neg_inf") -> jax.Array:
    """(2r+1)x(2r+1) max-pool, stride 1, same spatial shape.

    Separable: a 2-D window max is the row-max of the column-max. The reference
    uses ``F.max_pool2d`` over a -inf padded map (`utils/keypoint_utils.py:29-41`).
    """
    if radius <= 0:
        return x
    xp = pad2d(x, radius, radius, mode=pad_mode)
    k = 2 * radius + 1
    h, w = x.shape[-2], x.shape[-1]
    colmax = jax.lax.reduce_window(
        xp, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (k, 1),
        window_strides=(1,) * x.ndim,
        padding="VALID",
    )
    out = jax.lax.reduce_window(
        colmax, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (1, k),
        window_strides=(1,) * x.ndim,
        padding="VALID",
    )
    assert out.shape[-2:] == (h, w)
    return out


@partial(jax.jit, static_argnames=("max_radius",))
def box_average_bank(image_bhw: jax.Array, max_radius: int) -> jax.Array:
    """Box-average bank: channel r = mean over (2r+1)^2 window, replicate-padded.

    TPU-native equivalent of the reference's (R+1)-output-channel conv over a
    replicate-padded image (`pytorch_model/descriptor/bad.py:426-434,473-479`),
    built from separable box sums reusing one shared padded slab.

    Args:
        image_bhw: (B, H, W) image.
        max_radius: largest box radius R.

    Returns:
        (B, R+1, H, W) stack; channel 0 is the image itself.
    """
    b, h, w = image_bhw.shape
    xp = pad2d(image_bhw, max_radius, max_radius, mode="edge")
    outs = [image_bhw]
    for r in range(1, max_radius + 1):
        k = 2 * r + 1
        ones = np.ones(k, dtype=np.float32)
        m = max_radius - r
        sub = xp[:, m:m + h + 2 * r, m:m + w + 2 * r]
        outs.append(conv1d_w(conv1d_h(sub, ones), ones) / float(k * k))
    return jnp.stack(outs, axis=1)

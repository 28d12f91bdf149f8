"""Pallas TPU kernel: fused AKAZE scale ladder.

The AKAZE detector (`pytorch_model/detector/akaze.py:318-453`, re-designed in
``ops/akaze.py``) is a chain of ~170 zero-padded 3x3/15-tap stencil passes per
image: ``num_scales`` x (``diffusion_iterations`` FED steps -> Hessian score +
maxpool NMS -> Gaussian-moment orientation). As XLA fusions, every pass
round-trips the (H, W) slab through HBM (~90 MB of traffic at 480x640),
making the stage bandwidth-bound at ~0.26 ms.

One whole 480x640 f32 image is 1.2 MB — the entire ladder fits in VMEM. This
kernel runs the full per-scale chain on-chip: grid (B, num_scales) with the
scale axis iterating fastest, the evolving diffusion state L held in VMEM
scratch across the scale steps of each image, and only the per-scale outputs
(Hessian score map and the orientation moment maps m10/m01) written back
(~11 MB total). atan2 and the cross-scale tie-normalized argmax select stay
outside (Mosaic has no atan2 lowering; they are one cheap XLA fusion).

All stencils are zero-padded separable shift-and-adds with the same tap order
as ``ops/filters.conv1d_{h,w}`` for numerical agreement with the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.filters import gaussian_taps

_S121 = (1.0, 2.0, 1.0)
_D101 = (-1.0, 0.0, 1.0)
_L121 = (1.0, -2.0, 1.0)
_XY = (1.0, 0.0, -1.0)


def _shift(x, dy: int, dx: int):
    """Zero-filled 2-D shift: result[i, j] = x[i + dy, j + dx] (0 outside).

    Implemented as a wrap-around ``pltpu.roll`` plus an iota border mask —
    cheaper under Mosaic than slice+concat, which materializes two buffers
    per tap.
    """
    h, w = x.shape
    if dy:
        x = pltpu.roll(x, (-dy) % h, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        keep = (row < h - dy) if dy > 0 else (row >= -dy)
        x = jnp.where(keep, x, 0.0)
    if dx:
        x = pltpu.roll(x, (-dx) % w, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        keep = (col < w - dx) if dx > 0 else (col >= -dx)
        x = jnp.where(keep, x, 0.0)
    return x


def _conv_axis(x, taps, axis: int):
    """Zero-padded same-size 1-D cross-correlation along ``axis`` (0 or 1)."""
    half = len(taps) // 2
    acc = None
    for i, t in enumerate(taps):
        if t == 0.0:
            continue
        term = float(t) * _shift(x, i - half if axis == 0 else 0,
                                 i - half if axis == 1 else 0)
        acc = term if acc is None else acc + term
    return acc


def _sep3(x, col, row, scale: float):
    return _conv_axis(_conv_axis(x, col, axis=0), row, axis=1) * scale


def _maxpool_zero(x, radius: int):
    """Separable zero-padded (2r+1)^2 max (matches maxpool2d_same zero mode)."""
    col = x
    for d in range(1, radius + 1):
        col = jnp.maximum(col, jnp.maximum(_shift(x, d, 0), _shift(x, -d, 0)))
    out = col
    for d in range(1, radius + 1):
        out = jnp.maximum(out, jnp.maximum(_shift(col, 0, d), _shift(col, 0, -d)))
    return out


def _ladder_kernel(image_ref, score_ref, m10_ref, m01_ref, l_ref, *,
                   diffusion_iterations: int, kappa: float,
                   threshold: float, nms_size: int, g_taps, tg_taps):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        l_ref[...] = image_ref[0]

    l = l_ref[...]
    inv_k2 = 1.0 / (kappa * kappa)
    for _ in range(diffusion_iterations):
        gx = _sep3(l, _S121, _D101, 1.0 / 8.0)
        gy = _sep3(l, _D101, _S121, 1.0 / 8.0)
        mag2 = gx * gx + gy * gy + 1e-8
        c = 1.0 / (1.0 + mag2 * inv_k2)
        div = (_sep3(c * gx, _S121, _D101, 1.0 / 8.0)
               + _sep3(c * gy, _D101, _S121, 1.0 / 8.0))
        l = l + 0.25 * div
    l_ref[...] = l

    lxx = _sep3(l, _S121, _L121, 1.0 / 16.0)
    lyy = _sep3(l, _L121, _S121, 1.0 / 16.0)
    lxy = _sep3(l, _XY, _XY, 1.0 / 4.0)
    resp = lxx * lyy - lxy * lxy
    local_max = _maxpool_zero(resp, nms_size // 2)
    mask = (resp == local_max) & (resp > threshold)
    score_ref[0, 0] = jnp.maximum(resp * mask.astype(resp.dtype), 0.0)

    ch = _conv_axis(l, g_taps, axis=0)
    m10_ref[0, 0] = _conv_axis(ch, tg_taps, axis=1)
    cth = _conv_axis(l, tg_taps, axis=0)
    m01_ref[0, 0] = _conv_axis(cth, g_taps, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "num_scales", "diffusion_iterations", "kappa", "threshold", "nms_size",
    "orientation_patch_size", "orientation_sigma", "interpret"))
def akaze_ladder(
    image: jax.Array,   # (B, H, W) f32
    num_scales: int = 3,
    diffusion_iterations: int = 3,
    kappa: float = 0.05,
    threshold: float = 0.001,
    nms_size: int = 5,
    orientation_patch_size: int = 15,
    orientation_sigma: float = 2.5,
    interpret: bool = False,
):
    """Fused per-scale AKAZE maps.

    Returns:
        (scores, m10, m01), each (B, num_scales, H, W): the thresholded
        Hessian NMS score and the Gaussian orientation moments of every
        diffusion scale. Orientation angle = atan2(m01, m10), applied outside.
    """
    b, h, w = image.shape
    half = orientation_patch_size // 2
    g = gaussian_taps(orientation_sigma, orientation_patch_size)
    t = np.arange(-half, half + 1, dtype=np.float32)
    tg = (t * g).astype(np.float32)

    kernel = functools.partial(
        _ladder_kernel,
        diffusion_iterations=diffusion_iterations, kappa=kappa,
        threshold=threshold, nms_size=nms_size,
        g_taps=tuple(float(v) for v in g),
        tg_taps=tuple(float(v) for v in tg))

    out_shape = jax.ShapeDtypeStruct((b, num_scales, h, w), jnp.float32)
    out_spec = pl.BlockSpec((1, 1, h, w), lambda i, s: (i, s, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b, num_scales),
        in_specs=[pl.BlockSpec((1, h, w), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(image)
    return outs

"""Point-sampling primitives: gather-based equivalents of ``F.grid_sample``.

The reference samples descriptor banks and orientation maps with
``F.grid_sample(mode='nearest'|'bilinear', padding_mode='border',
align_corners=True)`` (`pytorch_model/descriptor/bad.py:487-551`). On TPU we skip the
normalize-to-[-1,1] round trip entirely and gather directly at pixel coordinates:
border padding becomes a coordinate clamp, and each sample is one flat
``take_along_axis`` per (batch) row, which XLA lowers to a single dynamic-gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _clamp_coords(y: jax.Array, x: jax.Array, h: int, w: int):
    # jnp.asarray (not float()): H/W may be symbolic dims under a
    # shape-polymorphic jax.export trace.
    return (jnp.clip(y, 0.0, jnp.asarray(h - 1, jnp.float32)),
            jnp.clip(x, 0.0, jnp.asarray(w - 1, jnp.float32)))


def sample_nearest(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Nearest-neighbor sample with border clamping.

    Args:
        img: (B, H, W) single-channel map.
        y, x: (B, ...) pixel coordinates (float).

    Returns:
        (B, ...) sampled values. Rounding is round-half-to-even, matching
        torch grid_sample's nearest mode (``std::nearbyint``).
    """
    b, h, w = img.shape
    y, x = _clamp_coords(y, x, h, w)
    yi = jnp.round(y).astype(jnp.int32)
    xi = jnp.round(x).astype(jnp.int32)
    flat = img.reshape(b, h * w)
    idx = (yi * w + xi).reshape(b, -1)
    return jnp.take_along_axis(flat, idx, axis=1).reshape(y.shape)


def sample_bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Bilinear sample with border clamping (align_corners=True semantics).

    Args:
        img: (B, H, W).
        y, x: (B, ...) pixel coordinates.

    Returns:
        (B, ...) interpolated values.
    """
    b, h, w = img.shape
    y, x = _clamp_coords(y, x, h, w)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    flat = img.reshape(b, h * w)

    def g(yi, xi):
        idx = (yi * w + xi).reshape(b, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(y.shape)

    v00 = g(y0i, x0i)
    v01 = g(y0i, x1i)
    v10 = g(y1i, x0i)
    v11 = g(y1i, x1i)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def sample_bank_fused(bank: jax.Array, channel: jax.Array, y: jax.Array, x: jax.Array,
                      mode: str = "nearest") -> jax.Array:
    """Sample a multi-channel bank where the channel is itself data-dependent.

    TPU-native replacement for the reference's "sample every radius channel, then
    one-hot select" (`pytorch_model/descriptor/bad.py:538-557`): fuses the channel
    select into the gather index, so each (keypoint, pair) costs ONE gather instead
    of (R+1) gathers plus a reduction.

    Args:
        bank: (B, C, H, W).
        channel: (...,) or broadcastable-to-coord-shape int32 channel per sample.
        y, x: (B, ...) pixel coordinates.
        mode: 'nearest' or 'bilinear'.

    Returns:
        (B, ...) sampled values.
    """
    b, c, h, w = bank.shape
    y, x = _clamp_coords(y, x, h, w)
    flat = bank.reshape(b, c * h * w)
    chan_off = (channel.astype(jnp.int32) * (h * w))

    if mode == "nearest":
        yi = jnp.round(y).astype(jnp.int32)
        xi = jnp.round(x).astype(jnp.int32)
        idx = (chan_off + yi * w + xi).reshape(b, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(y.shape)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    def g(yi, xi):
        idx = (chan_off + yi * w + xi).reshape(b, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(y.shape)

    v00 = g(y0i, x0i)
    v01 = g(y0i, x1i)
    v10 = g(y1i, x0i)
    v11 = g(y1i, x1i)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy

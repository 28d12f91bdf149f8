"""FAST-9 corner detector, branch-free.

TPU-native re-design of `pytorch_model/detector/fast.py` ("faster-than-FAST").
Two departures from the reference, both enabled by dropping the ONNX/TensorRT
operator constraints:

* **Circle sampling**: the 16 Bresenham-circle pixels are static (dy, dx)
  offsets, so instead of advanced-indexing gathers over a padded image
  (`fast.py:66-109`) each sample is a static slice of one shared
  replicate-padded slab — pure shift registers, no gather at all.
* **Run-of-9 detection**: the reference emulates bit tests with int div/mod
  chains because ONNX lacks bitwise ops (`fast.py:146-196`). Here the
  16 circular states pack into an int32 and a shift-AND doubling cascade finds
  runs of >= 9 set bits in 4 ops: r2 = b & b>>1 (runs >= 2), r4 = r2 & r2>>2,
  r8 = r4 & r4>>4 (runs >= 8), r9 = r8 & b>>8.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .filters import pad2d, maxpool2d_same

# Bresenham circle of radius 3, clockwise from (0, -3): (dy, dx).
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1),
    (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def _has_9_consecutive(bits16: jax.Array) -> jax.Array:
    """True where the circular 16-bit pattern contains >= 9 consecutive set bits.

    Wraparound handled by appending the low 8 bits above bit 15 (24-bit buffer,
    same trick as `fast.py:159-170`), then a shift-AND doubling cascade.
    """
    buf = bits16 | ((bits16 & 0xFF) << 16)  # 24-bit circular buffer
    r2 = buf & (buf >> 1)
    r4 = r2 & (r2 >> 2)
    r8 = r4 & (r4 >> 4)
    r9 = r8 & (buf >> 8)
    # A run of 9 starting at any of the 16 circle positions.
    return (r9 & 0xFFFF) != 0


@partial(jax.jit, static_argnames=("threshold", "use_nms", "nms_radius"))
def fast_score(
    image: jax.Array,
    threshold: float = 20.0,
    use_nms: bool = False,
    nms_radius: int = 3,
) -> jax.Array:
    """FAST-9 binary corner score map.

    A pixel is a corner when 9 consecutive circle pixels are all brighter or
    all darker than the center by more than ``threshold``.

    Args:
        image: (B, 1, H, W) grayscale, values in [0, 255].
        threshold: intensity difference threshold (reference default 20).
        use_nms: apply zero-padded maxpool NMS (`fast.py:241-266`).
        nms_radius: NMS window radius.

    Returns:
        (B, 1, H, W) float map, 1.0 at detected corners.
    """
    x = image.astype(jnp.float32)[:, 0]
    b, h, w = x.shape
    xp = pad2d(x, 3, 3, mode="edge")  # one shared padded slab

    dark_bits = jnp.zeros((b, h, w), jnp.int32)
    bright_bits = jnp.zeros((b, h, w), jnp.int32)
    for i, (dy, dx) in enumerate(_CIRCLE):
        ring = xp[:, 3 + dy:3 + dy + h, 3 + dx:3 + dx + w]  # static shift
        diff = ring - x
        dark_bits = dark_bits | ((diff >= threshold).astype(jnp.int32) << i)
        bright_bits = bright_bits | ((diff <= -threshold).astype(jnp.int32) << i)

    detected = _has_9_consecutive(dark_bits) | _has_9_consecutive(bright_bits)
    score = detected.astype(jnp.float32)[:, None]

    if use_nms:
        local_max = maxpool2d_same(score, nms_radius, pad_mode="zero")
        score = jnp.where(score == local_max, score, 0.0)
    return score

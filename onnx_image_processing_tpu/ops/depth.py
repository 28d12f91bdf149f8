"""Depth-image ops: unprojection, normals, and depth→RGB alignment.

TPU-native re-design of `pytorch_model/depth/`:

* Ray grids are broadcasted ``arange`` expressions (the reference fills them
  with Python loops at construction, `depth2pointcloud.py:11-14`).
* The reference's depth alignment splats with in-place index assignment into
  four buffers — last-write-wins on colliding pixels, nondeterministic on
  parallel backends (`depth_align.py:103-115`). Here the splat is a single
  ``scatter-min`` over all four neighbor positions: deterministic, and
  semantically the intended "nearest depth wins".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .filters import pad2d, conv1d_h, conv1d_w

_S121 = (1.0, 2.0, 1.0)
_D10m1 = (1.0, 0.0, -1.0)


def _ray_grid(height: int, width: int, cx: float, cy: float, fx: float,
              fy: float, scale: float) -> jax.Array:
    """(H, W, 3) rays [(u-cx)/fx, (v-cy)/fy, 1] * scale."""
    u = (jnp.arange(width, dtype=jnp.float32) - cx) / fx
    v = (jnp.arange(height, dtype=jnp.float32) - cy) / fy
    uu = jnp.broadcast_to(u[None, :], (height, width))
    vv = jnp.broadcast_to(v[:, None], (height, width))
    return jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1) * scale


@partial(jax.jit, static_argnames=("cx", "cy", "fx", "fy", "scale"))
def depth_to_pointcloud(depth: jax.Array, cx: float, cy: float, fx: float,
                        fy: float, scale: float = 1.0) -> jax.Array:
    """Unproject a depth image to a camera-frame point cloud.

    Args:
        depth: (H, W) or (H, W, 1) depth image.

    Returns:
        (H, W, 3) point cloud. Parity: `depth/depth2pointcloud.py:5-24`.
    """
    if depth.ndim == 2:
        depth = depth[..., None]
    h, w = depth.shape[:2]
    return depth.astype(jnp.float32) * _ray_grid(h, w, cx, cy, fx, fy, scale)


@partial(jax.jit, static_argnames=("cx", "cy", "fx", "fy", "scale"))
def depth_to_pointcloud_with_normal(depth: jax.Array, cx: float, cy: float,
                                    fx: float, fy: float, scale: float = 1.0):
    """Point cloud + per-pixel normals.

    Reproduces the reference's normal construction exactly
    (`depth/depth2pointcloud_with_normal.py:23-33`): the (1, 3, 3, 3) Sobel
    convs sum the x/y derivative over all three xyz channels (zero padding,
    unnormalized [1,0,-1] taps), then vec = [dx, dy, -1] is L2-normalized.

    Returns:
        (pcd (H, W, 3), normals (H, W, 3)).
    """
    pcd = depth_to_pointcloud(depth, cx, cy, fx, fy, scale)
    chans = jnp.moveaxis(pcd, -1, 0)  # (3, H, W)
    xp = pad2d(chans, 1, 1, mode="zero")
    dx = conv1d_w(conv1d_h(xp, _S121), _D10m1).sum(axis=0)   # sum over xyz
    dy = conv1d_w(conv1d_h(xp, _D10m1), _S121).sum(axis=0)
    vec = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)
    norm = jnp.sqrt((vec ** 2).sum(axis=-1, keepdims=True))
    return pcd, vec / norm


def transform_points(points: jax.Array, rotation: jax.Array,
                     translation: jax.Array) -> jax.Array:
    """Rigid transform ``p @ R + t`` (parity: `depth_align.py:28-36`
    Point2Point convention).

    Args:
        points: (..., 3); rotation (3, 3); translation (3,).
    """
    return points @ rotation.astype(jnp.float32) + \
        translation.astype(jnp.float32).reshape(3)


def points_to_pixels(points: jax.Array, cx: float, cy: float, fx: float,
                     fy: float):
    """Project camera-frame points to pixel coordinates; zero-depth points map
    to (0, 0) (parity: `depth_align.py:39-60` Point2Pixel).

    Args:
        points: (..., 3).

    Returns:
        (px, py) arrays of shape points.shape[:-1].
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    px = jnp.where(z == 0.0, 0.0, x / z * fx + cx)
    py = jnp.where(z == 0.0, 0.0, y / z * fy + cy)
    return px, py


@partial(jax.jit, static_argnames=(
    "width", "height", "scale", "depth_cx", "depth_cy", "depth_fx", "depth_fy",
    "rgb_cx", "rgb_cy", "rgb_fx", "rgb_fy"))
def depth_alignment(
    depth_image: jax.Array,
    rotation: jax.Array,
    translation: jax.Array,
    width: int,
    height: int,
    depth_cx: float, depth_cy: float, depth_fx: float, depth_fy: float,
    rgb_cx: float, rgb_cy: float, rgb_fx: float, rgb_fy: float,
    scale: float = 1.0,
) -> jax.Array:
    """Align a depth image to the RGB camera frame.

    Unproject (depth intrinsics) → rigid transform → reproject (RGB
    intrinsics) → 4-neighbor min-depth splat with 0 fill.
    Parity: `depth/depth_align.py:63-116` with the in-place 4-buffer
    assignment replaced by one deterministic scatter-min.

    Args:
        depth_image: (H, W).
        rotation: (3, 3); translation: (3,). Applied as ``p @ R + t``
            (`depth_align.py:36` convention).

    Returns:
        (H, W) aligned depth, 0 where nothing projects.
    """
    pts = depth_to_pointcloud(depth_image, depth_cx, depth_cy, depth_fx,
                              depth_fy, scale)                      # (H, W, 3)
    pts = transform_points(pts.reshape(-1, 3), rotation, translation)
    px, py = points_to_pixels(pts, rgb_cx, rgb_cy, rgb_fx, rgb_fy)

    oob = (px < 0) | (px >= width) | (py < 0) | (py >= height)
    px = jnp.where(oob, 0.0, px)
    py = jnp.where(oob, 0.0, py)

    # trunc (toward zero) matches torch .to(int64); coords are >= 0 here.
    x0 = jnp.trunc(px - 0.5).astype(jnp.int32)
    x1 = jnp.trunc(px + 0.5).astype(jnp.int32)
    y0 = jnp.trunc(py - 0.5).astype(jnp.int32)
    y1 = jnp.trunc(py + 0.5).astype(jnp.int32)

    vals = depth_image.reshape(-1).astype(jnp.float32)
    fill = 10000.0
    ys = jnp.concatenate([y0, y0, y1, y1])
    xs = jnp.concatenate([x0, x1, x0, x1])
    v4 = jnp.tile(vals, 4)
    aligned = jnp.full((height, width), fill, jnp.float32)
    aligned = aligned.at[ys, xs].min(v4, mode="drop")
    return jnp.where(aligned == fill, 0.0, aligned)

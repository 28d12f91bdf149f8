"""Voxel-grid point-cloud downsampling with static shapes.

TPU-native re-design of `pytorch_model/pointcloud/voxel_downsampling.py:5-104`.
The reference's output count M is data-dependent (it compacts group means with
``torch.nonzero`` + prefix-sum bookkeeping, `:76-98`) — the one op in the
reference that fights static shapes (SURVEY.md §2.8). Here the same sort +
group-id construction feeds a fixed-capacity ``scatter-add``: group g's sum and
count land at row g of an (N, D) buffer, means = sums / counts, and validity is
``counts > 0``. Output shape is always (N, D) + (N,) mask — identical contract
(first M rows are the voxel centroids in sorted-key order, rest zero-padded),
zero dynamic shapes, one compile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def voxel_downsampling(points: jax.Array, leaf_size: jax.Array):
    """Average points within each voxel cell.

    Args:
        points: (N, D) point coordinates (typically D=3).
        leaf_size: scalar voxel edge length.

    Returns:
        (output_points (N, D), mask (N,) bool): first M entries are voxel
        centroids ordered by voxel key, the rest zero; mask flags valid rows.
    """
    n, d = points.shape
    if n == 0:
        return points, jnp.ones((0,), bool)
    pts = points.astype(jnp.float32)

    vox = jnp.floor(pts / leaf_size).astype(jnp.int32)
    vox = vox - vox.min(axis=0)
    vmax = vox.max(axis=0)
    # 1-D keys; row-major over however many dims D has.
    key = vox[:, 0]
    for a in range(1, d):
        key = key * (vmax[a] + 1) + vox[:, a]

    order = jnp.argsort(key)
    skey = key[order]
    spts = pts[order]

    is_new = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
    group_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1      # (N,) 0..M-1

    sums = jnp.zeros((n, d), jnp.float32).at[group_id].add(spts)
    counts = jnp.zeros((n,), jnp.float32).at[group_id].add(1.0)
    mask = counts > 0
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return means * mask[:, None], mask

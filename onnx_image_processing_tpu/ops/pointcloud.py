"""Voxel-grid point-cloud downsampling with static shapes.

TPU-native re-design of `pytorch_model/pointcloud/voxel_downsampling.py:5-104`.
The reference's output count M is data-dependent (it compacts group means with
``torch.nonzero`` + prefix-sum bookkeeping, `:76-98`) — the one op in the
reference that fights static shapes (SURVEY.md §2.8). Output here is always
(N, D) + (N,) mask — identical contract (first M rows are the voxel centroids
in sorted-key order, rest zero-padded), zero dynamic shapes, one compile.

Design (round 4): the op is built from two payload-carrying ``lax.sort``s and
a prefix sum — **zero scatters, zero gathers**. Scatter-adds dominated the
previous formulation (760 of 1114 µs at N=38.4k on v5e); this one measures
297 µs for the same shapes:

1. ``lax.sort`` keys the points by linearized voxel id, carrying the D
   coordinate columns as payload (no argsort+gather).
2. Per-group sums come from an inclusive ``cumsum`` differenced at group
   *ends* — the reference's own prefix-sum trick
   (`voxel_downsampling.py:60-75`). Precision: the cumsum runs over
   **residuals** ``p - floor(p/leaf)*leaf`` (each bounded by ``leaf``), not
   raw coordinates, so the running sum stays small; the group-constant base
   is added back after the mean. Measured max error vs a float64 oracle at
   N=38.4k: 9e-5 with residuals vs 3e-3 raw (the reference's error profile)
   vs 3e-7 scatter-add.
3. Compaction (group g's stats → row g) is a second *stable* sort on the
   not-end flag: group ends, already in increasing-key order, move to the
   front carrying (cumsum row, index, base) as payload. Group stats are then
   adjacent differences of the compacted prefix rows.

The base is recomputed from the *sorted* coordinates (bit-identical to the
pre-sort floor), never decoded from the int32 key — key wraparound at extreme
``range/leaf`` ratios then degrades exactly like the reference (rare key
collisions), not catastrophically.
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

    # Sort 1: voxel key carrying the coordinates (replaces argsort + gather).
    sorted_ops = jax.lax.sort(
        (key,) + tuple(pts[:, i] for i in range(d)), num_keys=1,
        is_stable=False)
    skey = sorted_ops[0]
    spts = jnp.stack(sorted_ops[1:], axis=1)

    # Residual prefix sum: base is constant within a group (same voxel ⇒ same
    # floor), so group_mean = base + mean(residuals). Residuals ∈ [0, leaf).
    sbase = jnp.floor(spts / leaf_size) * leaf_size
    csum = jnp.cumsum(spts - sbase, axis=0)
    # int32 payload (lax.sort carries mixed payload dtypes): group counts stay
    # exact for any N, not just the float32-exact N < 2^24 range.
    idx1 = jnp.arange(1, n + 1, dtype=jnp.int32)
    is_end = jnp.concatenate([skey[1:] != skey[:-1], jnp.ones(1, bool)])
    m = jnp.sum(is_end.astype(jnp.int32))

    # Sort 2 (stable): compact the group-end rows to the front, in group
    # order, carrying (prefix row, 1-based index, base) — replaces scatter.
    compacted = jax.lax.sort(
        ((~is_end).astype(jnp.int32),)
        + tuple(csum[:, i] for i in range(d)) + (idx1,)
        + tuple(sbase[:, i] for i in range(d)),
        num_keys=1, is_stable=True)
    cend = jnp.stack(compacted[1:1 + d], axis=1)       # prefix at group ends
    cnt_end = compacted[1 + d]                          # end index + 1 (int32)
    base = jnp.stack(compacted[2 + d:2 + 2 * d], axis=1)

    # Group sums/counts = adjacent differences of the compacted prefix rows.
    prev = jnp.concatenate([jnp.zeros((1, d), jnp.float32), cend[:-1]], axis=0)
    prev_cnt = jnp.concatenate([jnp.zeros((1,), jnp.int32), cnt_end[:-1]])
    counts = cnt_end - prev_cnt
    mask = jnp.arange(n) < m
    means = base + (cend - prev) / jnp.maximum(counts, 1).astype(
        jnp.float32)[:, None]
    return means * mask[:, None], mask

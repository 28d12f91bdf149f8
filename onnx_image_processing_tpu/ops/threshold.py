"""Otsu and multi-Otsu thresholding.

TPU-native re-design of `pytorch_model/threshold/{otsu.py,multi_otsu.py}`:

* The reference materializes (BINS, BINS) tril/complement masks and reduces
  with elementwise products (`otsu.py:14-15,26-37`) — O(BINS^2) work. Black
  and white class statistics are prefix sums of the histogram, so here they
  are two ``cumsum`` passes: O(BINS).
* MultiOtsu in the reference enumerates all C(BINS-1, n-1) threshold
  combinations against precomputed (n_class, COMB, BINS) masks
  (`multi_otsu.py:21-29`) — O(C(BINS-1, n-1) * BINS) memory. Here class
  statistics come from cumsum lookups on a (BINS, ..., BINS) threshold grid:
  O(BINS^(n-1)) with no combination tables, and every lookup is a vectorized
  gather. Same argmax-of-between-class-variance objective, same returned
  threshold convention (last bin index of each class).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("min_val", "max_val"))
def otsu_threshold(img: jax.Array, min_val: int = 0, max_val: int = 255):
    """Otsu's binarization threshold + binarized image.

    Args:
        img: (H, W) integer-valued image in [min_val, max_val].

    Returns:
        (thresh (int32 scalar), bin_img (H, W) int32 in {min_val, max_val}),
        where pixels <= thresh map to min_val. Parity: `threshold/otsu.py:17-48`.
    """
    bins = max_val - min_val + 1
    idx = (img.reshape(-1).astype(jnp.int32) - min_val)
    hist = jnp.bincount(idx, length=bins).astype(jnp.float32)
    vals = jnp.arange(min_val, max_val + 1, dtype=jnp.float32)

    csum = jnp.cumsum(hist)                  # black-class counts per threshold
    cval = jnp.cumsum(hist * vals)           # black-class intensity sums
    total_n = csum[-1]
    total_v = cval[-1]

    num_bk = csum
    num_wh = total_n - csum
    mean_bk = cval / num_bk                  # NaN where num_bk == 0
    mean_wh = (total_v - cval) / num_wh

    var = num_bk * num_wh * (mean_bk - mean_wh) ** 2
    var = jnp.where(jnp.isnan(var), 0.0, var)
    thresh = jnp.argmax(var).astype(jnp.int32)

    bin_img = jnp.where(img <= thresh + min_val, min_val, max_val).astype(jnp.int32)
    return thresh, bin_img


@partial(jax.jit, static_argnames=("min_val", "max_val", "n_class", "calc_hist"))
def multi_otsu_threshold(x: jax.Array, min_val: int = 0, max_val: int = 255,
                         n_class: int = 3, calc_hist: bool = True):
    """n-class Otsu thresholds by exhaustive search over the threshold grid.

    Matches the reference contract (`threshold/multi_otsu.py:6-70`): BINS =
    max_val - min_val (note: NOT +1 — reference quirk), class c covers bins
    [t_{c-1}, t_c), and each returned threshold is the last bin index of its
    class (t_c - 1). Maximizes the pairwise between-class variance
    sum_{i<j} n_i n_j (mu_i - mu_j)^2.

    Args:
        x: (H, W) image (``calc_hist=True``) or precomputed (BINS,) histogram.

    Returns:
        tuple of (n_class - 1) int32 thresholds.
    """
    if n_class < 2:
        raise ValueError(f"n_class must be >= 2, got {n_class}")
    bins = max_val - min_val
    if calc_hist:
        idx = x.reshape(-1).astype(jnp.int32) - min_val
        hist = jnp.bincount(idx, length=bins).astype(jnp.float32)
    else:
        hist = x.astype(jnp.float32)

    vals = jnp.arange(min_val, max_val, dtype=jnp.float32)
    # Prefix sums with a leading 0 so cs[t] = sum of bins [0, t).
    cs_n = jnp.concatenate([jnp.zeros(1), jnp.cumsum(hist)])
    cs_v = jnp.concatenate([jnp.zeros(1), jnp.cumsum(hist * vals)])

    # Threshold grid: t_1 < t_2 < ... < t_{n-1}, each in [1, BINS-1].
    n_t = n_class - 1
    grids = jnp.meshgrid(*[jnp.arange(1, bins) for _ in range(n_t)],
                         indexing="ij")
    valid = jnp.ones(grids[0].shape, bool)
    for a in range(n_t - 1):
        valid &= grids[a] < grids[a + 1]

    # Class boundaries: [0, t1), [t1, t2), ..., [t_{n-1}, BINS).
    bounds = [jnp.zeros_like(grids[0])] + list(grids) + [
        jnp.full_like(grids[0], bins)]
    nums, means = [], []
    for c in range(n_class):
        lo, hi = bounds[c], bounds[c + 1]
        n_c = cs_n[hi] - cs_n[lo]
        v_c = cs_v[hi] - cs_v[lo]
        nums.append(n_c)
        means.append(v_c / n_c)  # NaN where empty

    var = jnp.zeros_like(grids[0], dtype=jnp.float32)
    for i, j in itertools.combinations(range(n_class), 2):
        var = var + nums[i] * nums[j] * (means[i] - means[j]) ** 2
    var = jnp.where(jnp.isnan(var) | ~valid, 0.0, var)

    flat_idx = jnp.argmax(var.reshape(-1))
    idxs = jnp.unravel_index(flat_idx, var.shape)
    # Reference returns the last bin index of each class (t_c - 1).
    return tuple((g[idxs] - 1).astype(jnp.int32) for g in grids)

"""Keypoint selection utilities: max-pool NMS and static top-k selection.

Re-design of `pytorch_model/utils/keypoint_utils.py`. Keypoints follow the
framework-wide contract: (B, K, 2) float32 in (y, x) order, invalid slots padded
with (-1, -1) and zero scores (`keypoint_utils.py:104-117`).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp

from .filters import maxpool2d_same
from ..kernels import select_frontend
from ..kernels import use_pallas_default


def _chunked_top_k(vals: jax.Array, k: int, c: int):
    """Exact top-k as a two-level chunk merge: top-k per chunk of n/c, then
    top-k over the c*k survivors. Exact INCLUDING the lowest-index tie rule:
    each chunk's top-k is a superset of its intersection with the global
    top-k (the global set has only k members), per-chunk ties come out in
    index order, and the merge concatenates chunks in index order, so equal
    values are still selected lowest-linear-index first. Padding (to a chunk
    multiple) appends zeros at indices >= n, which sort after every real
    element of equal value for the same reason.

    Why: ``lax.top_k`` on TPU is a deep bitonic sort over the full row; two
    shallow sorts move the same bytes through far fewer passes. Measured
    (v5e): (2, 57600) k=512 366.7 -> 108.4 us (3.4x) at c=16, bit-exact;
    break-even by (24, 19200) where n/k is too small — hence the policy in
    :func:`_top_k`.
    """
    b, n = vals.shape
    nc = -(-n // c)
    if nc * c != n:
        vals = jnp.pad(vals, ((0, 0), (0, nc * c - n)))
    v1, i1 = jax.lax.top_k(vals.reshape(b * c, nc), min(k, nc))
    base = (jnp.arange(c, dtype=i1.dtype) * nc)[None, :, None]
    gidx = (i1.reshape(b, c, -1) + base).reshape(b, -1)
    v2, i2 = jax.lax.top_k(v1.reshape(b, -1), k)
    return v2, jnp.take_along_axis(gidx, i2, axis=1)


def _top_k(vals: jax.Array, k: int, approx: bool):
    """Exact top-k or, opted in, TPU-binned ``lax.approx_max_k``
    (recall_target 0.95; exact fallback on backends without the TPU
    PartialReduce op).

    The exact path auto-selects the chunked two-level merge
    (:func:`_chunked_top_k`, bit-exact) when it measures faster than the
    single deep sort (v5e break-even grid, round 4): always at n >= 64k
    (3-3.6x at 1080p block-grid scale, any row count), and additionally for
    NARROW batches (b <= 4 rows after the rank-2 fold) from n >= 16k —
    b=2, n=10240 (the 480p single-pair shape) measures 69 -> 26 us (2.7x),
    while the same n at b >= 12 (vmapped multi-pair folds) measures SLOWER
    (0.6-0.8x: the first-stage sort's b*c rows dominate), so wide folds
    keep the plain ``lax.top_k`` below the 64k gate.

    Rank discipline: a ``custom_vmap`` rule collapses any vmap batching back
    to rank 2 before the selection runs. XLA's TopkRewriter only rewrites
    RANK-2 sort patterns into the fast PartialReduce custom call; left rank-3
    by vmap, ``lax.top_k`` lowers to a full variadic stable sort — measured
    807 vs 209 us on (12, 2, 10240) k=512 (v5e), exactly the `sort.5` that
    dominated the vmapped multi-pair graphs (BASELINE.md round 4)."""
    return _top_k_rank2(int(k), bool(approx))(vals)


@functools.lru_cache(maxsize=None)
def _top_k_rank2(k: int, approx: bool):
    @jax.custom_batching.custom_vmap
    def select(vals):
        if approx:
            return tuple(jax.lax.approx_max_k(vals, k, recall_target=0.95,
                                              aggregate_to_topk=True))
        b, n = vals.shape
        # isinstance: symbolic dims (shape-polymorphic export) take the
        # plain path — chunk counts are compile-time structure.
        if (isinstance(n, int) and isinstance(b, int)
                and (n >= 64 * k or (b <= 4 and n >= 16 * k))):
            c = 1
            while n // (2 * c) >= 4 * k and c < 32:
                c *= 2
            if c > 1:
                return _chunked_top_k(vals, k, c)
        return tuple(jax.lax.top_k(vals, k))

    @select.def_vmap
    def _rule(axis_size, in_batched, vals):  # noqa: ANN001
        lead = vals.shape[:-1]
        tv, ti = select(vals.reshape(-1, vals.shape[-1]))
        return (tv.reshape(*lead, k), ti.reshape(*lead, k)), (True, True)

    return select


def _block_reduce_xla(masked: jax.Array, bs: int, w: int):
    """XLA block reduction: per-(bs x bs) block max + raster-first argmin.

    ``masked`` is the NMS/border/threshold-masked (B, H, W) map. Returns
    ``(block_max (B, Hb, Wb), block_idx (B, Hb, Wb) int32)``; the argmin is
    the minimum linear index among the block's maximal elements (matches
    lax.top_k's lowest-index tie rule). This is the jnp oracle the fused
    Pallas kernel (`kernels/select_frontend.py`) is bit-identical to.
    """
    b, h, wd = masked.shape
    hp, wp = -(-h // bs) * bs, -(-wd // bs) * bs
    if (hp, wp) != (h, wd):
        padded = jnp.pad(masked, ((0, 0), (0, hp - h), (0, wp - wd)))
    else:
        padded = masked
    win = (1, bs, bs)
    block_max = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max, win, win, "VALID")  # (B, Hb, Wb)
    lin = (jnp.arange(hp, dtype=jnp.int32)[:, None] * w
           + jnp.arange(wp, dtype=jnp.int32)[None, :])[None]
    up = jnp.repeat(jnp.repeat(block_max, bs, axis=1), bs, axis=2)
    cand = jnp.where(padded == up, lin, jnp.int32(2**31 - 1))
    block_idx = jax.lax.reduce_window(
        cand, jnp.int32(2**31 - 1), jax.lax.min, win, win, "VALID")
    return block_max, block_idx


def _decode_topk(topk_scores: jax.Array, topk_idx: jax.Array, w: int):
    """Shared tail: linear index -> (y, x), invalid slots -> (-1, -1)/0."""
    y = (topk_idx // w).astype(jnp.float32)
    x = (topk_idx % w).astype(jnp.float32)
    kpts = jnp.stack([y, x], axis=-1)
    valid = topk_scores > 0
    kpts = jnp.where(valid[..., None], kpts, -1.0)
    return kpts, jnp.where(valid, topk_scores, 0.0)


@partial(jax.jit, static_argnames=("nms_radius",))
def nms_maxpool(scores: jax.Array, nms_radius: int) -> jax.Array:
    """Local-maximum mask via (2r+1)^2 max-pool with -inf border.

    Args:
        scores: (B, H, W) score map.
        nms_radius: window radius.

    Returns:
        (B, H, W) float mask, 1.0 where ``score >= local_max - 1e-7``.

    Parity: `pytorch_model/utils/keypoint_utils.py:12-44`.
    """
    local_max = maxpool2d_same(scores, nms_radius, pad_mode="neg_inf")
    return (scores >= local_max - 1e-7).astype(scores.dtype)


@partial(jax.jit, static_argnames=("max_keypoints", "score_threshold",
                                   "border_margin", "nms_radius", "approx"))
def select_topk_keypoints(
    scores: jax.Array,
    nms_mask: jax.Array,
    max_keypoints: int,
    score_threshold: float = 0.0,
    border_margin: int = 0,
    nms_radius: int | None = None,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Select the top-k surviving keypoints from a score map.

    Border masking is built by coordinate comparison (no scatter), matching
    `pytorch_model/utils/keypoint_utils.py:77-86`; invalid slots are padded to
    (-1, -1) with zero scores (`:88-117`).

    Two selection paths:

    * ``nms_radius=None``: flat ``lax.top_k`` over H*W — exact for any input,
      including maps with massive score ties (e.g. binary FAST maps).
    * ``nms_radius=r`` (the radius the ``nms_mask`` was built with): the map is
      first reduced by a per-(r+1)x(r+1)-block max; the sort then runs on
      H*W/(r+1)^2 elements (36x fewer at r=5) instead of the full map. NMS
      guarantees any two survivors within Chebyshev distance r have scores
      equal to within 1e-7 (each bounds the other via the shared window), so a
      block can only hold multiple survivors when their scores TIE — and then
      the block keeps one representative (first in raster order) where the
      flat sort, like the reference's top-k, would keep every tied copy in
      separate slots. For float-scored detectors on real images exact ties
      within distance r are probability-zero, making the reduction lossless
      in practice; for binary/quantized score maps (FAST) or synthetic
      saturated patterns it changes the keypoint set — use the flat path
      there (``MatcherConfig.topk_mode="sort"`` at the pipeline level).

    Args:
        scores: (B, H, W).
        nms_mask: (B, H, W) from :func:`nms_maxpool`.
        max_keypoints: K, static output size.
        score_threshold: keep strictly-greater scores only.
        border_margin: exclusion margin in pixels (0 disables).
        nms_radius: radius used for ``nms_mask``; enables the block-reduced
            fast path (see above).
        approx: use ``lax.approx_max_k`` (recall_target 0.95) for the final
            selection instead of exact ``lax.top_k``. APPROXIMATE — up to a
            few percent of rank-boundary keypoints may be replaced by
            near-ties; measured 5x faster at 1080p scale (360 -> 74 us over
            57.6k block maxima, v5e) and exact-fallback on CPU. Opt in via
            ``MatcherConfig.topk_mode="approx"`` for hi-res throughput
            serving; keep the default for parity-critical paths.

    Returns:
        keypoints (B, K, 2) float (y, x); scores (B, K).
    """
    b, h, w = scores.shape
    masked = scores * nms_mask
    if border_margin > 0:
        m = border_margin
        yv = (jnp.arange(h) >= m) & (jnp.arange(h) < h - m)
        xv = (jnp.arange(w) >= m) & (jnp.arange(w) < w - m)
        masked = masked * (yv[:, None] & xv[None, :]).astype(masked.dtype)
    masked = jnp.where(masked > score_threshold, masked, 0.0)

    use_blocks = nms_radius is not None and nms_radius >= 1
    if use_blocks:
        bs = nms_radius + 1
        hp, wp = -(-h // bs) * bs, -(-w // bs) * bs
        n_blocks = (hp // bs) * (wp // bs)
        # isinstance: symbolic H/W (shape-polymorphic export) skip the
        # tiny-map check — the caller's symbolic scope owns the "enough
        # blocks" constraint (models/serialize.py).
        if isinstance(n_blocks, int) and n_blocks < max_keypoints:
            use_blocks = False  # tiny map: fewer blocks than requested slots
    if use_blocks:
        block_max, block_idx = _block_reduce_xla(masked, bs, w)
        flat_scores = block_max.reshape(b, -1)
        flat_index = block_idx.reshape(b, -1)
        topk_scores, topk_block = _top_k(flat_scores, max_keypoints, approx)
        topk_idx = jnp.take_along_axis(flat_index, topk_block, axis=1)
    else:
        flat = masked.reshape(b, h * w)
        topk_scores, topk_idx = _top_k(flat, max_keypoints, approx)
    return _decode_topk(topk_scores, topk_idx, w)


@partial(jax.jit, static_argnames=("max_keypoints", "score_threshold",
                                   "border_margin", "nms_radius", "topk_mode",
                                   "use_pallas", "interpret"))
def nms_select_topk(
    scores: jax.Array,
    max_keypoints: int,
    score_threshold: float = 0.0,
    border_margin: int = 0,
    nms_radius: int = 3,
    topk_mode: str = "block",
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused NMS + top-k keypoint selection from a raw score map.

    The one-call form of ``nms_maxpool`` + ``select_topk_keypoints`` used by
    every pipeline. In block/approx mode on TPU the whole selection front —
    NMS local max, keep/border/threshold masking, per-(r+1)^2 block max and
    raster-first argmin — runs as ONE Pallas pass over the score map
    (`kernels/select_frontend.py`), replacing the three XLA ``reduce_window``
    ops whose layout pathology inflated 36 -> 756+ us inside fused multi-pair
    graphs and cost 311 us/frame at 1080p (BASELINE.md round 3). The kernel's
    block grids are bit-identical to the XLA path, so the shared top-k /
    decode tail below keeps outputs bit-exact across backends.

    Args:
        scores: (B, H, W) raw detector scores.
        max_keypoints: K, static output size.
        score_threshold / border_margin / nms_radius: as in
            :func:`select_topk_keypoints`.
        topk_mode: "block" (default), "sort" (reference-exact flat top-k, no
            block reduction — stays on the XLA path), or "approx"
            (block reduction + ``lax.approx_max_k``).
        use_pallas: force the Pallas (True) or XLA (False) selection front;
            None picks by the default device platform (TPU -> Pallas).
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        keypoints (B, K, 2) float (y, x); scores (B, K).
    """
    b, h, w = scores.shape
    use_blocks = topk_mode in ("block", "approx") and nms_radius >= 1
    approx = topk_mode == "approx"
    if use_blocks:
        bs = nms_radius + 1
        hp, wp = -(-h // bs) * bs, -(-w // bs) * bs
        n_blocks = (hp // bs) * (wp // bs)
        # isinstance: symbolic H/W (shape-polymorphic export) skip the
        # tiny-map check — the caller's symbolic scope owns the "enough
        # blocks" constraint (models/serialize.py).
        if isinstance(n_blocks, int) and n_blocks < max_keypoints:
            use_blocks = False

    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_blocks and use_pallas and select_frontend.supports(h, w,
                                                              nms_radius):
        # Top-k runs directly on the kernel's lane/stripe-padded grid (pad
        # slots carry score 0 = masked-out; the visible keypoint set is
        # bit-identical to the sliced path) — slicing to (Hb, Wb) first
        # costs a full relayout pass in fused graphs.
        block_max, block_idx = select_frontend.nms_block_reduce_padded(
            scores, nms_radius, score_threshold, border_margin,
            interpret=interpret)
        topk_scores, topk_block = _top_k(block_max.reshape(b, -1),
                                         max_keypoints, approx)
        topk_idx = jnp.take_along_axis(block_idx.reshape(b, -1), topk_block,
                                       axis=1)
        return _decode_topk(topk_scores, topk_idx, w)

    mask = nms_maxpool(scores, nms_radius)
    return select_topk_keypoints(scores, mask, max_keypoints, score_threshold,
                                 border_margin,
                                 nms_radius=nms_radius if use_blocks else None,
                                 approx=approx)


def refine_keypoints_subpixel(scores: jax.Array, keypoints: jax.Array,
                              kpt_scores: jax.Array | None = None):
    """In-graph per-axis 3-point parabola sub-pixel refinement.

    The reference implements this only on the host, outside every exported
    graph (`sample/feature_detection.py:48-126`, SURVEY.md §3.3); this jnp
    version lets pipelines emit sub-pixel keypoints without a host round trip.
    Semantics match the host version: offset (f(-1)-f(1)) / (2(f(-1)-2f(0)+f(1)))
    applied only where the parabola is concave and |delta| < 1; border and
    invalid (-1, -1) keypoints pass through unchanged.

    Args:
        scores: (B, H, W) raw (pre-NMS) score map.
        keypoints: (B, K, 2) integer-valued (y, x).
        kpt_scores: optional (B, K) scores to refine alongside.

    Returns:
        (B, K, 2) refined keypoints [, (B, K) interpolated scores].
    """
    b, h, w = scores.shape
    yi = keypoints[..., 0].astype(jnp.int32)
    xi = keypoints[..., 1].astype(jnp.int32)
    valid = (yi >= 1) & (yi < h - 1) & (xi >= 1) & (xi < w - 1)
    yc = jnp.clip(yi, 1, h - 2)
    xc = jnp.clip(xi, 1, w - 2)

    flat = scores.reshape(b, h * w)

    def at(dy, dx):
        idx = (yc + dy) * w + (xc + dx)
        return jnp.take_along_axis(flat, idx, axis=1)

    f0 = at(0, 0)

    def delta(f_n, f_p):
        denom = 2.0 * (f_n - 2.0 * f0 + f_p)
        d = jnp.where(denom < -1e-6, (f_n - f_p) / jnp.where(denom == 0, 1.0, denom), 0.0)
        return jnp.where(jnp.abs(d) < 1.0, d, 0.0)

    fy_n, fy_p = at(-1, 0), at(1, 0)
    fx_n, fx_p = at(0, -1), at(0, 1)
    dy = delta(fy_n, fy_p) * valid
    dx = delta(fx_n, fx_p) * valid

    refined = jnp.stack([keypoints[..., 0] + dy, keypoints[..., 1] + dx], axis=-1)
    refined = jnp.where((keypoints[..., :1] >= 0), refined, keypoints)
    if kpt_scores is None:
        return refined
    score_y = f0 + 0.25 * dy * (fy_p - fy_n)
    score_x = f0 + 0.25 * dx * (fx_p - fx_n)
    new_scores = jnp.where(valid & (keypoints[..., 0] >= 0),
                           (score_y + score_x) / 2.0, kpt_scores)
    return refined, new_scores

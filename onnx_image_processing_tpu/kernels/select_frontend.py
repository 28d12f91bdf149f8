"""Pallas TPU kernel: fused NMS + block-reduced top-k candidate selection.

The selection stage (NMS max-pool -> mask -> per-(r+1)^2 block max + raster-
first argmin, `ops/keypoints.py`) is three XLA ``reduce_window`` ops. Round-3
tracing named those ops as the repo's one standing performance pathology:

* inside fused multi-pair graphs XLA picks a catastrophic layout for them
  (36 -> 756 us at stacked B=2; 1,428 + 953 us in the vmapped B=8 graph),
  hard-capping single-chip pair batching at B~6, and
* at 1080p they burn 311 us/frame even at B=1 — pure plumbing around
  ~0 GFLOP of work.

This kernel replaces all three with ONE pass over the score map per
(image, row-stripe) grid step:

  1. a stripe of ``S`` rows plus an 8-row halo is DMA'd from HBM;
  2. the (2r+1)^2 local max is computed separably — 2r static sublane-offset
     slices (rows), then 2r lane rolls with wrap masking (columns) — giving
     the keep mask ``score >= local_max - 1e-7`` with the reference's -inf
     border semantics (the wrapper pads with -inf);
  3. border-margin and threshold masks are fused in (iota compares, no
     scatter), yielding the masked map ``m``;
  4. per-(r+1)x(r+1) block max and the raster-first argmin linear index are
     computed as two sliding-window passes (width ``bs = r+1``: static
     sublane slices for y, lane rolls for x) — NMS guarantees at most one
     distinct survivor per block, exactly the contract the block-reduced
     top-k relies on (`ops/keypoints.py:63-78`);
  5. block anchors (every ``bs``-th column) are compacted onto a 128-aligned
     lane grid by a 0/1 selection matmul on the MXU. Mosaic matmuls truncate
     f32 operands to bf16, so the operand is split into three bf16 planes
     (x = x1+x2+x3 EXACTLY: each split captures >=8 mantissa bits, and every
     partial-sum order recombines the disjoint mantissa fields exactly in the
     f32 accumulator) — the compaction is a bit-exact copy, not an
     approximation. Indices ride the same matmul as f32 integers (< 2^24,
     guarded by the wrapper).

The output is the same (B, Hb, Wb) block-maxima + block-argmin grids the XLA
path produces — bit-identical by construction, so the downstream
``lax.top_k`` / decode / padding in `ops/keypoints.py` is shared unchanged.

Reference semantics matched: `pytorch_model/utils/keypoint_utils.py:12-44`
(NMS max-pool, -inf border, 1e-7 slack) and `:47-117` (border mask by
coordinate compare, threshold, flat top-k with lowest-index tie rule, which
the block path preserves via the raster-first argmin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8          # DMA row alignment; covers any nms_radius <= 8
_ROWS_PER_STEP = 16  # block rows emitted per grid step (sublane-tile friendly)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports(h: int, w: int, nms_radius: int) -> bool:
    """Static shape guard for the kernel path.

    * static H/W only: symbolic dims from shape-polymorphic exports take
      the XLA block path, whose shape arithmetic stays symbolic-safe;
    * radius 1..7: bs = r+1 block geometry, halo 8 covers the NMS window;
    * linear raster indices must stay f32-exact (< 2^24) through the
      selection matmul — true for anything up to 4K.
    """
    if not (isinstance(h, int) and isinstance(w, int)):
        return False
    if not 1 <= nms_radius <= 7:
        return False
    bs = nms_radius + 1
    s = _ROWS_PER_STEP * bs
    hp = _round_up(h, bs)
    n_stripes = -(-hp // s)
    wp_lane = _round_up(_round_up(w, bs), 128)
    return (n_stripes * s - 1) * w + wp_lane < 2 ** 24


def _select_kernel(
    scores_hbm,          # (B*Hp, Wp) HBM/ANY, -inf padded, batch-major rows
    out_s_ref,           # (ROWS, wb_pad) VMEM f32: block maxima
    out_i_ref,           # (ROWS, wb_pad) VMEM int32: raster-first argmin lin
    buf,                 # (S + 2*HALO, Wp) VMEM scratch
    sem,                 # DMA semaphore
    *,
    n_stripes: int,
    s_rows: int,
    bs: int,
    r: int,
    h: int,
    w: int,
    hp_img: int,
    thr: float,
    margin: int,
    wb_pad: int,
    interpret: bool,
):
    step = pl.program_id(0)
    bidx = step // n_stripes
    sidx = step % n_stripes
    row0 = bidx * hp_img + sidx * s_rows  # 8-aligned: hp_img, s_rows mult 8
    cp = pltpu.make_async_copy(
        scores_hbm.at[pl.ds(row0, s_rows + 2 * _HALO), :], buf, sem)
    cp.start()
    cp.wait()

    a = buf[:]
    wp = a.shape[1]
    neg_inf = jnp.float32(-jnp.inf)

    # --- (2r+1)^2 local max, separably -------------------------------------
    rm = a[_HALO - r:_HALO - r + s_rows, :]
    for dy in range(1, 2 * r + 1):
        off = _HALO - r + dy
        rm = jnp.maximum(rm, a[off:off + s_rows, :])
    colx = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 1)
    lm = rm
    for dx in range(-r, r + 1):
        if dx == 0:
            continue
        rolled = pltpu.roll(rm, (-dx) % wp, axis=1)  # rolled[x] = rm[x+dx]
        valid = (colx + dx >= 0) & (colx + dx < wp)
        lm = jnp.maximum(lm, jnp.where(valid, rolled, neg_inf))

    # --- keep mask + border + threshold ------------------------------------
    center = a[_HALO:_HALO + s_rows, :]
    keep = center >= lm - 1e-7
    gy = sidx * s_rows + jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 0)
    ok = keep & (center > thr)
    if margin > 0:
        ok = ok & ((gy >= margin) & (gy < h - margin)
                   & (colx >= margin) & (colx < w - margin))
    m = jnp.where(ok, center, 0.0)

    # Raster linear index, f32-exact (< 2^24, see supports()). Row stride is
    # the TRUE width: identical to the XLA block path's `lin` grid.
    lin = (gy * w + colx).astype(jnp.float32)
    sent = jnp.float32(2.0 ** 24)

    # --- per-block max + raster-first argmin: y then x ----------------------
    # Sliding window of width bs along y (static sublane slices); only the
    # anchor rows i*bs are consumed below.
    n_sl = s_rows - bs + 1
    t_sl = m[0:n_sl, :]
    for d in range(1, bs):
        t_sl = jnp.maximum(t_sl, m[d:d + n_sl, :])
    c_sl = jnp.where(m[0:n_sl, :] == t_sl, lin[0:n_sl, :], sent)
    for d in range(1, bs):
        c_sl = jnp.minimum(
            c_sl, jnp.where(m[d:d + n_sl, :] == t_sl, lin[d:d + n_sl, :],
                            sent))
    t = jnp.concatenate(
        [t_sl[i * bs:i * bs + 1, :] for i in range(_ROWS_PER_STEP)], axis=0)
    c = jnp.concatenate(
        [c_sl[i * bs:i * bs + 1, :] for i in range(_ROWS_PER_STEP)], axis=0)

    # Sliding window of width bs along x (lane rolls). REAL anchor columns
    # j*bs (j < Wb) never read wrapped lanes (Wb*bs <= Wp), but the padded
    # output keeps PAD anchors in [Wb*bs, Wp) too, and when Wp is not a
    # multiple of bs a pad anchor within bs-1 lanes of Wp wraps onto real
    # column-0..bs-2 data — duplicating those keypoints into pad slots. Mask
    # each roll's wrapped lanes to the pad-neutral values (0 score / sent
    # index) so pad anchors stay score-0, exactly like non-wrapping ones.
    colx_b = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    rolls_t = [t] + [
        jnp.where(colx_b + d < wp, pltpu.roll(t, (-d) % wp, axis=1), 0.0)
        for d in range(1, bs)]
    rolls_c = [c] + [
        jnp.where(colx_b + d < wp, pltpu.roll(c, (-d) % wp, axis=1), sent)
        for d in range(1, bs)]
    tx = rolls_t[0]
    for d in range(1, bs):
        tx = jnp.maximum(tx, rolls_t[d])
    cx = jnp.where(rolls_t[0] == tx, rolls_c[0], sent)
    for d in range(1, bs):
        cx = jnp.minimum(cx, jnp.where(rolls_t[d] == tx, rolls_c[d], sent))

    # --- anchor compaction: exact 3-plane selection matmul ------------------
    # Planes MUST pack along the contraction axis into ONE dot (the sparse
    # sampler's recipe): written as dot(p1,sel)+dot(p2,sel)+dot(p3,sel), the
    # XLA algebraic simplifier re-associates the sum back into
    # dot(p1+p2+p3, sel) = dot(a, sel), whose operand truncation to bf16 then
    # destroys the exactness the split exists to provide (observed, not
    # hypothetical). Inside a single dot each bf16-exact plane contributes an
    # exact product and the f32 accumulator recombines the disjoint mantissa
    # fields exactly.
    sel = (jax.lax.broadcasted_iota(jnp.int32, (wp, wb_pad), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (wp, wb_pad), 1) * bs
           ).astype(jnp.float32)
    a_cat = jnp.concatenate([tx, cx], axis=0)     # (2*ROWS, Wp)
    p1 = a_cat.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = a_cat - p1
    p2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    p3 = r1 - p2
    planes = jnp.concatenate([p1, p2, p3], axis=1)      # (2*ROWS, 3*Wp)
    sel3 = jnp.concatenate([sel, sel, sel], axis=0)     # (3*Wp, wb_pad)
    # Interpret mode runs this body as ordinary XLA-CPU ops, where the
    # algebraic simplifier distributes the concat-dot, cancels the planes
    # back to `a_cat`, and truncates THAT to bf16 — HIGHEST precision defeats
    # the rewrite (and is exact by itself). Compiled Mosaic never sees the
    # XLA simplifier; default precision truncates operands to bf16, which is
    # exact for the bf16-exact planes.
    prec = jax.lax.Precision.HIGHEST if interpret else None
    out = jnp.dot(planes, sel3, preferred_element_type=jnp.float32,
                  precision=prec)
    out_s_ref[:] = out[:_ROWS_PER_STEP]
    out_i_ref[:] = out[_ROWS_PER_STEP:].astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _vmappable(nms_radius: int, score_threshold: float, border_margin: int,
               interpret: bool):
    """custom_vmap wrapper: ``jax.vmap`` over the selection front folds the
    mapped axis into the kernel's native batch axis instead of hitting the
    default pallas batching rule (which adds a non-trivial index map on the
    ANY-space operand — rejected by the Mosaic lowering, and the very layout
    pathology this kernel exists to avoid). This is what lets
    ``parallel.vmap_pairs`` / ``models.build_batched`` batch the whole
    pipeline with the fused frontend inside."""

    @jax.custom_batching.custom_vmap
    def reduce_fn(scores):
        return _nms_block_reduce_impl(scores, nms_radius, score_threshold,
                                      border_margin, interpret)

    @reduce_fn.def_vmap
    def _rule(axis_size, in_batched, scores):  # noqa: ANN001
        v, b, h, w = scores.shape
        bm, bi = reduce_fn(scores.reshape(v * b, h, w))
        hb, wb = bm.shape[1:]
        return ((bm.reshape(v, b, hb, wb), bi.reshape(v, b, hb, wb)),
                (True, True))

    return reduce_fn


def padded_geometry(h: int, w: int, nms_radius: int):
    """(rows, wb_pad, hb, wb) of the raw kernel output for the given map."""
    bs = nms_radius + 1
    s_rows = _ROWS_PER_STEP * bs
    hp = _round_up(h, bs)
    n_stripes = -(-hp // s_rows)
    wb = _round_up(w, bs) // bs
    return (n_stripes * _ROWS_PER_STEP, _round_up(wb, 128), hp // bs, wb)


@functools.partial(
    jax.jit,
    static_argnames=("nms_radius", "score_threshold", "border_margin",
                     "interpret"))
def nms_block_reduce(
    scores: jax.Array,        # (B, H, W) f32 raw detector scores
    nms_radius: int,
    score_threshold: float = 0.0,
    border_margin: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused NMS + masking + (r+1)^2 block reduction; one HBM pass.

    Returns ``(block_scores (B, Hb, Wb) f32, block_idx (B, Hb, Wb) int32)``
    bit-identical to the XLA block path in `ops/keypoints.py` (NMS keep mask,
    threshold/border masking, block max, min-linear-index tie rule).
    Vmap-safe: the mapped axis folds into the kernel's batch axis.
    """
    b, h, w = scores.shape
    bm, bi = nms_block_reduce_padded(scores, nms_radius, score_threshold,
                                     border_margin, interpret=interpret)
    _, _, hb, wb = padded_geometry(h, w, int(nms_radius))
    return bm[:, :hb, :wb], bi[:, :hb, :wb]


@functools.partial(
    jax.jit,
    static_argnames=("nms_radius", "score_threshold", "border_margin",
                     "interpret"))
def nms_block_reduce_padded(
    scores: jax.Array,
    nms_radius: int,
    score_threshold: float = 0.0,
    border_margin: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Raw (lane/stripe-padded) kernel output: (B, rows, wb_pad) grids.

    Pad slots carry score 0.0 — indistinguishable from masked-out cells, so
    top-k may run DIRECTLY on this layout with zero relayout copies (the
    reason this variant exists: the [:hb, :wb] slice of the aligned kernel
    output costs a full extra pass in fused graphs). Use
    :func:`padded_geometry` for the true-grid dims.
    """
    return _vmappable(int(nms_radius), float(score_threshold),
                      int(border_margin), bool(interpret))(scores)


def _nms_block_reduce_impl(
    scores: jax.Array,
    nms_radius: int,
    score_threshold: float,
    border_margin: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    b, h, w = scores.shape
    r = int(nms_radius)
    bs = r + 1
    s_rows = _ROWS_PER_STEP * bs
    hp = _round_up(h, bs)
    wp = _round_up(w, bs)
    hb, wb = hp // bs, wp // bs
    n_stripes = -(-hp // s_rows)
    hp_img = n_stripes * s_rows + 2 * _HALO
    wp_lane = _round_up(wp, 128)
    wb_pad = _round_up(wb, 128)

    padded = jnp.pad(scores,
                     ((0, 0), (_HALO, hp_img - _HALO - h), (0, wp_lane - w)),
                     constant_values=-jnp.inf)
    flat = padded.reshape(b * hp_img, wp_lane)

    kernel = functools.partial(
        _select_kernel, n_stripes=n_stripes, s_rows=s_rows, bs=bs, r=r,
        h=h, w=w, hp_img=hp_img, thr=float(score_threshold),
        margin=int(border_margin), wb_pad=wb_pad, interpret=interpret)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(b * n_stripes,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((_ROWS_PER_STEP, wb_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS_PER_STEP, wb_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * n_stripes * _ROWS_PER_STEP, wb_pad),
                                 jnp.float32),
            jax.ShapeDtypeStruct((b * n_stripes * _ROWS_PER_STEP, wb_pad),
                                 jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((s_rows + 2 * _HALO, wp_lane), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(flat)

    out_s = out_s.reshape(b, n_stripes * _ROWS_PER_STEP, wb_pad)
    out_i = out_i.reshape(b, n_stripes * _ROWS_PER_STEP, wb_pad)
    return out_s, out_i

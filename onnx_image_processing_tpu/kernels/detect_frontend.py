"""Pallas TPU kernel: fused Shi-Tomasi + orientation-moment + NMS front-end.

MEASURED OPT-IN (``MatcherConfig.fused_detect``), not the default: on v5e
this kernel runs the whole front-end in 0.134 ms vs 0.095 ms for XLA's own
fusion of the separable stencils (`ops/filters.py` shift-and-add passes),
and inside the full matcher graph it also blocks cross-stage overlap
(1689 -> 1309 FPS). The negative result is kept runnable because it
documents WHERE the line is: XLA's stencil fusion on TPU is excellent, and
hand-fusing thin VPU stencils (unlike the gather-shaped descriptor sampling
in `sparse_sampler.py`) does not pay. Same conclusion as the AKAZE ladder
kernel (`akaze_ladder.py`).

The detect side of the Shi-Tomasi matchers is a chain of thin separable
stencils (Sobel/box structure tensor -> lambda_min, 15-tap Gaussian moment
convs, 11x11 NMS max-pool). This kernel
computes all of them in ONE pass over row stripes of a VMEM-resident image:

  1. per image, ONE DMA brings the edge-padded frame (~1.5 MB at 480x640)
     into VMEM scratch (same per-image residency pattern as
     `sparse_sampler.py`);
  2. each grid step processes a 48-row output stripe from a (48 + 2*PAD)-row
     frame sliced straight out of VMEM — interior halos come from the
     resident image, border halos from the XLA edge pre-pad;
  3. the Shi-Tomasi score (replicate-pad semantics), the NMS keep mask
     (-inf-outside-image max-pool), and the Gaussian moment maps (zero-pad
     semantics, realized by masking the input with the image-validity mask)
     are computed with the exact shift-and-add tap order of `ops/filters.py`,
     so results match the XLA ops to float-associativity noise;
  4. outputs are the NMS-masked score map and the m10/m01 moment maps.
     arctan2 is not lowerable in Mosaic, so orientation stays as moments —
     downstream samples them at keypoints and applies atan2 there (nearest
     sampling commutes with elementwise atan2, so parity is exact).

Parity: `pytorch_model/detector/shi_tomasi.py:66-112`,
`pytorch_model/orientation/angle_estimation.py:123-172`,
`pytorch_model/utils/keypoint_utils.py:12-44`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.filters import gaussian_taps

_STRIPE = 48


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift2(v, dr, dc):
    """out[r, c] = v[r + dr, c + dc], cyclic (pltpu.roll; the frame pad
    absorbs the wraparound pollution — see the kernel docstring).

    All intermediates keep the FULL frame shape with zero lane/sublane
    offsets: Mosaic rejects concatenation (jnp.pad) of offset slices
    ("result/input offset mismatch on non-concat dimension"), so the kernel
    never shrinks arrays with valid-conv slicing.
    """
    fh, fw = v.shape
    if dr:
        v = pltpu.roll(v, (-dr) % fh, axis=0)
    if dc:
        v = pltpu.roll(v, (-dc) % fw, axis=1)
    return v


def _conv_same(v, taps, axis):
    """'Same'-centered cross-correlation along ``axis`` with static taps
    (tap order and zero-tap skipping match ops/filters.conv1d_h/_w)."""
    half = len(taps) // 2
    acc = None
    for t in range(len(taps)):
        if taps[t] == 0.0:
            continue
        d = t - half
        sh = _shift2(v, d, 0) if axis == 0 else _shift2(v, 0, d)
        term = taps[t] * sh
        acc = term if acc is None else acc + term
    return acc


def _maxpool_same(v, radius):
    """(2r+1)^2 window max, rows then cols (order immaterial for max)."""
    acc = v
    for d in range(-radius, radius + 1):
        if d:
            acc = jnp.maximum(acc, _shift2(v, d, 0))
    out = acc
    for d in range(-radius, radius + 1):
        if d:
            out = jnp.maximum(out, _shift2(acc, 0, d))
    return out


def _detect_kernel(
    image_ref,            # (B*rows_total, cols_total) HBM (ANY)
    score_ref,            # (1, STRIPE, cols_total) VMEM out: NMS-masked score
    m10_ref, m01_ref,     # (1, STRIPE, cols_total) VMEM out (with_angle only)
    img_vmem,             # (rows_total, cols_total) VMEM resident image
    sem,
    *,
    n_stripes: int,
    rows_total: int,
    h: int,
    w: int,
    pad: int,
    block_size: int,
    patch_size: int,
    sigma: float,
    nms_radius: int,
    with_angle: bool,
):
    i = pl.program_id(0)
    cols_total = img_vmem.shape[1]
    frame_h = _STRIPE + 2 * pad

    @pl.when(jax.lax.rem(i, n_stripes) == 0)
    def _():
        b = i // n_stripes
        cp = pltpu.make_async_copy(
            image_ref.at[pl.ds(pl.multiple_of(b * rows_total, 8), rows_total),
                         :],
            img_vmem, sem)
        cp.start()
        cp.wait()

    s = jax.lax.rem(i, n_stripes)
    r0 = s * _STRIPE                       # first output (global) row
    frame = img_vmem[pl.ds(pl.multiple_of(r0, 8), frame_h), :]
    # frame row r  <->  global row r0 - pad + r
    # frame col c  <->  global col c - pad
    # Every intermediate below keeps this exact frame geometry (cyclic-shift
    # 'same' convs) — positions never move, and the cyclic wraparound only
    # pollutes the outermost (halo_total - 1) frame rows/cols, which the
    # pad (= 2 * halo) keeps clear of both the outputs and their halos.

    row_g = (jax.lax.broadcasted_iota(jnp.int32, (frame_h, 1), 0)
             + (r0 - pad))                 # global row per frame row
    col_g = (jax.lax.broadcasted_iota(jnp.int32, (1, cols_total), 1) - pad)
    valid_c = (col_g >= 0) & (col_g < w)   # (1, cols_total), static content
    valid_r = (row_g >= 0) & (row_g < h)
    valid_rc = valid_r & valid_c

    # ---- Shi-Tomasi score (replicate-pad semantics from the XLA edge pad) --
    smooth = (1.0, 2.0, 1.0)
    diff = (-1.0, 0.0, 1.0)
    ix = _conv_same(_conv_same(frame, smooth, 0), diff, 1)
    iy = _conv_same(_conv_same(frame, diff, 0), smooth, 1)

    ones = (1.0,) * block_size

    def bsum(v):
        return _conv_same(_conv_same(v, ones, 0), ones, 1)

    # The reference replicate-pads the PRODUCT maps before box-summing
    # (`shi_tomasi.py:66-112` box conv over F.pad(products, 'replicate')),
    # which is NOT the same at the border as products of the replicated
    # image. Clamp out-of-image product values to the border row/column.
    c_lo = pad                             # frame col of global col 0
    c_hi = pad + w - 1                     # frame col of global col w-1
    r_lo = jnp.clip(pad - r0, 0, frame_h - 1)          # frame row of row 0
    r_hi = jnp.clip(h - 1 + pad - r0, 0, frame_h - 1)  # frame row of row h-1
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (frame_h, 1), 0)

    def row_pick(v, idx):
        # Dynamic row broadcast via one-hot masked reduce (Mosaic has no
        # dynamic_slice on values; this is one cheap full-frame reduce).
        sel = (row_iota == idx).astype(jnp.float32)
        return (v * sel).sum(axis=0, keepdims=True)

    def border_fix(v):
        v = jnp.where(col_g < 0, v[:, c_lo:c_lo + 1], v)
        v = jnp.where(col_g > w - 1, v[:, c_hi:c_hi + 1], v)
        v = jnp.where(row_g < 0, row_pick(v, r_lo), v)
        v = jnp.where(row_g > h - 1, row_pick(v, r_hi), v)
        return v

    sxx = bsum(border_fix(ix * ix))
    syy = bsum(border_fix(iy * iy))
    sxy = bsum(border_fix(ix * iy))
    half_trace = (sxx + syy) * 0.5
    diff_half = (sxx - syy) * 0.5
    disc = diff_half * diff_half + sxy * sxy
    score = jnp.maximum(half_trace - jnp.sqrt(disc + 1e-10), 0.0)

    # ---- NMS keep mask: max-pool with -inf outside the image ---------------
    score_inf = jnp.where(valid_rc, score, -jnp.inf)
    local_max = _maxpool_same(score_inf, nms_radius)
    keep = score >= local_max - 1e-7
    masked = score * keep.astype(jnp.float32)
    masked = masked * valid_rc.astype(jnp.float32)

    # Align frame coords to output coords (global (r0, 0) -> (0, 0)) with one
    # cyclic shift, zero the wrapped / out-of-image lanes (output col c holds
    # global col c; anything >= w is wrap or pad), and write the offset-free
    # stripe.
    out_col_valid = (jax.lax.broadcasted_iota(jnp.int32, (1, cols_total), 1)
                     < w).astype(jnp.float32)

    def emit(ref, v):
        aligned = _shift2(v, pad, pad) * out_col_valid
        ref[0, :, :] = aligned[0:_STRIPE, :]

    emit(score_ref, masked)

    # ---- Gaussian-weighted moments (zero-pad semantics via validity mask) --
    if with_angle:
        half = patch_size // 2
        g = tuple(float(v) for v in gaussian_taps(sigma, patch_size))
        t = np.arange(-half, half + 1, dtype=np.float32)
        tg = tuple(float(v) for v in
                   (t * np.asarray(g, dtype=np.float32)))
        xz = frame * valid_rc.astype(jnp.float32)
        m10 = _conv_same(_conv_same(xz, g, 0), tg, 1)
        m01 = _conv_same(_conv_same(xz, tg, 0), g, 1)
        emit(m10_ref, m10)
        emit(m01_ref, m01)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "patch_size", "sigma", "nms_radius",
                     "with_angle", "interpret"))
def detect_frontend(
    image: jax.Array,              # (B, 1, H, W) f32
    block_size: int = 3,
    patch_size: int = 15,
    sigma: float = 2.5,
    nms_radius: int = 5,
    with_angle: bool = True,
    interpret: bool = False,
):
    """Fused Shi-Tomasi + NMS (+ orientation moments) in one Pallas pass.

    Returns:
        (masked_score, m10, m01) each (B, 1, H, W) — masked_score is
        ``shi_tomasi_score * nms_mask`` (exactly what select_topk_keypoints
        consumes); m10/m01 are the Gaussian-weighted moment maps whose
        per-keypoint atan2 is the orientation. m10/m01 are None when
        ``with_angle=False``.
    """
    x = image.astype(jnp.float32)[:, 0]
    b, h, w = x.shape
    pad = _round_up(max(1 + block_size // 2 + nms_radius, patch_size // 2), 8)
    hp = _round_up(h, _STRIPE)
    n_stripes = hp // _STRIPE
    rows_total = hp + 2 * pad
    cols_total = _round_up(w + 2 * pad, 128)

    # VMEM residency budget (same reasoning as the sparse sampler's): the
    # resident image plus ~a dozen live full-frame intermediates must fit
    # ~16 MB/core. Past it, fall back to the XLA composition — this is an
    # opt-in path, so the fallback just restores the default behavior.
    if rows_total * cols_total * 4 > 6 * 1024 * 1024:
        return detect_frontend_reference(image, block_size=block_size,
                                         patch_size=patch_size, sigma=sigma,
                                         nms_radius=nms_radius,
                                         with_angle=with_angle)

    xp = jnp.pad(x, ((0, 0), (pad, pad + hp - h), (pad, cols_total - w - pad)),
                 mode="edge")
    image_flat = xp.reshape(b * rows_total, cols_total)

    base_kernel = functools.partial(
        _detect_kernel, n_stripes=n_stripes, rows_total=rows_total, h=h, w=w,
        pad=pad, block_size=block_size, patch_size=patch_size, sigma=sigma,
        nms_radius=nms_radius, with_angle=with_angle)
    if with_angle:
        kernel = base_kernel
        n_out = 3
    else:
        # Only the masked-score output exists — no garbage m10/m01 buffers.
        def kernel(image_ref, score_ref, img_vmem, sem):
            return base_kernel(image_ref, score_ref, None, None, img_vmem, sem)

        n_out = 1

    out_spec = pl.BlockSpec((1, _STRIPE, cols_total), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * n_stripes, _STRIPE, cols_total),
                                     jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b * n_stripes,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((rows_total, cols_total), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ])

    outs = pl.pallas_call(
        kernel,
        out_shape=[out_shape] * n_out,
        grid_spec=grid_spec,
        interpret=interpret,
    )(image_flat)

    def fix(o):
        return o.reshape(b, hp, cols_total)[:, None, :h, :w]

    if not with_angle:
        return fix(outs[0]), None, None
    return fix(outs[0]), fix(outs[1]), fix(outs[2])


def detect_frontend_reference(image, block_size=3, patch_size=15, sigma=2.5,
                              nms_radius=5, with_angle=True):
    """jnp oracle: the exact ops composition the kernel fuses."""
    from ..ops import shi_tomasi_score, nms_maxpool
    from ..ops.filters import pad2d, conv1d_h, conv1d_w

    scores = shi_tomasi_score(image, block_size=block_size)
    mask = nms_maxpool(scores[:, 0], nms_radius)
    masked = (scores[:, 0] * mask)[:, None]
    if not with_angle:
        return masked, None, None
    x = image.astype(jnp.float32)[:, 0]
    half = patch_size // 2
    g = gaussian_taps(sigma, patch_size)
    t = np.arange(-half, half + 1, dtype=np.float32)
    tg = (t * g).astype(np.float32)
    xp = pad2d(x, half, half, mode="zero")
    m10 = conv1d_w(conv1d_h(xp, g), tg)[:, None]
    m01 = conv1d_w(conv1d_h(xp, tg), g)[:, None]
    return masked, m10, m01

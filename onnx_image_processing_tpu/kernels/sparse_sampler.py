"""Pallas TPU kernel: fused sparse BAD box-sampling.

The descriptor hot path samples S box-average values per keypoint at rotated
offsets (SURVEY.md §3.2). A pure-XLA formulation needs either random-access
gathers over the (R+1, H, W) box bank (the reference's grid_sample semantics,
`pytorch_model/descriptor/bad.py:538-551`) — the single slowest pattern on
TPU — or (B, K, S, ps) one-hot tensors in HBM. This kernel fuses the whole
stage, one keypoint tile per grid step:

  1. scalar-prefetched patch origins drive manual DMAs of T image windows
     from the replicate-padded image in HBM into VMEM. TPU DMA tiling requires
     8-aligned row origins/counts and 128-aligned column origins/counts, so
     origins are quantized (rows to 8, columns to 128) and the window is
     (psd_y=72) x (psd_x=256) for the BAD geometry — the alignment slack is
     absorbed by the in-patch sample coordinates;
  2. per-radius box banks are computed in VMEM by unrolled shift-add valid
     convolutions (VPU);
  3. sampling contracts the column axis on the MXU — dot(ohx, bank^T) with
     one-hot (or bilinear two-hot) column weights — then applies the row
     weights as a masked reduction. The one-hot matrices exist only in VMEM.

HBM traffic: image windows + local coordinates + outputs (~90 MB at B=2,
K=512, S=1024) versus ~600 MB for the XLA one-hot formulation, and no gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dma_geometry(ps: int, r_max: int):
    """(psd_y, psd_x, bank_w): DMA window and valid bank width.

    psd_y covers the ps + 2*r_max rows (8-aligned origin adds <= 7 slack).
    psd_x covers up to 127 columns of 128-alignment slack plus the ps-wide
    sample window plus the 2*r_max box halo.
    """
    psd_y = _round_up(ps + 2 * r_max, 8)
    psd_x = _round_up(127 + ps + 2 * r_max, 128)
    return psd_y, psd_x, psd_x - 2 * r_max


def _sample_kernel(
    # scalar prefetch
    start_y_ref, start_x_ref,
    # inputs
    image_ref,       # (B, Hp, Wp) HBM (ANY)
    ly_ref, lx_ref,  # (T, S) VMEM block
    # output
    out_ref,         # (T, S) VMEM block
    # scratch
    patch_ref,       # (2, T, psd_y, psd_x) VMEM (double-buffered)
    sem,             # DMA semaphores (2, T)
    *,
    tile: int,
    n_kpts: int,
    ps: int,
    r_max: int,
    groups: tuple,   # ((radius, lo, hi), ...) contiguous over the S axis
    bilinear: bool,
    integer_exact: bool,
):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    psd_y, psd_x = patch_ref.shape[-2], patch_ref.shape[-1]
    psi = ps + 2 * r_max

    # Double-buffered patch DMA: while computing on this step's patches (slot
    # i%2), the next step's patches stream into the other slot. Row origins
    # are pre-quantized to 8 (ops/bad.py); column origins are floored to 128
    # in-kernel and the residual is fixed with a dynamic lane roll.
    def issue_dmas(step, slot):
        for t in range(tile):
            k_global = step * tile + t
            b = k_global // n_kpts
            sy = pl.multiple_of(start_y_ref[k_global], 8)
            sx = pl.multiple_of((start_x_ref[k_global] // 128) * 128, 128)
            pltpu.make_async_copy(
                image_ref.at[b, pl.ds(sy, psd_y), pl.ds(sx, psd_x)],
                patch_ref.at[slot, t],
                sem.at[slot, t],
            ).start()

    @pl.when(i == 0)
    def _():
        issue_dmas(0, 0)

    @pl.when(i + 1 < n_steps)
    def _():
        issue_dmas(i + 1, (i + 1) % 2)

    slot = i % 2
    fines = []
    for t in range(tile):
        k_global = i * tile + t
        b = k_global // n_kpts
        sy = pl.multiple_of(start_y_ref[k_global], 8)
        sxf = start_x_ref[k_global]
        sx = pl.multiple_of((sxf // 128) * 128, 128)
        fines.append(sxf - sx)  # lane misalignment in [0, 128)
        # Wait for this step's copy of patch t (matches the start() above).
        pltpu.make_async_copy(
            image_ref.at[b, pl.ds(sy, psd_y), pl.ds(sx, psd_x)],
            patch_ref.at[slot, t],
            sem.at[slot, t],
        ).wait()

    s = ly_ref.shape[-1]
    n_groups = len(groups)
    n_i = psi + 1  # integral-image side

    # Per-sample radius, built in-kernel from the static group table (Pallas
    # kernels cannot capture host array constants).
    sample_row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    rad = jnp.zeros((s, 1), jnp.float32)
    for (r, lo, hi) in groups:
        rad = jnp.where((sample_row >= lo) & (sample_row < hi), float(r), rad)
    inv_area = 1.0 / (2.0 * rad + 1.0) ** 2

    grid_i = jax.lax.broadcasted_iota(jnp.int32, (n_i, s), 0).astype(jnp.float32)
    rad_t = rad.reshape(1, s)
    inv_area_t = inv_area.reshape(1, s)

    def corner_weights(local_t, scale):
        """Transposed integral-corner difference columns: box sum over
        [c+R-r, c+R+r] = e[c+R+r+1] - e[c+R-r] on the integral. Bilinear mode
        folds the two interpolation taps into the same column (separable in y
        and x, weights sum to 1)."""
        row = local_t[None, :]
        if not bilinear:
            c = jnp.round(row)
            w = ((grid_i == c + (r_max + rad_t + 1.0)).astype(jnp.float32)
                 - (grid_i == c + (r_max - rad_t)).astype(jnp.float32))
            return w * scale if scale is not None else w
        c0 = jnp.clip(jnp.floor(row), 0.0, float(ps - 1))
        c1 = jnp.clip(c0 + 1.0, 0.0, float(ps - 1))
        frac = row - jnp.floor(row)
        w = jnp.zeros_like(grid_i)
        for c, wgt in ((c0, 1.0 - frac), (c1, frac)):
            w = w + wgt * ((grid_i == c + (r_max + rad_t + 1.0)).astype(jnp.float32)
                           - (grid_i == c + (r_max - rad_t)).astype(jnp.float32))
        return w * scale if scale is not None else w

    def cumsum_doubling(x, axis):
        """Exact f32 inclusive cumsum via log2 shifted adds (VPU, no MXU)."""
        size = x.shape[axis]
        sh = 1
        while sh < size:
            if axis == 1:
                shifted = jnp.concatenate(
                    [jnp.zeros((x.shape[0], sh), x.dtype), x[:, :-sh]], axis=1)
            else:
                shifted = jnp.concatenate(
                    [jnp.zeros((sh, x.shape[1]), x.dtype), x[:-sh, :]], axis=0)
            x = x + shifted
            sh *= 2
        return x

    ly = ly_ref[:]
    lx = lx_ref[:]

    for t in range(tile):
        # Undo the lane misalignment: rotate left by `fine` so column 0 is the
        # true (unaligned) window origin, then keep the narrow psi columns.
        # (shift must stay in [0, psd_x) — fine == 0 would give a full-width
        # rotation otherwise.)
        shift = jax.lax.rem(psd_x - fines[t], psd_x)
        rolled = pltpu.roll(patch_ref[slot, t], shift, axis=1)
        patch = rolled[:psi, :psi]   # (psi, psi)

        # Centered integral image, exact-f32 doubling cumsums on the VPU
        # (centering keeps |I| ~ sqrt(area)*128, preserving f32 box means to
        # ~2e-4; uncentered would cost ~1.5e-2).
        centered = patch - 127.5
        cc = cumsum_doubling(cumsum_doubling(centered, 1), 0)   # (psi, psi)
        integ = jnp.pad(cc, ((1, 0), (1, 0)))                   # (psi+1, psi+1)

        # Integral quadratic form: every box sample is ohyC^T I ohxC with
        # corner-difference columns — no per-radius banks, one contraction per
        # keypoint, oriented (psi+1, psi+1) @ (psi+1, S) so N fills MXU tiles.
        # The integral's magnitude (up to ~5e3) exceeds what Mosaic matmuls
        # preserve (default truncates operands to bf16; HIGHEST still loses
        # low bits at this scale), so I is split manually into three bf16
        # planes. In nearest mode the x-corner columns are +/-1 (bf16-exact),
        # so f32 selection is reconstructed to ~3e-4 abs; in bilinear mode the
        # columns carry fractional interpolation weights and are also split
        # (bf16 head + residual, ~2e-3 abs). All planes are packed along the
        # CONTRACTION axis into a single matmul — sum-of-plane-products is one
        # accumulation, and K = 3*(psi+1) [6*(psi+1) bilinear] rounds to fewer
        # 128-wide MXU tiles than separate per-plane matmuls (213 -> 2 tiles
        # vs 3x1, a 33% MXU-pass saving) with one dispatch instead of 3 (6).
        # The y-corner weights and the 1/area scale are applied in the exact
        # f32 epilogue.
        ohy_c = corner_weights(ly[t], None)          # (psi+1, S)
        ohx_c = corner_weights(lx[t], None)          # (psi+1, S)

        if integer_exact and not bilinear:
            # Integer-image exact path: pixel values are integers (uint8-
            # derived), so 2*centered is an exact integer and the integral
            # fits 21 bits (<= 2 * psi^2 * 127.5 ~ 1.25M). Decompose into
            # three signed base-256 digit planes and contract against int8
            # +/-1 corner columns with int32 accumulation — box sums are
            # EXACT (the bf16x3 split is ~3e-5). Digit planes stack along M
            # (scales differ per plane, so K-packing can't fold them); the
            # 65536/256 recombination runs in the f32 epilogue. Measured ~15%
            # slower than the bf16x3 path on v5e (Mosaic does not hit the 2x
            # int8 MXU rate at these shapes), so this is an opt-in exactness
            # mode, not the default.
            vi = jnp.round(2.0 * cc).astype(jnp.int32)
            vi = jnp.pad(vi, ((1, 0), (1, 0)))
            d0 = ((vi + 128) % 256) - 128
            rem = (vi - d0) // 256
            d1 = ((rem + 128) % 256) - 128
            d2 = (rem - d1) // 256                  # |d2| <= ~39
            m_cat = jnp.concatenate(
                [d2.astype(jnp.int8), d1.astype(jnp.int8),
                 d0.astype(jnp.int8)], axis=0)      # (3*n_i, n_i)
            ohx_i8 = ohx_c.astype(jnp.int8)
            rows3 = jax.lax.dot_general(
                m_cat, ohx_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)   # (3*n_i, S)
            rows_i = (rows3[:n_i] * 65536 + rows3[n_i:2 * n_i] * 256
                      + rows3[2 * n_i:])
            rows = rows_i.astype(jnp.float32) * 0.5
            box_sum = (rows * ohy_c).sum(axis=0)
            out_ref[t, :] = box_sum * inv_area[:, 0] + 127.5
            continue

        i1 = integ.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = integ - i1
        i2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        i3 = r1 - i2
        if bilinear:
            x_hi = ohx_c.astype(jnp.bfloat16).astype(jnp.float32)
            x_lo = ohx_c - x_hi
            # The i3*x_lo cross term is dropped: |i3| <= |I|*2^-18 (~0.02) and
            # |x_lo| <= 2^-9, so its box-sum contribution is <= ~1e-4 — two
            # orders below the bilinear path's 2e-3 accuracy — and skipping it
            # packs K = 5*(psi+1) = 355 -> 3 128-wide K-tiles instead of 4.
            i_cat = jnp.concatenate([i1, i2, i3, i1, i2], axis=1)
            x_cat = jnp.concatenate([x_hi, x_hi, x_hi, x_lo, x_lo], axis=0)
        else:
            i_cat = jnp.concatenate([i1, i2, i3], axis=1)   # (n_i, 3*n_i)
            x_cat = jnp.concatenate([ohx_c] * 3, axis=0)    # (3*n_i, S)
        rows = jnp.dot(i_cat, x_cat, preferred_element_type=jnp.float32)
        box_sum = (rows * ohy_c).sum(axis=0)         # (S,)
        out_ref[t, :] = box_sum * inv_area[:, 0] + 127.5


@functools.partial(
    jax.jit,
    static_argnames=("ps", "r_max", "groups", "bilinear", "tile", "interpret",
                     "integer_exact"))
def sparse_box_sample(
    image_padded: jax.Array,   # (B, H + 2*r_max, W + 2*r_max) f32
    start_y: jax.Array,        # (B, K) int32, multiples of 8 (unpadded coords)
    start_x: jax.Array,        # (B, K) int32, arbitrary (aligned in-kernel)
    ly: jax.Array,             # (B, K, S) f32 in-window sample coords
    lx: jax.Array,
    ps: int,
    r_max: int,
    groups: tuple,             # ((radius, lo, hi), ...) static, contiguous on S
    bilinear: bool = False,
    tile: int = 8,
    interpret: bool = False,
    integer_exact: bool = False,
) -> jax.Array:
    """Sample per-keypoint box averages; returns (B, K, S).

    ``groups`` assigns each contiguous slice [lo, hi) of the sample axis to a
    box radius. Window origins index the *unpadded* image; the r_max halo of
    the padded input supplies the replicate border for every box window.
    ``ly`` is relative to start_y (in [0, ps)); ``lx`` relative to start_x
    (in [0, bank_w)).
    """
    b, k, s = ly.shape
    if (b * k) % tile != 0:
        raise ValueError(f"B*K={b * k} must be divisible by tile={tile}")
    psd_y, psd_x, _ = dma_geometry(ps, r_max)

    # Grow the image so the largest aligned origin + window stays in bounds.
    hp, wp = image_padded.shape[-2:]
    h = hp - 2 * r_max
    w = wp - 2 * r_max
    extra_y = max(0, ((h - ps) // 8 * 8) + psd_y - hp)
    extra_x = max(0, ((w - ps) // 128 * 128) + psd_x - wp)
    if extra_y or extra_x:
        image_padded = jnp.pad(image_padded,
                               ((0, 0), (0, extra_y), (0, extra_x)),
                               mode="edge")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((b * k) // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tile, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, s), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile, psd_y, psd_x), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2, tile)),
        ],
    )

    kernel = functools.partial(
        _sample_kernel, tile=tile, n_kpts=k, ps=ps, r_max=r_max,
        groups=groups, bilinear=bilinear, integer_exact=integer_exact)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * k, s), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start_y.reshape(-1), start_x.reshape(-1), image_padded,
      ly.reshape(b * k, s), lx.reshape(b * k, s))
    return out.reshape(b, k, s)


def reference_box_sample(image_padded, start_y, start_x, ly, lx, ps, r_max,
                         groups, bilinear=False):
    """jnp oracle for the kernel (same contract), used on CPU and by
    interpret-mode tests. Extracts the narrow (psi x psi) windows directly
    (dynamic_slice takes arbitrary origins — the alignment constraints are
    DMA-specific)."""
    b, k, s = ly.shape
    psi = ps + 2 * r_max

    def one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0), (psi, psi))

    patches = jax.vmap(jax.vmap(one, (None, 0, 0)))(image_padded, start_y, start_x)

    grid = jnp.arange(ps, dtype=jnp.float32)

    def weights(local):
        col = local[..., None]
        if not bilinear:
            return (grid == jnp.round(col)).astype(jnp.float32)
        lo = jnp.clip(jnp.floor(col), 0.0, ps - 1.0)
        hi = jnp.clip(lo + 1.0, 0.0, ps - 1.0)
        frac = col - jnp.floor(col)
        return ((grid == lo) * (1.0 - frac) + (grid == hi) * frac).astype(jnp.float32)

    ohy = weights(ly)
    ohx = weights(lx)
    out = jnp.zeros((b, k, s), jnp.float32)
    for (r, lo, hi) in groups:
        m = r_max - r
        side = ps + 2 * r
        sub = patches[:, :, m:m + side, m:m + side]
        acc = sub[..., :, 0:ps]
        for dx in range(1, 2 * r + 1):
            acc = acc + sub[..., :, dx:dx + ps]
        bank = acc[..., 0:ps, :]
        for dy in range(1, 2 * r + 1):
            bank = bank + acc[..., dy:dy + ps, :]
        if r > 0:
            bank = bank / float((2 * r + 1) ** 2)
        # HIGHEST precision: XLA's default TPU matmul truncates f32 operands
        # to bf16 (~0.5 abs error on [0, 255] box means).
        rows = jnp.einsum("bkpy,bkyx->bkpx", ohy[:, :, lo:hi], bank,
                          precision=jax.lax.Precision.HIGHEST)
        out = out.at[:, :, lo:hi].set((rows * ohx[:, :, lo:hi]).sum(-1))
    return out

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
  2. sampling contracts the patch column axis on the MXU — a direct
     box-mask quadratic form ymask^T X xmask with interval-indicator columns
     (ones over each box footprint) and a manual bf16x3 split of the patch
     operand — then applies the row masks as an exact f32 reduction. The
     mask matrices exist only in VMEM.

HBM traffic: image windows + local coordinates + outputs (~80 MB at B=2,
K=512, S=805) versus ~600 MB for the XLA one-hot formulation, and no gathers.
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


def _make_tile_compute(s, ps, r_max, groups, bilinear, integer_exact):
    """Builds the per-keypoint compute: (psi, psi) patch -> (S,) box means.

    Shared by the windowed-DMA and VMEM-resident kernels below.
    """
    psi = ps + 2 * r_max

    # Per-sample radius, built in-kernel from the static group table (Pallas
    # kernels cannot capture host array constants).
    sample_row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    rad = jnp.zeros((s, 1), jnp.float32)
    for (r, lo, hi) in groups:
        rad = jnp.where((sample_row >= lo) & (sample_row < hi), float(r), rad)
    inv_area = 1.0 / (2.0 * rad + 1.0) ** 2

    grid_i = jax.lax.broadcasted_iota(jnp.int32, (psi, s), 0).astype(jnp.float32)
    rad_t = rad.reshape(1, s)

    def interval_weights(local_t):
        """Box-membership mask columns over the patch axis: ones on
        [c+R-r, c+R+r] (the box footprint in halo'd patch coordinates).
        This is the integral quadratic form pushed through the cumsum:
        (e[c+R+r+1] - e[c+R-r]) on I = L X L^T equals an interval indicator
        on the raw patch X — identical box sums, no integral build at all.
        Bilinear mode sums the two interpolation taps' intervals (a flat-top
        profile with fractional ends; weights sum to 1, separable in y/x)."""
        row = local_t[None, :]
        if not bilinear:
            c = jnp.round(row)
            return ((grid_i >= c + (r_max - rad_t))
                    & (grid_i <= c + (r_max + rad_t))).astype(jnp.float32)
        c0 = jnp.clip(jnp.floor(row), 0.0, float(ps - 1))
        c1 = jnp.clip(c0 + 1.0, 0.0, float(ps - 1))
        frac = row - jnp.floor(row)
        w = jnp.zeros_like(grid_i)
        for c, wgt in ((c0, 1.0 - frac), (c1, frac)):
            w = w + wgt * ((grid_i >= c + (r_max - rad_t))
                           & (grid_i <= c + (r_max + rad_t))).astype(jnp.float32)
        return w

    def compute(patch, ly_t, lx_t):
        # Centering by 127.5 keeps the operand-split planes balanced around
        # zero and the epilogue re-adds it exactly.
        centered = patch - 127.5

        # Direct box-mask quadratic form: every box sample is ymask^T X xmask
        # with interval-indicator columns — one contraction per keypoint,
        # oriented (psi, K) @ (K, S) so N = S fills MXU tiles. (An earlier
        # design built a centered integral image per patch and contracted
        # corner-difference one-hots against it; the interval form computes
        # identical sums from the raw patch and saves the per-keypoint cumsum
        # — ~34% of kernel time — while shrinking operand magnitude from ~5e3
        # to <=127.5.) Mosaic matmuls truncate f32 operands to bf16, so X is
        # split into three bf16 planes (~2^-24 relative, f32-equivalent). In
        # nearest mode the xmask entries are 0/1 (bf16-exact); in bilinear
        # mode they carry fractional interpolation weights and are split too
        # (bf16 head + residual; the X3*x_lo cross term is dropped — its
        # contribution is <= |X|*2^-16*2^-9, far below the mode's 2e-3
        # accuracy). All planes pack along the CONTRACTION axis into a single
        # matmul — sum-of-plane-products is one accumulation, and K = 3*psi
        # = 210 (5*psi = 350 bilinear) rounds to fewer 128-wide K-tiles than
        # per-plane matmuls, with one dispatch. The y-interval weights and
        # the 1/area scale are applied in the exact f32 epilogue.
        ohy_c = interval_weights(ly_t)          # (psi, S)
        ohx_c = interval_weights(lx_t)          # (psi, S)

        if integer_exact and not bilinear:
            # Integer-image exact path: pixel values are integers (uint8-
            # derived), so 2*centered = 2*pixel - 255 is an exact odd integer
            # in [-255, 255]. Decompose into two signed base-256 digit planes
            # (d1 in {-1, 0, 1}) stacked along M and contract against int8
            # 0/1 interval columns with int32 accumulation — box sums are
            # EXACT (the bf16x3 split is ~1e-5). The 256 recombination and
            # 0.5 rescale run in the f32 epilogue. Opt-in exactness mode;
            # A/B'd at production shapes (round 5, benchmarks/
            # int8_sampler_ab.py): 10-35% SLOWER than bf16x3 everywhere —
            # the K=70 contraction fills half a K-tile and the digit
            # decomposition is VPU-bound — with bit-identical outputs, so
            # it stays opt-in (docs/KERNELS.md decision table).
            vi = jnp.round(2.0 * centered).astype(jnp.int32)
            d0 = ((vi + 128) % 256) - 128
            d1 = (vi - d0) // 256                   # in {-1, 0, 1}
            m_cat = jnp.concatenate(
                [d1.astype(jnp.int8), d0.astype(jnp.int8)], axis=0)  # (2*psi, psi)
            ohx_i8 = ohx_c.astype(jnp.int8)
            rows2 = jax.lax.dot_general(
                m_cat, ohx_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)   # (2*psi, S)
            rows = (rows2[:psi] * 256 + rows2[psi:]).astype(jnp.float32) * 0.5
            box_sum = (rows * ohy_c).sum(axis=0)
            return box_sum * inv_area[:, 0] + 127.5

        x1 = centered.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = centered - x1
        x2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        x3 = r1 - x2
        if bilinear:
            m_hi = ohx_c.astype(jnp.bfloat16).astype(jnp.float32)
            m_lo = ohx_c - m_hi
            i_cat = jnp.concatenate([x1, x2, x3, x1, x2], axis=1)
            x_cat = jnp.concatenate([m_hi, m_hi, m_hi, m_lo, m_lo], axis=0)
        else:
            i_cat = jnp.concatenate([x1, x2, x3], axis=1)   # (psi, 3*psi)
            x_cat = jnp.concatenate([ohx_c] * 3, axis=0)    # (3*psi, S)
        rows = jnp.dot(i_cat, x_cat, preferred_element_type=jnp.float32)
        box_sum = (rows * ohy_c).sum(axis=0)         # (S,)
        return box_sum * inv_area[:, 0] + 127.5

    return compute


def _origin(start_y_ref, start_x_ref, k_global, n_kpts, hp):
    """Aligned window origin on the (B*Hp, Wp) row-flattened image: row start
    (batch base + 8-quantized y), 128-floored column start, and the lane
    misalignment residual."""
    b = k_global // n_kpts
    sy = pl.multiple_of(b * hp + start_y_ref[k_global], 8)
    sxf = start_x_ref[k_global]
    sx = pl.multiple_of((sxf // 128) * 128, 128)
    return sy, sx, sxf - sx


def _sample_kernel(
    # scalar prefetch
    start_y_ref, start_x_ref,
    # inputs
    image_ref,       # (B*Hp, Wp) HBM (ANY), rows flattened batch-major
    ly_ref, lx_ref,  # (T, S) VMEM block
    # output
    out_ref,         # (T, S) VMEM block
    # scratch
    patch_ref,       # (2, T, psd_y, psd_x) VMEM (double-buffered)
    sem,             # DMA semaphores (2, T)
    *,
    tile: int,
    n_kpts: int,
    hp: int,
    ps: int,
    r_max: int,
    groups: tuple,   # ((radius, lo, hi), ...) contiguous over the S axis
    bilinear: bool,
    integer_exact: bool,
):
    """Windowed-DMA path: per-keypoint image windows are DMA'd from HBM,
    double-buffered across grid steps (used when the image exceeds the VMEM
    residency budget). Row origins are pre-quantized to 8 (ops/bad.py);
    column origins are floored to 128 in-kernel and the residual is fixed
    with a dynamic lane roll."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    psd_y, psd_x = patch_ref.shape[-2], patch_ref.shape[-1]
    psi = ps + 2 * r_max

    def issue_dmas(step, slot):
        for t in range(tile):
            sy, sx, _ = _origin(start_y_ref, start_x_ref, step * tile + t,
                                n_kpts, hp)
            pltpu.make_async_copy(
                image_ref.at[pl.ds(sy, psd_y), pl.ds(sx, psd_x)],
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
        sy, sx, fine = _origin(start_y_ref, start_x_ref, i * tile + t,
                               n_kpts, hp)
        fines.append(fine)  # lane misalignment in [0, 128)
        # Wait for this step's copy of patch t (matches the start() above).
        pltpu.make_async_copy(
            image_ref.at[pl.ds(sy, psd_y), pl.ds(sx, psd_x)],
            patch_ref.at[slot, t],
            sem.at[slot, t],
        ).wait()

    compute = _make_tile_compute(ly_ref.shape[-1], ps, r_max, groups,
                                 bilinear, integer_exact)
    ly = ly_ref[:]
    lx = lx_ref[:]
    for t in range(tile):
        # Undo the lane misalignment: rotate left by `fine` so column 0 is the
        # true (unaligned) window origin, then keep the narrow psi columns.
        # (shift must stay in [0, psd_x) — fine == 0 would give a full-width
        # rotation otherwise.)
        shift = jax.lax.rem(psd_x - fines[t], psd_x)
        rolled = pltpu.roll(patch_ref[slot, t], shift, axis=1)
        out_ref[t, :] = compute(rolled[:psi, :psi], ly[t], lx[t])


def _sample_kernel_resident(
    # scalar prefetch
    start_y_ref, start_x_ref,
    # inputs
    image_ref,       # (B*Hp, Wp) HBM (ANY), rows flattened batch-major
    ly_ref, lx_ref,  # (T, S) VMEM block
    # output
    out_ref,         # (T, S) VMEM block
    # scratch
    img_vmem,        # (Hp, Wp) VMEM — ONE image, resident across its steps
    sem,             # single DMA semaphore
    *,
    tile: int,
    n_kpts: int,
    hp: int,
    psd_y: int,
    psd_x: int,
    ps: int,
    r_max: int,
    groups: tuple,
    bilinear: bool,
    integer_exact: bool,
):
    """Per-image VMEM-resident path: keypoints are image-major on the grid,
    so each image (a 480x640 frame is ~1.5 MB — trivially VMEM-resident) is
    DMA'd ONCE when its keypoint range begins, then every keypoint window is
    sliced straight out of VMEM. Eliminates the per-keypoint window DMAs
    (~75 MB/frame of HBM reads at the flagship shape: overlapping 72x256
    windows re-fetch each pixel ~25x) and all double-buffer synchronization
    at constant VMEM for any batch size; TPU grid steps run sequentially, so
    later steps of the image see the completed copy. (A whole-batch-resident
    variant measured SLOWER at B=4 images — 6 MB of resident VMEM thrashes
    the working set — hence per-image.)"""
    i = pl.program_id(0)
    psi = ps + 2 * r_max
    steps_per_image = n_kpts // tile   # wrapper guarantees divisibility

    @pl.when(i % steps_per_image == 0)
    def _():
        b = (i * tile) // n_kpts
        cp = pltpu.make_async_copy(
            image_ref.at[pl.ds(pl.multiple_of(b * hp, 8), hp), :],
            img_vmem, sem)
        cp.start()
        cp.wait()

    compute = _make_tile_compute(ly_ref.shape[-1], ps, r_max, groups,
                                 bilinear, integer_exact)
    ly = ly_ref[:]
    lx = lx_ref[:]
    for t in range(tile):
        k_global = i * tile + t
        # In-image origin: no batch row offset — img_vmem holds this image.
        sy = pl.multiple_of(start_y_ref[k_global], 8)
        sxf = start_x_ref[k_global]
        sx = pl.multiple_of((sxf // 128) * 128, 128)
        fine = sxf - sx
        window = img_vmem[pl.ds(sy, psd_y), pl.ds(sx, psd_x)]
        # Same lane-misalignment fix as the windowed path.
        shift = jax.lax.rem(psd_x - fine, psd_x)
        rolled = pltpu.roll(window, shift, axis=1)
        out_ref[t, :] = compute(rolled[:psi, :psi], ly[t], lx[t])


# Per-image VMEM residency budget. v5e VMEM is ~16 MB/core; the resident
# path needs one image plus the (tile, S) coordinate/output blocks and the
# matmul working set, so cap the image itself well below the total. A 480x640
# f32 frame (~1.5 MB) is far under this; 4K-class inputs fall back to
# windowed DMA.
_VMEM_RESIDENT_MAX_BYTES = 4 * 1024 * 1024


# NOTE (round-4 negative result): folding vmap's pair axis into this
# kernel's native batch/grid via jax.custom_batching.custom_vmap — the trick
# that pays for the select frontend — was implemented and measured SLOWER
# here (B=12 flagship: one fused 2,740 us call + a 112 us layout-transposing
# copy on the padded image operand vs 12 sequential 222 us calls + 146 us of
# loop/slice overhead; e2e 0.504 -> 0.547 ms/pair). The per-pair calls
# already amortize their DMA inside the grid, and XLA's layout choice for
# the folded 24-image edge-pad fusion forces the extra copy. Left unfolded
# on purpose; see docs/KERNELS.md.
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

    # Grow the image so the largest aligned origin + window stays in bounds,
    # then round rows to 8 and columns to 128 so batch-flattened row origins
    # stay 8-aligned and whole-row DMAs stay 128-aligned.
    hp, wp = image_padded.shape[-2:]
    h = hp - 2 * r_max
    w = wp - 2 * r_max
    hp2 = _round_up(max(hp, ((h - ps) // 8 * 8) + psd_y), 8)
    wp2 = _round_up(max(wp, ((w - ps) // 128 * 128) + psd_x), 128)
    if (hp2, wp2) != (hp, wp):
        image_padded = jnp.pad(image_padded,
                               ((0, 0), (0, hp2 - hp), (0, wp2 - wp)),
                               mode="edge")
    image_flat = image_padded.reshape(b * hp2, wp2)

    resident = hp2 * wp2 * 4 <= _VMEM_RESIDENT_MAX_BYTES and k % tile == 0
    if resident:
        kernel = functools.partial(
            _sample_kernel_resident, tile=tile, n_kpts=k, hp=hp2,
            psd_y=psd_y, psd_x=psd_x, ps=ps, r_max=r_max, groups=groups,
            bilinear=bilinear, integer_exact=integer_exact)
        scratch_shapes = [
            pltpu.VMEM((hp2, wp2), jnp.float32),   # one resident image
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = functools.partial(
            _sample_kernel, tile=tile, n_kpts=k, hp=hp2, ps=ps, r_max=r_max,
            groups=groups, bilinear=bilinear, integer_exact=integer_exact)
        scratch_shapes = [
            pltpu.VMEM((2, tile, psd_y, psd_x), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2, tile)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((b * k) // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, s), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * k, s), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start_y.reshape(-1), start_x.reshape(-1), image_flat,
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

"""Ablation harness for the sparse-BAD Pallas kernel's internal budget.

An instrumented copy of `kernels/sparse_sampler._sample_kernel` (nearest
mode, direct box-interval-mask form, windowed-DMA data path — the resident
path differs only in where patches are read from) where each internal stage
can be skipped, timed with the differential chain protocol. Sample-axis
geometry comes from the production layout builder (`ops/bad.sample_layout`). Skipping a stage
produces WRONG outputs — the point is the time delta, which attributes the
kernel's per-frame cost to:

  roll      — the dynamic lane roll undoing DMA 128-alignment
  masks     — the iota-compare interval-mask column builds (y and x)
  matmul    — the K-packed bf16x3 MXU contraction
  epilogue  — y-mask masked reduction + 1/area scale

Historical note: before round 2's interval-mask rewrite the kernel built a
per-keypoint integral image; this harness measured that cumsum at 0.198 ms
per frame (34% of the kernel), which motivated the rewrite.

The numbers published in BASELINE.md's "kernel internal budget" come from
running this file on the TPU:  python benchmarks/ablate_sampler.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import chain_time, setup_cache
from onnx_image_processing_tpu.kernels.sparse_sampler import dma_geometry

STAGES = ("roll", "masks", "matmul", "epilogue")


def _kernel(start_y_ref, start_x_ref, image_ref, ly_ref, lx_ref, out_ref,
            patch_ref, sem, *, tile, n_kpts, ps, r_max, groups, skip):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    psd_y, psd_x = patch_ref.shape[-2], patch_ref.shape[-1]
    psi = ps + 2 * r_max

    def issue_dmas(step, slot):
        for t in range(tile):
            k_global = step * tile + t
            b = k_global // n_kpts
            sy = pl.multiple_of(start_y_ref[k_global], 8)
            sx = pl.multiple_of((start_x_ref[k_global] // 128) * 128, 128)
            pltpu.make_async_copy(
                image_ref.at[b, pl.ds(sy, psd_y), pl.ds(sx, psd_x)],
                patch_ref.at[slot, t], sem.at[slot, t]).start()

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
        fines.append(sxf - sx)
        pltpu.make_async_copy(
            image_ref.at[b, pl.ds(sy, psd_y), pl.ds(sx, psd_x)],
            patch_ref.at[slot, t], sem.at[slot, t]).wait()

    s = ly_ref.shape[-1]
    sample_row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    rad = jnp.zeros((s, 1), jnp.float32)
    for (r, lo, hi) in groups:
        rad = jnp.where((sample_row >= lo) & (sample_row < hi), float(r), rad)
    inv_area = 1.0 / (2.0 * rad + 1.0) ** 2
    grid_i = jax.lax.broadcasted_iota(jnp.int32, (psi, s), 0).astype(jnp.float32)
    rad_t = rad.reshape(1, s)

    def interval_weights(local_t):
        row = local_t[None, :]
        c = jnp.round(row)
        return ((grid_i >= c + (r_max - rad_t))
                & (grid_i <= c + (r_max + rad_t))).astype(jnp.float32)

    ly = ly_ref[:]
    lx = lx_ref[:]
    for t in range(tile):
        if "roll" in skip:
            patch = patch_ref[slot, t][:psi, :psi]
        else:
            shift = jax.lax.rem(psd_x - fines[t], psd_x)
            rolled = pltpu.roll(patch_ref[slot, t], shift, axis=1)
            patch = rolled[:psi, :psi]

        centered = patch - 127.5

        if "masks" in skip:
            # Static stand-in columns with the same shape class.
            ohy_c = (grid_i == rad_t).astype(jnp.float32)
            ohx_c = ohy_c
        else:
            ohy_c = interval_weights(ly[t])
            ohx_c = interval_weights(lx[t])

        if "matmul" in skip:
            rows = centered[:, :1] + ohx_c
        else:
            x1 = centered.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = centered - x1
            x2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
            x3 = r1 - x2
            i_cat = jnp.concatenate([x1, x2, x3], axis=1)
            x_cat = jnp.concatenate([ohx_c] * 3, axis=0)
            rows = jnp.dot(i_cat, x_cat, preferred_element_type=jnp.float32)

        if "epilogue" in skip:
            out_ref[t, :] = rows[0, :]
        else:
            box_sum = (rows * ohy_c).sum(axis=0)
            out_ref[t, :] = box_sum * inv_area[:, 0] + 127.5


@functools.partial(jax.jit, static_argnames=("ps", "r_max", "groups", "tile",
                                             "skip"))
def _ablated_sample(image_padded, start_y, start_x, ly, lx, ps, r_max, groups,
                    tile=8, skip=()):
    b, k, s = ly.shape
    psd_y, psd_x, _ = dma_geometry(ps, r_max)
    hp, wp = image_padded.shape[-2:]
    h, w = hp - 2 * r_max, wp - 2 * r_max
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
            pl.BlockSpec((tile, s), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, s), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile, psd_y, psd_x), jnp.float32),
            pltpu.SemaphoreType.DMA((2, tile)),
        ])
    kernel = functools.partial(_kernel, tile=tile, n_kpts=k, ps=ps,
                               r_max=r_max, groups=groups, skip=skip)
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((b * k, s),
                                                                jnp.float32),
                         grid_spec=grid_spec)(
        start_y.reshape(-1), start_x.reshape(-1), image_padded,
        ly.reshape(b * k, s), lx.reshape(b * k, s))
    return out.reshape(b, k, s)


def main():
    setup_cache()
    from onnx_image_processing_tpu.ops.bad import (_PATCH, load_bad_params,
                                                   sample_layout)

    # Flagship geometry: B=2 images, K=512 kpts, 512-pair nearest sampling.
    # Groups/S come from the SAME layout builder production uses
    # (ops/bad.sample_layout), so measured geometry can't drift from it.
    params = load_bad_params(512)
    b, k = 2, 512
    ps, r_max = _PATCH, params.max_radius
    layout = sample_layout(params)
    groups = layout.groups
    s = groups[-1][2]

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (b, 480 + 2 * r_max,
                                           640 + 2 * r_max)).astype(np.float32))
    sy = jnp.asarray((rng.integers(0, 52, (b, k)) * 8).astype(np.int32))
    sx = jnp.asarray(rng.integers(0, 560, (b, k)).astype(np.int32))
    ly = jnp.asarray(rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32))
    lx = jnp.asarray(rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32))

    def run(skip):
        def step(ly_c, lx_c):
            out = _ablated_sample(img, sy, sx, ly_c, lx_c, ps, r_max, groups,
                                  skip=skip)
            eps = out[0, 0, 0] * 1e-20
            return out.sum(), (ly_c + eps, lx_c + eps)
        return chain_time(step, (ly, lx), n=30)

    full = run(())
    print(json.dumps({"variant": "full", "ms": round(full, 4), "s_axis": s}))
    for stage in STAGES:
        ms = run((stage,))
        print(json.dumps({"variant": f"no_{stage}", "ms": round(ms, 4),
                          "attributed_ms": round(full - ms, 4)}))


if __name__ == "__main__":
    main()

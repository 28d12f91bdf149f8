"""A/B: the sparse sampler's integer-exact int8 MXU path vs the bf16x3 default.

The sparse-BAD Pallas kernel (`kernels/sparse_sampler.py`) contracts each
keypoint patch against interval-mask columns on the MXU. Two exactness
strategies exist for nearest mode (the flagship default, where masks are 0/1):

* **bf16x3** (default): split the f32 patch into three bf16 planes packed
  along the contraction axis — one f32-equivalent matmul with
  M=psi, K=3*psi, N=S.
* **integer_exact** (opt-in): decompose 2*pixel-255 into two signed base-256
  int8 digit planes stacked along M and contract against int8 0/1 masks with
  int32 accumulation — bit-exact box sums, M=2*psi, K=psi, N=S, and v5e's
  int8 MXU issue rate is 2x bf16.

On paper the int8 path has ~2/3 the MAC count at 2x the issue rate (~1/3 the
matmul floor); in practice its K=psi=70 contraction pads to one 128-lane tile
(45% wasted) while bf16x3's K=210 pads to 256 (18%). This harness measures
both at production shapes — the decision record lives in docs/KERNELS.md.

Run on the TPU:  python -u benchmarks/int8_sampler_ab.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from benchmarks.timing import chain_time, setup_cache


def main():
    setup_cache()
    from onnx_image_processing_tpu.ops.bad import (_PATCH, load_bad_params,
                                                   sample_layout)
    from onnx_image_processing_tpu.kernels.sparse_sampler import sparse_box_sample

    params = load_bad_params(512)
    ps, r_max = _PATCH, params.max_radius
    layout = sample_layout(params)
    groups = layout.groups
    s = groups[-1][2]
    rng = np.random.default_rng(0)
    b = 2  # one two-image matcher call = 2 images through the kernel

    for (h, w) in ((480, 640), (1080, 1920)):
        # Integer-valued pixels, like every uint8-derived frame the CLIs load.
        img = rng.integers(0, 256, (b, h, w)).astype(np.float32)
        imgp = jnp.asarray(np.pad(img, ((0, 0), (r_max, r_max), (r_max, r_max)),
                                  mode="edge"))
        for k in (512, 1024):
            sy = jnp.asarray((rng.integers(0, (h - ps) // 8 + 1, (b, k)) * 8)
                             .astype(np.int32))
            sx = jnp.asarray(rng.integers(0, w - ps + 1, (b, k))
                             .astype(np.int32))
            ly = jnp.asarray(rng.uniform(0, ps - 1, (b, k, s))
                             .astype(np.float32))
            lx = jnp.asarray(rng.uniform(0, ps - 1, (b, k, s))
                             .astype(np.float32))

            outs = {}
            row = {"shape": f"{h}x{w}", "K": k, "B": b}
            for name, integer_exact in (("bf16x3", False), ("int8", True)):
                def step(ly_c, lx_c, _ie=integer_exact):
                    out = sparse_box_sample(imgp, sy, sx, ly_c, lx_c, ps,
                                            r_max, groups, tile=64,
                                            integer_exact=_ie)
                    eps = out[0, 0, 0] * 1e-20
                    return out.sum(), (ly_c + eps, lx_c + eps)

                row[f"{name}_ms"] = round(chain_time(step, (ly, lx), n=30), 4)
                outs[name] = np.asarray(sparse_box_sample(
                    imgp, sy, sx, ly, lx, ps, r_max, groups, tile=64,
                    integer_exact=integer_exact))
            row["int8_vs_bf16_max_abs"] = float(
                np.abs(outs["int8"] - outs["bf16x3"]).max())
            row["int8_speedup"] = round(row["bf16x3_ms"] / row["int8_ms"], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

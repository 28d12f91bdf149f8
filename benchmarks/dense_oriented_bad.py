"""Measure the dense ORIENTED BAD path — the one documented parity-only op.

The oriented dense descriptor map rotates every pair offset per pixel and
samples the box bank with H*W*2P bilinear gathers
(`pytorch_model/descriptor/bad.py:112-187`); no reference export uses it.
This bench quantifies that gather cost on the device next to the unoriented
dense path (static clamped shifts, zero gathers) and the sparse path at 1024
keypoints, so the parity-only warning in ops/bad.py carries a measured number.

Usage: python benchmarks/dense_oriented_bad.py [--height 480 --width 640]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import chain_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--num-pairs", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import setup_cache

    setup_cache()

    from onnx_image_processing_tpu.ops import (
        dense_bad, load_bad_params, sparse_bad)

    h, w, p = args.height, args.width, args.num_pairs
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (1, 1, h, w)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, (1, 1, h, w)).astype(np.float32))
    kpts = jnp.asarray(np.stack(
        [rng.uniform(8, h - 8, (1, 1024)), rng.uniform(8, w - 8, (1, 1024))],
        -1).astype(np.float32))
    params = load_bad_params(p)

    def run(name, step, n):
        ms = chain_time(step, (img, theta), n=n, reps=2)
        print(json.dumps({"path": name, "ms_per_frame": round(ms, 3),
                          "h": h, "w": w, "num_pairs": p}))

    def dense_plain(i, t):
        d = dense_bad(i, params)
        return d[0, 0, 0, 0], (i + d[0, 0, 0, 0] * 1e-20, t)

    def dense_oriented_tiled(i, t):
        d = dense_bad(i, params, orientation=t, oriented_route="tiled")
        return d[0, 0, 0, 0], (i + d[0, 0, 0, 0] * 1e-20, t)

    def sparse_1024(i, t):
        d = sparse_bad(i, kpts, params, orientation=t)
        return d[0, 0, 0], (i + d[0, 0, 0] * 1e-20, t)

    run("dense_unoriented_static_shifts", dense_plain, n=10)
    run("sparse_oriented_1024kpt_pallas", sparse_1024, n=20)
    run("dense_oriented_tiled_sparse_sampler", dense_oriented_tiled, n=2)

    # The gather formulation is measured single-shot: chaining it in a scan
    # crashes the TPU worker, and at seconds per frame the ~40 ms tunnel
    # round trip is noise anyway.
    import time

    import jax

    f = jax.jit(lambda i, t: dense_bad(i, params, orientation=t,
                                       oriented_route="gather"))
    img_, theta_ = img, jnp.asarray(
        rng.uniform(-3, 3, (1, 1, h, w)).astype(np.float32))
    float(f(img_, theta_)[0, 0, 0, 0])  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(img_, theta_)[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"path": "dense_oriented_gathers",
                      "ms_per_frame": round(min(ts) * 1e3, 1),
                      "h": h, "w": w, "num_pairs": p,
                      "note": "single-shot; scan-chaining this graph "
                              "crashes the TPU worker"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

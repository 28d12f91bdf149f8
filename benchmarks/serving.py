"""Sustained client-side serving throughput through ``parallel.stream_map``.

VERDICT r2 item 6: the on-device chain number (~1,800 pairs/s) is what the
chip does; this measures what a CLIENT gets — host frame production (decode /
preprocess / H2D) and result materialization (``jax.device_get``) included —
at pipeline depths 1, 2, 4, 8. On a tunneled TPU the depth=1 row is
RTT-bound by construction (the tunnel round trip serializes with compute);
deeper pipelines hide the tunnel until host work or the chip saturates.
Numbers go in docs/DEPLOYMENT.md next to the on-device figure, labeled by
what they include.

Usage: python benchmarks/serving.py [--frames 200] [--depths 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _frame_stream(n, h=480, w=640, seed=0):
    """Host-side frame producer: synthesizes + preprocesses per step (the
    stand-in for decode; ~0.5 ms of real numpy work per pair)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    for i in range(n):
        a = np.clip(np.roll(base, i % 11, 0) + rng.normal(0, 3, (h, w)),
                    0, 255).astype(np.float32)
        b = np.clip(np.roll(base, 7 + i % 11, 1) + rng.normal(0, 3, (h, w)),
                    0, 255).astype(np.float32)
        yield jnp.asarray(a[None, None]), jnp.asarray(b[None, None])


def bench_depth(fn, depth, frames, warmup=20):
    from onnx_image_processing_tpu.parallel import stream_map

    # Warm the compile outside the timed window.
    for _ in stream_map(fn, _frame_stream(warmup, seed=1), depth=depth):
        pass
    t0 = time.perf_counter()
    n = 0
    for out in stream_map(fn, _frame_stream(frames), depth=depth):
        n += 1
        _ = out[2][0, 0, 0]  # touch the materialized result
    dt = time.perf_counter() - t0
    return {"depth": depth, "pairs": n, "s": round(dt, 3),
            "pairs_per_s": round(n / dt, 1),
            "ms_per_pair_client": round(dt * 1e3 / n, 2)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--depths", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--max-keypoints", type=int, default=512)
    args = ap.parse_args(argv)

    from benchmarks.timing import setup_cache

    setup_cache()
    import jax

    from onnx_image_processing_tpu import models

    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn",
                      max_keypoints=args.max_keypoints)
    platform = jax.devices()[0].platform
    for d in args.depths:
        rec = bench_depth(fn, d, args.frames)
        rec["platform"] = platform
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

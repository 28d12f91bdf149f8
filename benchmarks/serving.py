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


def _frame_stream(n, h=480, w=640, seed=0, dtype=np.float32, device=True):
    """Host-side frame producer: synthesizes + preprocesses per step (the
    stand-in for decode; ~0.5 ms of real numpy work per pair).

    dtype=np.uint8 ships camera-native bytes — 4x less upload traffic, and
    the pipelines cast on-device with BIT-IDENTICAL results (every entry op
    starts with astype(float32))."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    for i in range(n):
        a = np.clip(np.roll(base, i % 11, 0) + rng.normal(0, 3, (h, w)),
                    0, 255).astype(dtype)
        b = np.clip(np.roll(base, 7 + i % 11, 1) + rng.normal(0, 3, (h, w)),
                    0, 255).astype(dtype)
        if device:
            yield jnp.asarray(a[None, None]), jnp.asarray(b[None, None])
        else:
            yield a[None, None], b[None, None]


def bench_depth(fn, depth, frames, warmup=20, dtype=np.float32):
    from onnx_image_processing_tpu.parallel import stream_map

    # Warm the compile outside the timed window.
    for _ in stream_map(fn, _frame_stream(warmup, seed=1, dtype=dtype),
                        depth=depth):
        pass
    t0 = time.perf_counter()
    n = 0
    for out in stream_map(fn, _frame_stream(frames, dtype=dtype),
                          depth=depth):
        n += 1
        _ = out[2][0, 0, 0]  # touch the materialized result
    dt = time.perf_counter() - t0
    return {"depth": depth, "pairs": n, "s": round(dt, 3),
            "pairs_per_s": round(n / dt, 1),
            "ms_per_pair_client": round(dt * 1e3 / n, 2)}


def bench_chunked(name, chunk, frames, max_keypoints, depth=2, warmup=None,
                  dtype=np.float32):
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.parallel import stream_map_chunked

    fb = models.build_batched(name, max_keypoints=max_keypoints)

    def pair_stream(n, seed):
        # Host arrays: chunked mode stacks on the host, one upload per side.
        yield from _frame_stream(n, seed=seed, dtype=dtype, device=False)

    for out in stream_map_chunked(fb, pair_stream(warmup or 2 * chunk, 1),
                                  chunk, depth=depth):
        pass
    t0 = time.perf_counter()
    n = 0
    for out in stream_map_chunked(fb, pair_stream(frames, 0), chunk,
                                  depth=depth):
        n += 1
        _ = out[2][0, 0]
    dt = time.perf_counter() - t0
    return {"chunk": chunk, "depth": depth, "pairs": n, "s": round(dt, 3),
            "pairs_per_s": round(n / dt, 1),
            "ms_per_pair_client": round(dt * 1e3 / n, 2)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--depths", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--chunks", type=int, nargs="*", default=[],
                    help="also benchmark stream_map_chunked at these chunk "
                         "sizes (amortizes the tunnel round trips)")
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--uint8", action="store_true",
                    help="ship camera-native uint8 frames (4x less upload; "
                         "bit-identical results — pipelines cast on-device)")
    args = ap.parse_args(argv)

    from benchmarks.timing import setup_cache

    setup_cache()
    import jax

    from onnx_image_processing_tpu import models

    name = "shi_tomasi_angle_sparse_bad_sinkhorn"
    platform = jax.devices()[0].platform
    fn = models.build(name, max_keypoints=args.max_keypoints)
    dtype = np.uint8 if args.uint8 else np.float32
    for d in args.depths:
        rec = bench_depth(fn, d, args.frames, dtype=dtype)
        rec["platform"] = platform
        rec["input"] = np.dtype(dtype).name
        print(json.dumps(rec), flush=True)
    for c in args.chunks:
        rec = bench_chunked(name, c, args.frames, args.max_keypoints,
                            dtype=dtype)
        rec["platform"] = platform
        rec["input"] = np.dtype(dtype).name
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

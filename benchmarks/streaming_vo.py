"""Streaming (feature-cached) matcher throughput vs the two-image graph.

Measures the per-frame device cost of the sequential-serving recipe
(`models/streaming.py`): extract features for the NEW frame only and match
against the cached previous-frame features — vs re-running the full
two-image matcher per frame (the reference VO loop's structure,
`sample/visual_odometry.py:542-550`). Outputs are bit-identical
(tests/test_streaming.py); only the redundant recompute differs.

Timing: the same chained-`lax.scan` protocol as bench.py (host-blocking
timing on a tunneled TPU measures the tunnel, not the chip); each iteration
extracts from a perturbed image that depends on the previous match output,
and the carry holds the new frame's features — exactly the VO loop's device
data flow.

``--batch B`` measures BATCHED streaming instead (multi-stream serving:
extract/match are batch-parallel by construction, so B independent streams
advance one frame per step — B cached references, B new frames, B matches).

Usage: python benchmarks/streaming_vo.py [--kpts 512] [--size 480 640]
       [--model shi_tomasi_angle_sparse_bad_sinkhorn] [--essential]
       [--batch B]
Output: one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import chain_time, setup_cache  # noqa: E402


def _images(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    img1 = np.clip(base + rng.normal(0, 3, (h, w)), 0, 255)
    img2 = np.clip(np.roll(base, 7, 1) + rng.normal(0, 3, (h, w)), 0, 255)
    return (img1.astype(np.float32)[None, None],
            img2.astype(np.float32)[None, None])


def _run_batched(args, name, h, w):
    """Batched multi-stream streaming: B cached references x B new frames."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models

    b = args.batch
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)

    def mk(shift):
        return jnp.asarray(np.stack(
            [np.clip(np.roll(base, shift + i, 1) + rng.normal(0, 3, (h, w)),
                     0, 255) for i in range(b)])[:, None].astype(np.float32))

    extract, match = models.build_streaming(name, max_keypoints=args.kpts)
    if args.chunk:
        from onnx_image_processing_tpu.parallel import chunk_batch

        extract, match = (chunk_batch(extract, args.chunk),
                          chunk_batch(match, args.chunk))

    def step(img, feats_prev):
        feats = extract(img)
        out = match(feats_prev, feats)
        s = out[2].sum()  # depend on every stream's P (DCE-proof)
        return s, (img + s * 1e-12, feats)

    ms = chain_time(step, (mk(7), extract(mk(0))), n=30)
    print(json.dumps({
        "bench": "streaming_vo_batched", "model": name, "kpts": args.kpts,
        "size": [h, w], "batch": b, "chunk": args.chunk or None,
        "ms_per_step": round(ms, 4),
        "ms_per_pair": round(ms / b, 4),
        "pairs_per_s": round(b * 1e3 / ms, 1),
    }))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--kpts", type=int, default=512)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--model", default="shi_tomasi_angle_sparse_bad_sinkhorn")
    ap.add_argument("--essential", action="store_true",
                    help="use the *_essential_matrix variant (adds k_inv)")
    ap.add_argument("--batch", type=int, default=0,
                    help="measure batched streaming at this many concurrent "
                         "streams instead of the two-image comparison "
                         "(sweet spot B=8 on v5e; non-multiple-of-8 widths "
                         "pay an XLA stencil-layout drift — traced in "
                         "BASELINE.md; parallel.chunk_batch holds the B=8 "
                         "rate at any multiple of 8)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="with --batch: wrap extract/match in "
                         "parallel.chunk_batch at this width")
    args = ap.parse_args(argv)
    if args.chunk and not args.batch:
        ap.error("--chunk only applies to the batched mode; pass --batch B")
    if args.batch and args.essential:
        ap.error("--essential is single-stream only: the essential matchers' "
                 "match(feats1, feats2, k_inv) solves one E per call "
                 "(models/streaming.py) — batched mode measures the plain "
                 "matcher split")

    setup_cache()
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models

    name = args.model + ("_essential_matrix" if args.essential else "")
    h, w = args.size
    if args.batch:
        return _run_batched(args, name, h, w)
    img1, img2 = (jnp.asarray(i) for i in _images(h, w))
    kw = dict(max_keypoints=args.kpts)
    k_inv = jnp.asarray(np.linalg.inv(np.array(
        [[0.8 * w, 0, w / 2], [0, 0.8 * w, h / 2], [0, 0, 1]], np.float32)))
    extra = (k_inv,) if args.essential else ()

    two_image = models.build(name, **kw)
    extract, match = models.build_streaming(name, **kw)

    def step_two_image(a, b):
        out = two_image(a, b, *extra)
        p = out[2]
        eps = p[0, 0, 0] * 1e-12
        return p[0, 0, 0], (a + eps, b + eps)

    def step_streaming(img, feats_prev):
        feats = extract(img)
        out = match(feats_prev, feats, *extra)
        p = out[2]
        eps = p[0, 0, 0] * 1e-12
        return p[0, 0, 0], (img + eps, feats)

    ms_two = chain_time(step_two_image, (img1, img2), n=50)
    feats0 = extract(img1)
    ms_str = chain_time(step_streaming, (img2, feats0), n=50)

    print(json.dumps({
        "bench": "streaming_vo", "model": name, "kpts": args.kpts,
        "size": [h, w],
        "two_image_ms_per_frame": round(ms_two, 4),
        "streaming_ms_per_frame": round(ms_str, 4),
        "speedup": round(ms_two / ms_str, 3),
        "two_image_fps": round(1e3 / ms_two, 1),
        "streaming_fps": round(1e3 / ms_str, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

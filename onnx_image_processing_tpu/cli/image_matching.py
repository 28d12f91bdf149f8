"""Two-image matching CLI with built-in benchmark.

Counterpart of `sample/image_matching.py:281-371`: run a matcher pipeline on
two images, extract mutual-NN matches on the host, render side-by-side match
visualization, and report the warmup+timed ms/frame benchmark.
"""

from __future__ import annotations

import argparse

import numpy as np

from .. import models
from ..utils import extract_matches, visualize_matches
from .common import (add_platform_arg, add_timing_arg, load_image,
                     run_benchmark, select_platform)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU two-image matching sample")
    p.add_argument("--model", "-m", default="shi_tomasi_angle_sparse_bad_sinkhorn",
                   help=f"matcher pipeline name; one of {models.names()}")
    p.add_argument("--image1", "-i1", required=True)
    p.add_argument("--image2", "-i2", required=True)
    p.add_argument("--output", "-o", default="matches.png")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--max-keypoints", "-k", type=int, default=None,
                   help="override pipeline max keypoints")
    p.add_argument("--topk-mode", choices=["block", "sort", "approx"],
                   default=None,
                   help="keypoint selection: block (default), sort "
                        "(reference-exact ties), approx (lax.approx_max_k, "
                        "~5x faster selection at 1080p, recall 0.99 — "
                        "BASELINE.md)")
    p.add_argument("--match-threshold", "-t", type=float, default=0.1)
    p.add_argument("--max-matches", type=int, default=100)
    p.add_argument("--no-benchmark", action="store_true")
    add_timing_arg(p)
    p.add_argument("--colorize", action="store_true",
                   help="color match lines by confidence (blue=low, red=high)")
    add_platform_arg(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    select_platform(args.platform)
    import jax.numpy as jnp

    arr1, rgb1 = load_image(args.image1, args.height, args.width)
    arr2, rgb2 = load_image(args.image2, args.height, args.width)

    overrides = {}
    if args.max_keypoints is not None:
        overrides["max_keypoints"] = args.max_keypoints
    if args.topk_mode is not None:
        overrides["topk_mode"] = args.topk_mode
    fn = models.build(args.model, **overrides)

    i1, i2 = jnp.asarray(arr1), jnp.asarray(arr2)
    out = fn(i1, i2)
    k1, k2, p = (np.asarray(o) for o in out[:3])

    if not args.no_benchmark:
        run_benchmark(fn, (i1, i2), args.timing)

    mk1, mk2, scores = extract_matches(p[None] if p.ndim == 2 else p,
                                       k1, k2, threshold=args.match_threshold,
                                       max_matches=args.max_matches)
    n_valid1 = int((k1[0, :, 0] >= 0).sum())
    n_valid2 = int((k2[0, :, 0] >= 0).sum())
    print(f"Keypoints: {n_valid1} / {n_valid2}")
    print(f"Matches: {len(mk1)} (threshold={args.match_threshold})")

    vis = visualize_matches(rgb1, rgb2, mk1, mk2, scores,
                            colorize_by_score=args.colorize)
    vis.save(args.output)
    print(f"Saved visualization to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Two-image matching CLI for *_extraction pipelines (in-graph mutual-NN).

Counterpart of `sample/image_matching_extraction.py`: the pipeline itself
returns fixed-size matched pairs; the host only filters by the validity mask
and renders.
"""

from __future__ import annotations

import argparse

import numpy as np

from .. import models
from ..utils import visualize_matches
from .common import (add_platform_arg, add_timing_arg, load_image,
                     run_benchmark, select_platform)


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="TPU two-image matching sample (in-graph match extraction)")
    p.add_argument("--model", "-m",
                   default="shi_tomasi_angle_sparse_bad_sinkhorn_extraction",
                   help="extraction pipeline name (must end in _extraction)")
    p.add_argument("--image1", "-i1", required=True)
    p.add_argument("--image2", "-i2", required=True)
    p.add_argument("--output", "-o", default="matches.png")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--max-matches", type=int, default=None,
                   help="override pipeline max matches")
    p.add_argument("--topk-mode", choices=["block", "sort", "approx"],
                   default=None,
                   help="keypoint selection: block (default), sort "
                        "(reference-exact ties), approx (~5x faster "
                        "selection at 1080p, recall 0.99 — BASELINE.md)")
    p.add_argument("--match-threshold", "-t", type=float, default=None)
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
    if args.max_matches is not None:
        overrides["max_matches"] = args.max_matches
    if args.match_threshold is not None:
        overrides["match_threshold"] = args.match_threshold
    if args.topk_mode is not None:
        overrides["topk_mode"] = args.topk_mode
    fn = models.build(args.model, **overrides)

    i1, i2 = jnp.asarray(arr1), jnp.asarray(arr2)
    mk1, mk2, scores, valid = (np.asarray(o) for o in fn(i1, i2)[:4])

    if not args.no_benchmark:
        run_benchmark(fn, (i1, i2), args.timing)

    keep = valid[0]
    mk1, mk2, scores = mk1[0][keep], mk2[0][keep], scores[0][keep]
    print(f"Matches: {len(mk1)}")

    vis = visualize_matches(rgb1, rgb2, mk1, mk2, scores,
                            colorize_by_score=args.colorize)
    vis.save(args.output)
    print(f"Saved visualization to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

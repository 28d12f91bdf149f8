"""Single-image feature detection CLI.

Counterpart of `sample/feature_detection.py:302-414`: run a detector pipeline,
select keypoints on the host (NMS + threshold + top-k + sub-pixel parabola
refinement), render a visualization. Flags mirror the reference; ``--model``
takes a registry name instead of an .onnx path.
"""

from __future__ import annotations

import argparse

import numpy as np

from .. import models
from ..utils import select_keypoints, visualize_keypoints
from .common import (add_platform_arg, add_timing_arg, load_image,
                     run_benchmark, select_platform)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU feature detection sample")
    p.add_argument("--model", "-m", default="shi_tomasi",
                   help=f"pipeline name; one of {models.names()}")
    p.add_argument("--image", "-i", required=True, help="input image path")
    p.add_argument("--output", "-o", default="keypoints.png",
                   help="output visualization path")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--threshold", "-t", type=float, default=0.01,
                   help="minimum keypoint score")
    p.add_argument("--max-keypoints", "-k", type=int, default=1000)
    p.add_argument("--nms-radius", type=int, default=3)
    p.add_argument("--no-subpixel", action="store_true",
                   help="disable sub-pixel parabola refinement")
    p.add_argument("--circle-radius", type=int, default=3,
                   help="keypoint circle radius in the visualization")
    p.add_argument("--colorize", action="store_true",
                   help="color keypoints by score (blue=low, red=high)")
    p.add_argument("--benchmark", action="store_true",
                   help="print warmup+timed ms/frame")
    add_timing_arg(p)
    # Detector hyperparameters (reference export flags: `export_fast.py:44-60`,
    # `export_dog.py:46-70`, `export_akaze.py:50-86`). None = registry default.
    g = p.add_argument_group("detector hyperparameters")
    g.add_argument("--fast-threshold", type=float, default=None,
                   help="FAST intensity threshold (reference --threshold, 20)")
    g.add_argument("--fast-use-nms", action="store_const", const=True,
                   default=None, help="FAST in-graph maxpool NMS")
    g.add_argument("--fast-nms-radius", type=int, default=None)
    g.add_argument("--dog-num-scales", type=int, default=None)
    g.add_argument("--dog-sigma-base", type=float, default=None)
    g.add_argument("--dog-sigma-ratio", type=float, default=None)
    g.add_argument("--dog-kernel-size", type=int, default=None)
    g.add_argument("--akaze-threshold", type=float, default=None)
    g.add_argument("--akaze-kappa", type=float, default=None)
    g.add_argument("--akaze-num-scales", type=int, default=None)
    g.add_argument("--akaze-diffusion-iterations", type=int, default=None)
    add_platform_arg(p)
    return p.parse_args(argv)


def detector_overrides(args) -> dict:
    """Non-None detector flags as flat config overrides (fast_*/dog_*/akaze_*)."""
    keys = ("fast_threshold", "fast_use_nms", "fast_nms_radius",
            "dog_num_scales", "dog_sigma_base", "dog_sigma_ratio",
            "dog_kernel_size", "akaze_threshold", "akaze_kappa",
            "akaze_num_scales", "akaze_diffusion_iterations")
    return {k: getattr(args, k) for k in keys
            if getattr(args, k, None) is not None}


def main(argv=None):
    args = parse_args(argv)
    select_platform(args.platform)
    import jax.numpy as jnp

    arr, rgb = load_image(args.image, args.height, args.width)
    fn = models.build(args.model, **detector_overrides(args))
    out = fn(jnp.asarray(arr))
    scores = np.asarray(out[0] if isinstance(out, (tuple, list)) else out)

    if args.benchmark:
        run_benchmark(fn, (jnp.asarray(arr),), args.timing)

    kpts = select_keypoints(scores, threshold=args.threshold,
                            max_keypoints=args.max_keypoints,
                            nms_radius=args.nms_radius,
                            subpixel=not args.no_subpixel)
    print(f"Detected {len(kpts)} keypoints "
          f"(model={args.model}, threshold={args.threshold})")
    if len(kpts):
        print(f"Score range: [{kpts[:, 2].min():.4f}, {kpts[:, 2].max():.4f}]")

    vis = visualize_keypoints(rgb, kpts, radius=args.circle_radius,
                              colorize_by_score=args.colorize)
    vis.save(args.output)
    print(f"Saved visualization to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

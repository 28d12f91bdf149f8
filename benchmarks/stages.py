"""Per-stage device timing, FLOP accounting, and MFU for the hot pipelines.

Breaks the flagship matcher (BASELINE config 4) and the AKAZE + essential
matcher (config 5) into their pipeline stages, times each with the same
device-chained ``lax.scan`` protocol as ``bench.py`` (host-synchronized
timing measures the host<->TPU tunnel, not the chip), and reports per stage:

* ms/frame (device time),
* FLOPs from ``compiled.cost_analysis()``,
* model FLOP utilization vs the chip's bf16 peak, and
* HBM bytes + achieved bandwidth vs peak — the meaningful ceiling for the
  stencil/logsumexp stages, which are bandwidth-bound, not MXU-bound.

The reference ships no per-stage numbers at all (its only timing is a 5+10
warmup/timed wall-clock loop, `sample/image_matching.py:313-328`); this tool
is the "beat the reference properly" accounting VERDICT item 3 asked for.

Usage:  python benchmarks/stages.py [--kpts 512] [--pipeline flagship|akaze_e]
Output: one JSON line per stage + a totals line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import PEAK_BF16_FLOPS, PEAK_HBM_BYTES  # noqa: E402


def _setup_cache():
    from benchmarks.timing import setup_cache

    setup_cache()


def _images(h=480, w=640, b=2, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    imgs = np.stack([
        np.clip(np.roll(base, 7 * i, 1) + rng.normal(0, 3, (h, w)), 0, 255)
        for i in range(b)]).astype(np.float32)[:, None]
    return jnp.asarray(imgs)


def _chain(stage_fn, args, n=50, reps=3):
    """Device ms/iteration of ``stage_fn(*args)``, differential-chain protocol
    (benchmarks/timing.py). ``stage_fn`` must return a single array; the chain
    dependency is injected by adding a tiny epsilon of the output back onto
    the first argument."""
    from benchmarks.timing import chain_time

    def step(*carry):
        out = stage_fn(*carry)
        eps = out.ravel()[0] * 1e-20
        return out.ravel()[0], (carry[0] + eps,) + carry[1:]

    return chain_time(step, args, n=n, reps=reps)


def _cost(stage_fn, args):
    """(flops, hbm_bytes) from XLA's compiled cost model (best effort)."""
    import jax

    try:
        ca = jax.jit(stage_fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        return flops, byts
    except Exception:
        return 0.0, 0.0


def _report(name, ms, flops, byts):
    sec = ms * 1e-3
    rec = {
        "stage": name,
        "ms": round(ms, 4),
        "gflops": round(flops / 1e9, 3),
        "mfu_bf16_pct": round(100.0 * flops / sec / PEAK_BF16_FLOPS, 2) if sec else 0,
        "hbm_gb": round(byts / 1e9, 4),
        "hbm_util_pct": round(100.0 * byts / sec / PEAK_HBM_BYTES, 1) if sec else 0,
    }
    print(json.dumps(rec))
    return rec


def profile_flagship(kpts: int, num_pairs: int = 512):
    """Stage breakdown of the Shi-Tomasi+Angle+SparseBAD+Sinkhorn matcher."""
    import jax

    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        _resolve_border_margin, _select_keypoints,
        shi_tomasi_angle_sparse_bad_sinkhorn_match)
    from onnx_image_processing_tpu.ops import (
        angle_estimation, load_bad_params, shi_tomasi_score, sinkhorn_match,
        sparse_bad)

    cfg = models.get("shi_tomasi_angle_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=kpts, num_pairs=num_pairs)
    both = _images()  # (2, 1, 480, 640) = the stacked pair

    # Precompute stage inputs once (on device) so each stage is timed alone.
    params = load_bad_params(cfg.num_pairs)
    margin = _resolve_border_margin(cfg, sparse=True)
    scores = jax.jit(lambda b: shi_tomasi_score(b, block_size=cfg.block_size))(both)
    angles = jax.jit(lambda b: angle_estimation(
        b, patch_size=cfg.patch_size, sigma=cfg.sigma))(both)
    sel = jax.jit(lambda s: _select_keypoints(s, cfg, margin))
    kp, _ = sel(scores)
    desc = jax.jit(lambda b, k, a: sparse_bad(
        b, k, params, orientation=a, binarize=cfg.binarize,
        soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
        normalize_descriptors=cfg.normalize_descriptors,
        sampling_mode=cfg.sampling_mode, use_pallas=cfg.use_pallas))
    d = desc(both, kp, angles)
    sink = jax.jit(lambda d1, d2: sinkhorn_match(
        d1, d2, iterations=cfg.sinkhorn_iterations, epsilon=cfg.epsilon,
        unused_score=cfg.unused_score, distance_type=cfg.distance_type))

    stages = [
        ("detect:shi_tomasi",
         lambda b: shi_tomasi_score(b, block_size=cfg.block_size), (both,)),
        ("detect:angle",
         lambda b: angle_estimation(b, patch_size=cfg.patch_size,
                                    sigma=cfg.sigma), (both,)),
        ("select:nms+topk", lambda s: sel(s)[0].astype(np.float32), (scores,)),
        ("describe:sparse_bad", lambda b: desc(b, kp, angles), (both,)),
        ("match:sinkhorn", lambda d1: sink(d1[:1], d[1:]), (d,)),
        ("e2e:flagship",
         lambda i: shi_tomasi_angle_sparse_bad_sinkhorn_match(
             i[:1], i[1:], cfg)[2], (both,)),
    ]
    return _run_stages(stages)


def profile_akaze_essential(kpts: int, num_pairs: int = 512):
    """Stage breakdown of the AKAZE + SparseBAD + Sinkhorn + E matcher."""
    import jax
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.geometry import (
        estimate_essential_from_keypoints)
    from onnx_image_processing_tpu.models.akaze_family import akaze_detect_cfg
    from onnx_image_processing_tpu.models.essential_family import (
        akaze_sparse_bad_sinkhorn_essential_match)
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        _resolve_border_margin, _select_keypoints)
    from onnx_image_processing_tpu.ops import (
        load_bad_params, sinkhorn_match, sparse_bad)

    cfg = models.get("akaze_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=kpts, num_pairs=num_pairs)
    both = _images()
    k_inv = jnp.asarray(np.linalg.inv(
        np.array([[500., 0, 320], [0, 500., 240], [0, 0, 1]], np.float32)))

    params = load_bad_params(cfg.num_pairs)
    margin = _resolve_border_margin(cfg, sparse=True)
    det = jax.jit(lambda b: akaze_detect_cfg(b, cfg))
    scores, angles = det(both)
    sel = jax.jit(lambda s: _select_keypoints(s, cfg, margin))
    kp, kscores = sel(scores)
    desc = jax.jit(lambda b, k, a: sparse_bad(
        b, k, params, orientation=a, binarize=cfg.binarize,
        soft_binarize=cfg.soft_binarize, temperature=cfg.temperature,
        normalize_descriptors=cfg.normalize_descriptors,
        sampling_mode=cfg.sampling_mode, use_pallas=cfg.use_pallas))
    d = desc(both, kp, angles)
    sink = jax.jit(lambda d1, d2: sinkhorn_match(
        d1, d2, iterations=cfg.sinkhorn_iterations, epsilon=cfg.epsilon,
        unused_score=cfg.unused_score, distance_type=cfg.distance_type))
    p = sink(d[:1], d[1:])
    est = jax.jit(lambda pp: estimate_essential_from_keypoints(
        pp[0], kp[0], kp[1], valid1=kscores[0] > 0, valid2=kscores[1] > 0,
        k_inv=k_inv))

    stages = [
        ("detect:diffusion_x3scales",
         lambda b: _diffusion_ladder(b, cfg), (both,)),
        ("detect:akaze_full", lambda b: det(b)[0], (both,)),
        ("select:nms+topk", lambda s: sel(s)[0].astype(np.float32), (scores,)),
        ("describe:sparse_bad", lambda b: desc(b, kp, angles), (both,)),
        ("match:sinkhorn", lambda d1: sink(d1[:1], d[1:]), (d,)),
        ("geometry:essential", lambda pp: est(pp), (p,)),
        ("e2e:akaze_essential",
         lambda i: akaze_sparse_bad_sinkhorn_essential_match(
             i[:1], i[1:], k_inv, cfg)[3], (both,)),
    ]
    return _run_stages(stages)


def _diffusion_ladder(both, cfg):
    from onnx_image_processing_tpu.ops import nonlinear_diffusion

    a = cfg.akaze
    cur = both
    for _ in range(a.num_scales):
        cur = nonlinear_diffusion(
            cur, num_iterations=a.diffusion_iterations, kappa=a.kappa)
    return cur


def _run_stages(stages):
    out = []
    for name, fn, args in stages:
        ms = _chain(fn, args)
        flops, byts = _cost(fn, args)
        out.append(_report(name, ms, flops, byts))
    e2e = out[-1]
    parts = sum(r["ms"] for r in out[:-1]
                if not r["stage"].startswith(("detect:diffusion",)))
    print(json.dumps({"stage": "sum_of_stages", "ms": round(parts, 4),
                      "e2e_ms": e2e["ms"],
                      "fps": round(1e3 / e2e["ms"], 1)}))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--kpts", type=int, default=512)
    ap.add_argument("--num-pairs", type=int, default=512)
    ap.add_argument("--pipeline", choices=["flagship", "akaze_e", "both"],
                    default="both")
    args = ap.parse_args()
    _setup_cache()
    if args.pipeline in ("flagship", "both"):
        print(json.dumps({"pipeline": "flagship", "kpts": args.kpts}))
        profile_flagship(args.kpts, args.num_pairs)
    if args.pipeline in ("akaze_e", "both"):
        print(json.dumps({"pipeline": "akaze_essential", "kpts": args.kpts}))
        profile_akaze_essential(args.kpts, args.num_pairs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

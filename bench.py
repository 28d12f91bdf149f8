"""Benchmark: flagship matcher throughput at the reference's headline config.

Measures the full two-image matcher (Shi-Tomasi + Angle + SparseBAD + Sinkhorn)
at 480x640, 512 keypoints, 512-pair descriptors (BASELINE.md config #4).

Protocol: the reference times host-blocking session.run calls
(`sample/image_matching.py:313-328`); on this rig a host round trip through
the TPU tunnel costs ~40 ms, which would measure the tunnel, not the chip.
Frames are chained on-device with ``lax.scan`` (each iteration's input depends
on the previous output — no overlap, no elision) at two chain lengths;
ms/frame = (T(3n) - T(n)) / (2n), which cancels the tunnel round trip and all
fixed host overhead exactly (see benchmarks/timing.py). ``--profile`` adds an
on-device ``jax.profiler`` cross-check (the device's own XLA-module time) and
an MFU estimate from the compiled FLOP count.

Prints ONE JSON line last. ``vs_baseline`` is FPS / 500 (the BASELINE.json
north-star target for one TPU v5e chip; the reference publishes no numbers).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))



def main(argv=None) -> None:
    profile = "--profile" in (argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import PEAK_BF16_FLOPS, chain_time, device_trace_time, setup_cache

    setup_cache()
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match,
    )

    cfg = models.get("shi_tomasi_angle_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=512, num_pairs=512)

    rng = np.random.default_rng(0)
    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    img1 = np.clip(base + rng.normal(0, 3, (h, w)), 0, 255).astype(np.float32)[None, None]
    img2 = np.clip(np.roll(base, 7, 1) + rng.normal(0, 3, (h, w)), 0, 255).astype(
        np.float32)[None, None]
    img1, img2 = jnp.asarray(img1), jnp.asarray(img2)

    def step(a, b):
        _, _, p = shi_tomasi_angle_sparse_bad_sinkhorn_match(a, b, cfg)
        eps = p[0, 0, 0] * 1e-12  # serialize: next frame depends on this one
        return p[0, 0, 0], (a + eps, b + eps)

    # Median of 3 repeats: within-session spread is ~±1.7% (BASELINE.md
    # config-1 variance note), so the median bounds single-run noise in the
    # one recorded number; the compiled executable is reused, so repeats cost
    # milliseconds, not recompiles.
    ms_per_frame = float(np.median(
        [chain_time(step, (img1, img2), n=50) for _ in range(3)]))

    if profile:
        dev_ms = device_trace_time(step, (img1, img2), n=50)
        fn = jax.jit(lambda a, b: shi_tomasi_angle_sparse_bad_sinkhorn_match(
            a, b, cfg))
        try:
            ca = fn.lower(img1, img2).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            flops = None  # keep the output strict JSON (no NaN literals)
        print(json.dumps({
            "profile": "flagship_512kpt",
            "chain_ms_per_frame": round(ms_per_frame, 4),
            "device_trace_ms_per_frame":
                None if dev_ms is None else round(dev_ms, 4),
            "flops_per_frame": flops,
            "mfu_bf16_pct":
                None if not (dev_ms and flops) else round(
                    100.0 * flops / (dev_ms * 1e-3) / PEAK_BF16_FLOPS, 2),
        }))

    fps = 1e3 / ms_per_frame
    print(json.dumps({
        "metric": "shi_tomasi_angle_sparse_bad_sinkhorn_480x640_512kpt_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())

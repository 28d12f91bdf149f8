"""Benchmark: flagship matcher throughput at the reference's headline config.

Measures the full two-image matcher (Shi-Tomasi + Angle + SparseBAD + Sinkhorn)
at 480x640, 512 keypoints, 512-pair descriptors (BASELINE.md config #4).

Protocol: the reference times host-blocking session.run calls
(`sample/image_matching.py:313-328`); on this rig a host round trip through
the TPU tunnel costs ~40 ms, which would measure the tunnel, not the chip, so
frames are chained on-device with ``lax.scan`` (each iteration's input depends
on the previous output — no overlap, no elision) and the host syncs once.
Reported ms/frame = (total - tunnel round trip) / n_frames.

Prints ONE JSON line. ``vs_baseline`` is FPS / 500 (the BASELINE.json
north-star target for one TPU v5e chip; the reference publishes no numbers).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import os

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/oip_tpu_xla"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

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

    n_frames = 50

    @jax.jit
    def run(i1, i2):
        def body(carry, _):
            a, b = carry
            _, _, p = shi_tomasi_angle_sparse_bad_sinkhorn_match(a, b, cfg)
            eps = p[0, 0, 0] * 1e-12  # serialize: next frame depends on this one
            return (a + eps, b + eps), p[0, 0, 0]

        _, outs = jax.lax.scan(body, (i1, i2), None, length=n_frames)
        return outs.sum()

    # Tunnel round-trip floor (trivial op, same sync pattern).
    tiny = jax.jit(lambda a: a[0, 0, 0, 0] + 1.0)
    _ = float(tiny(img1))
    rtt = min(_time_once(tiny, (img1,)) for _ in range(5))

    _ = float(run(img1, img2))  # compile + warm
    total = min(_time_once(run, (img1, img2)) for _ in range(5))

    ms_per_frame = max(total - rtt, 1e-9) * 1e3 / n_frames
    fps = 1e3 / ms_per_frame
    print(json.dumps({
        "metric": "shi_tomasi_angle_sparse_bad_sinkhorn_480x640_512kpt_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
    }))


def _time_once(fn, args) -> float:
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # force D2H sync
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())

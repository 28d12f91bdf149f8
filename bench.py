"""Benchmark: flagship matcher FPS at the reference's headline config.

Protocol mirrors the reference harness — 5 warmup + N timed iterations of the
full two-image matcher (`sample/image_matching.py:313-328`) — at 480x640,
512 keypoints, 512-pair descriptors (BASELINE.md config #4). Prints ONE JSON
line. ``vs_baseline`` is FPS / 500 (the BASELINE.json north-star target for
one TPU v5e chip; the reference publishes no numbers of its own).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models

    cfg = models.get("shi_tomasi_angle_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=512, num_pairs=512)
    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn", cfg)

    rng = np.random.default_rng(0)
    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    img1 = np.clip(base + rng.normal(0, 3, (h, w)), 0, 255).astype(np.float32)[None, None]
    img2 = np.clip(np.roll(base, 7, 1) + rng.normal(0, 3, (h, w)), 0, 255).astype(
        np.float32)[None, None]
    img1, img2 = jnp.asarray(img1), jnp.asarray(img2)

    warmup, iters = 5, 20
    for _ in range(warmup):
        jax.block_until_ready(fn(img1, img2))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(img1, img2)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "shi_tomasi_angle_sparse_bad_sinkhorn_480x640_512kpt_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark every BASELINE.md config on the current device.

Protocol: frames chained on-device via lax.scan at two chain lengths;
ms/frame = (T(3n) - T(n)) / (2n), cancelling the host<->TPU tunnel round trip
exactly (see benchmarks/timing.py for why host-synchronized timing is invalid
on a tunneled TPU). Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import chain_time  # noqa: E402


def _images(h, w, b=1, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    i1 = np.clip(base + rng.normal(0, 3, (h, w)), 0, 255).astype(np.float32)
    i2 = np.clip(np.roll(base, 7, 1) + rng.normal(0, 3, (h, w)), 0, 255).astype(np.float32)
    one = lambda a: jnp.asarray(np.broadcast_to(a, (b, 1, h, w)).copy())
    return one(i1), one(i2)


def _chain_time(step_fn, args, n=50, reps=4):
    """Differential-chain ms/iteration (benchmarks/timing.py)."""
    return chain_time(step_fn, args, n=n, reps=reps)


def bench_shi_tomasi_nms():
    """Config 1: Shi-Tomasi + NMS at 480x640."""
    from onnx_image_processing_tpu.ops import nms_maxpool, shi_tomasi_score

    i1, _ = _images(480, 640)

    def step(img, _unused):
        s = shi_tomasi_score(img, block_size=3)[:, 0]
        m = nms_maxpool(s, 3)
        eps = m[0, 0, 0] * 1e-20
        return m.sum(), (img + eps, _unused)

    # ~20 us/frame: needs a long chain so the differential rises above
    # host/tunnel timing jitter (n=50 puts T(3n)-T(n) at ~2 ms, within noise).
    return _chain_time(step, (i1, i1), n=500)


def bench_shi_tomasi_dense_bad():
    """Config 2: Shi-Tomasi detection + BAD descriptors at 1000 keypoints.

    Uses the sparse-bilinear path, which is mathematically identical to
    materializing the dense (P, H, W) map and grid_sampling it at the
    (integer) keypoints — see models/shi_tomasi_family.py — and ~15x faster.
    """
    from onnx_image_processing_tpu.ops import (
        load_bad_params, nms_select_topk, shi_tomasi_score, sparse_bad)

    params = load_bad_params(256)
    i1, _ = _images(480, 640)

    def step(img, _unused):
        s = shi_tomasi_score(img, block_size=3)[:, 0]
        # Pipeline-standard fused selection (Pallas frontend + block top-k;
        # same 1000-keypoint set as the flat sort on THIS bench image,
        # verified — not guaranteed in general: block top-k keeps one
        # representative per (r+1)^2 block under within-block score ties,
        # where the flat sort keeps every tied copy. Round-3-and-earlier FPS
        # columns for this config measured the flat-sort selection.
        # The previous two-step nms_maxpool + select_topk_keypoints call
        # sorted all 307k pixels: 797 -> 409 us/frame.
        kpts, _ = nms_select_topk(s, 1000, nms_radius=3)
        desc = sparse_bad(img, kpts, params, sampling_mode="bilinear")
        eps = desc[0, 0, 0] * 1e-20
        return desc.sum(), (img + eps, _unused)

    return _chain_time(step, (i1, i1), n=20)


def bench_depth_pointcloud():
    """Config 3: depth -> pointcloud + normals + voxel downsampling."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu.ops import (
        depth_to_pointcloud_with_normal, voxel_downsampling)

    rng = np.random.default_rng(1)
    depth = jnp.asarray(rng.uniform(0.5, 5.0, (480, 640, 1)).astype(np.float32))

    def step(d, _unused):
        pcd, nrm = depth_to_pointcloud_with_normal(d, cx=320., cy=240.,
                                                   fx=525., fy=525.)
        pts, mask = voxel_downsampling(pcd.reshape(-1, 3)[::8], jnp.float32(0.05))
        eps = pts[0, 0] * 1e-20
        return pts.sum() + nrm.sum(), (d + eps, _unused)

    return _chain_time(step, (depth, depth), n=20)


def bench_flagship():
    """Config 4: Shi-Tomasi + Angle + SparseBAD + Sinkhorn, 512 kpts."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match)

    cfg = models.get("shi_tomasi_angle_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=512, num_pairs=512)
    i1, i2 = _images(480, 640)

    def step(a, b):
        _, _, p = shi_tomasi_angle_sparse_bad_sinkhorn_match(a, b, cfg)
        eps = p[0, 0, 0] * 1e-12
        return p[0, 0, 0], (a + eps, b + eps)

    return _chain_time(step, (i1, i2))


def bench_flagship_hires(h, w, n=30):
    """Flagship matcher at 1280x720 / 1920x1080 (VERDICT r2 item 5; the
    reference exports arbitrary --height/--width). 1080p engages the
    windowed-DMA sampler fallback naturally (image > 4 MB VMEM budget)."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match)

    cfg = models.get("shi_tomasi_angle_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=512, num_pairs=512)
    i1, i2 = _images(h, w)

    def step(a, b):
        _, _, p = shi_tomasi_angle_sparse_bad_sinkhorn_match(a, b, cfg)
        eps = p[0, 0, 0] * 1e-12
        return p[0, 0, 0], (a + eps, b + eps)

    return _chain_time(step, (i1, i2), n=n)


def bench_akaze_1024(with_essential):
    """AKAZE matcher at the shipped CI config (1024 kpts,
    `onnx_export/export.py:21-62`), with and without the in-graph E."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models

    if with_essential:
        from onnx_image_processing_tpu.models.essential_family import (
            akaze_sparse_bad_sinkhorn_essential_match as fn)
    else:
        from onnx_image_processing_tpu.models.akaze_family import (
            akaze_sparse_bad_sinkhorn_match as fn)

    cfg = models.get("akaze_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=1024, num_pairs=512)
    i1, i2 = _images(480, 640)
    k_inv = jnp.asarray(np.linalg.inv(
        np.array([[500., 0, 320], [0, 500., 240], [0, 0, 1]], np.float32)))

    if with_essential:
        def step(a, b):
            _, _, p, e = fn(a, b, k_inv, cfg)
            eps = e[0, 0] * 1e-12
            return e[0, 0], (a + eps, b + eps)
    else:
        def step(a, b):
            _, _, p = fn(a, b, cfg)
            eps = p[0, 0, 0] * 1e-12
            return p[0, 0, 0], (a + eps, b + eps)

    return _chain_time(step, (i1, i2), n=30)


def bench_akaze_essential():
    """Config 5: AKAZE + SparseBAD + Sinkhorn + in-graph essential matrix."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.models.essential_family import (
        akaze_sparse_bad_sinkhorn_essential_match)

    cfg = models.get("akaze_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=512, num_pairs=512)
    i1, i2 = _images(480, 640)
    k_inv = jnp.asarray(np.linalg.inv(
        np.array([[500., 0, 320], [0, 500., 240], [0, 0, 1]], np.float32)))

    def step(a, b):
        _, _, p, e = akaze_sparse_bad_sinkhorn_essential_match(a, b, k_inv, cfg)
        eps = e[0, 0] * 1e-12
        return e[0, 0], (a + eps, b + eps)

    return _chain_time(step, (i1, i2), n=30)


CONFIGS = [
    ("1_shi_tomasi_nms_480x640", bench_shi_tomasi_nms),
    ("2_shi_tomasi_dense_bad_1000kpt", bench_shi_tomasi_dense_bad),
    ("3_depth_pointcloud_voxel", bench_depth_pointcloud),
    ("4_flagship_matcher_512kpt", bench_flagship),
    ("5_akaze_essential_matcher_512kpt", bench_akaze_essential),
]

# High-resolution + CI-shape rows (VERDICT r2 items 5 and 7); --extended.
EXTENDED_CONFIGS = [
    ("6_flagship_matcher_512kpt_720p", lambda: bench_flagship_hires(720, 1280)),
    ("7_flagship_matcher_512kpt_1080p",
     lambda: bench_flagship_hires(1080, 1920, n=20)),
    ("8_akaze_matcher_1024kpt", lambda: bench_akaze_1024(False)),
    ("9_akaze_essential_matcher_1024kpt", lambda: bench_akaze_1024(True)),
]


def main(argv=None):
    import sys as _sys

    argv = _sys.argv[1:] if argv is None else argv
    from benchmarks.timing import setup_cache

    setup_cache()
    configs = list(CONFIGS)
    if "--extended" in argv:
        configs += EXTENDED_CONFIGS
    if "--extended-only" in argv:
        configs = list(EXTENDED_CONFIGS)
    results = {}
    for name, fn in configs:
        try:
            ms = fn()
            results[name] = ms
            print(json.dumps({"config": name, "ms_per_frame": round(ms, 3),
                              "fps": round(1e3 / ms, 1)}))
        except Exception as err:
            print(json.dumps({"config": name, "error": str(err)[:200]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Shared CLI plumbing: platform selection, image loading, timing harness.

The platform layer is the analogue of the reference's execution-provider
factory (`sample/provider_utils.py:11-75`): instead of CPU/CUDA/TensorRT
onnxruntime providers, pipelines run under jax on 'tpu' or 'cpu'; compiled
executables are cached by jax per (function, shapes, config).
"""

from __future__ import annotations

import argparse
import time

import numpy as np
from PIL import Image


def select_platform(platform: str = "auto") -> None:
    """Pin jax's default device. 'auto' keeps jax's own choice (TPU if present).

    Must be called before the first computation, not before import (the TPU
    PJRT plugin registers itself regardless of JAX_PLATFORMS). Also enables
    the persistent compilation cache — large matcher graphs take minutes to
    compile, and the cache is the deployment analogue of the reference's
    TensorRT engine cache (`sample/provider_utils.py:28-39`).
    """
    import os

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/oip_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if platform == "auto":
        return
    devices = jax.devices(platform)
    jax.config.update("jax_default_device", devices[0])


def add_platform_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--platform", default="auto",
                        choices=["auto", "tpu", "cpu"],
                        help="execution platform (reference: --provider)")


def load_image(path: str, height: int, width: int):
    """Grayscale (1, 1, H, W) float32 in [0, 255] + resized RGB for viz.

    Parity: `sample/feature_detection.py:27-45` (bilinear resize).
    """
    img = Image.open(path).convert("L").resize((width, height), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32)[None, None]
    return arr, img.convert("RGB")


def load_image_from_array(frame_bgr: np.ndarray, height: int, width: int):
    """BGR frame -> grayscale (1, 1, H, W) float32 (VO loop input,
    `sample/visual_odometry.py:522-539`)."""
    import cv2

    gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY) \
        if frame_bgr.ndim == 3 else frame_bgr
    gray = cv2.resize(gray, (width, height), interpolation=cv2.INTER_LINEAR)
    return gray.astype(np.float32)[None, None]


def benchmark(fn, args, warmup: int = 5, iterations: int = 10) -> float:
    """Reference timing protocol (`sample/image_matching.py:313-328`):
    warmup + timed loop; returns mean ms/frame.

    NOTE: on a REMOTE (tunneled) accelerator this measures host-visible
    latency — it amortizes one sync over ``iterations`` async dispatches, so
    the floor is round-trip/iterations, not device time. Use
    :func:`benchmark_chain` for device ms/frame (see benchmarks/timing.py for
    the protocol rationale) or interpret this number as client-side latency.
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iterations):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iterations * 1e3


def benchmark_chain(fn, args, n: int = 30, reps: int = 3) -> float:
    """On-device ms/frame by the differential-chain protocol.

    ``fn(*args)`` iterations are chained on-device in a ``lax.scan`` with an
    inter-iteration data dependency at two chain lengths; ms/frame =
    (T(3n) - T(n)) / (2n), which cancels host<->device round trips and all
    fixed host overhead exactly. This is the honest per-frame number on a
    tunneled TPU, where :func:`benchmark` reports >= RTT/iterations.
    """
    import jax

    def build(length):
        @jax.jit
        def run(*a):
            def body(carry, _):
                out = fn(*carry)
                leaf = out[0] if isinstance(out, (tuple, list)) else out
                s = leaf.ravel()[0].astype(carry[0].dtype)
                new = tuple(c + s * 1e-12 for c in carry)
                return new, s
            _, outs = jax.lax.scan(body, a, None, length=length)
            return outs.sum()

        return run

    short, long_ = build(n), build(3 * n)
    float(short(*args))  # compile + warm both lengths
    float(long_(*args))

    def once(r):
        t0 = time.perf_counter()
        float(r(*args))
        return time.perf_counter() - t0

    t_short = min(once(short) for _ in range(reps))
    t_long = min(once(long_) for _ in range(reps))
    return max(t_long - t_short, 1e-9) * 1e3 / (2 * n)


def add_timing_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--timing", choices=["host", "chain"], default="host",
        help="benchmark protocol: 'host' = reference warmup+timed loop "
             "(client-side latency; tunnel-inclusive on remote TPUs), "
             "'chain' = on-device differential-chain ms/frame")


def run_benchmark(fn, args, timing: str) -> None:
    """Shared CLI benchmark reporting with honest protocol labeling."""
    import jax

    if timing == "chain":
        ms = benchmark_chain(fn, args)
        print(f"Elapsed (device, chain protocol): {ms:.3f} ms/frame "
              f"({1e3 / ms:.1f} fps)")
        return
    ms = benchmark(fn, args)
    backend = jax.default_backend()
    note = (" [host-visible latency incl. host<->device transfer; "
            "use --timing chain for device ms/frame]"
            if backend != "cpu" else "")
    print(f"Elapsed: {ms:.3f} ms/frame ({1e3 / ms:.1f} fps){note}")

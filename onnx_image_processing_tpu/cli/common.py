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
    warmup + timed loop; returns mean ms/frame."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iterations):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iterations * 1e3

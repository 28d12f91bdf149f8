"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding paths compile and execute
without TPU hardware; differential tests use the reference PyTorch code (CPU)
mounted at /root/reference as the numerical oracle (SURVEY.md section 4: the
reference's house idiom is "run both, compare max-abs-diff").
"""

import os
import sys

# OIP_TPU_TESTS=1 selects the on-hardware tier (`pytest -m tpu`): jax keeps
# its real default backend (the TPU) and the @pytest.mark.tpu tests run
# compiled Mosaic kernels against CPU-computed oracles. Everything below that
# pins CPU is skipped in that mode.
TPU_TIER = os.environ.get("OIP_TPU_TESTS") == "1"

if not TPU_TIER:
    # Must be set before jax is imported anywhere.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment may expose a TPU through a PJRT plugin that registers itself
# regardless of JAX_PLATFORMS; pin the default device to CPU so the whole test
# suite runs on the virtual 8-device CPU mesh and never touches the TPU tunnel.
import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
else:
    # Persistent compile cache for the hardware tier: re-verification runs
    # (the tier's whole purpose) skip the ~10 min of cold compiles. Safe for
    # skew detection — libtpu/JAX version bumps change the cache keys.
    _cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            os.path.expanduser("~/.cache/oip_tpu_xla"))
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-hardware tier — compiled Pallas/Mosaic kernels vs CPU "
        "oracles; needs a real TPU and OIP_TPU_TESTS=1 (run: "
        "OIP_TPU_TESTS=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if TPU_TIER:
        # On-hardware session: run ONLY the tpu tier (the CPU tier assumes the
        # virtual 8-device mesh that this session doesn't set up).
        skip = _pytest.mark.skip(reason="CPU-tier test (OIP_TPU_TESTS=1 set)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = _pytest.mark.skip(
            reason="TPU-hardware tier; run OIP_TPU_TESTS=1 pytest -m tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)

import numpy as np
import pytest

REFERENCE_PATH = os.environ.get("REFERENCE_PATH", "/root/reference")
_HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE_PATH, "pytorch_model"))
if _HAVE_REFERENCE and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

requires_reference = pytest.mark.skipif(
    not _HAVE_REFERENCE, reason="reference repo not mounted at /root/reference"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def gray_image(rng):
    """A structured synthetic grayscale image (B=1, 1, 120, 160), values [0, 255]."""
    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        127.0
        + 80.0 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
        + 40.0 * ((xx // 20 + yy // 15) % 2)
        + rng.normal(0, 3.0, (h, w))
    ).astype(np.float32)
    img = np.clip(img, 0, 255)
    return img[None, None]


@pytest.fixture(scope="session")
def gray_image_pair(gray_image, rng):
    """A (img1, img2) pair where img2 is img1 shifted by (5, 8) px with noise."""
    img1 = gray_image
    img2 = np.roll(np.roll(img1, 5, axis=2), 8, axis=3).copy()
    img2 += rng.normal(0, 2.0, img2.shape).astype(np.float32)
    img2 = np.clip(img2, 0, 255).astype(np.float32)
    return img1, img2

"""Pallas TPU kernels + the one platform rule that routes to them.

Every op with a kernel backend (sparse sampler, select frontend, Sinkhorn)
resolves its ``use_pallas="auto"`` default through :func:`use_pallas_default`
so the detect/select/describe/match stages can never disagree about the
platform.
"""

from __future__ import annotations

import jax


def use_pallas_default() -> bool:
    """Pallas kernels on TPU-like default devices, XLA paths on CPU.

    ``jax_default_device`` wins when set (what tests/conftest.py and the
    CLIs' ``--platform cpu`` pin use — the axon TPU plugin ignores
    ``JAX_PLATFORMS=cpu``, so the backend name alone is not trustworthy);
    otherwise the default backend decides.
    """
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform != "cpu"

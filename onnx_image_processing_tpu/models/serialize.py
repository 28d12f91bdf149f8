"""Serialized deployable artifacts: StableHLO export / reload for pipelines.

The reference's deployable product is a set of .onnx files exported per model
and attached to GitHub releases (`onnx_export/export.py:103-160`,
`.github/workflows/release.yml:55-64`). The TPU-native equivalent is a
``jax.export`` artifact: the pipeline jitted at a static shape, lowered to
StableHLO, and serialized with its calling convention — loadable by any JAX
process (same major serialization version) without this package's Python code
on the import path of the consumer graph.

Artifacts are per-platform (the Pallas descriptor sampler lowers to a TPU
custom call; CPU artifacts trace the jnp oracle path instead), so files are
named ``<pipeline>.<platform>.jaxexport``.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.export
import jax.numpy as jnp

from ..core.config import MatcherConfig
from . import registry

_SUFFIX = ".jaxexport"


def export_model(name: str, height: int, width: int, batch: int = 1,
                 cfg: MatcherConfig | None = None,
                 platform: str | None = None,
                 **overrides) -> jax.export.Exported:
    """Lower a registry pipeline to a serializable ``jax.export.Exported``.

    ``platform``: 'cpu' / 'tpu'; None = the current default backend. The
    descriptor sampling backend follows the platform (Pallas kernel on TPU,
    jnp path on CPU) unless the config pins ``use_pallas`` explicitly.
    """
    spec = registry.get(name)
    if platform is not None and "use_pallas" not in overrides and (
            cfg is None or cfg.use_pallas is None):
        overrides["use_pallas"] = platform == "tpu"
    fn = registry.build(name, cfg, **overrides)
    resolved = registry.resolve_config(spec, cfg, **overrides)
    args = registry.arg_specs(spec, resolved, height, width, batch)
    platforms = (platform,) if platform is not None else None
    return jax.export.export(fn, platforms=platforms)(*args)


def artifact_path(out_dir: str, name: str, platform: str) -> str:
    return os.path.join(out_dir, f"{name}.{platform}{_SUFFIX}")


def save_exported(exported: jax.export.Exported, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def export_to_dir(out_dir: str, names: Sequence[str] | None = None,
                  height: int = 480, width: int = 640, batch: int = 1,
                  platform: str | None = None, **overrides) -> list[str]:
    """Serialize every named pipeline (default: all) into ``out_dir``.

    The batch-export analogue of the reference's `onnx_export/export.py`
    registry loop. Returns the written paths.
    """
    names = list(names) if names else registry.names()
    if platform is None:
        platform = jax.default_backend()
    paths = []
    for name in names:
        exported = export_model(name, height, width, batch=batch,
                                platform=platform, **overrides)
        paths.append(save_exported(
            exported, artifact_path(out_dir, name, platform)))
    return paths


def load_exported(path: str) -> Callable:
    """Load a serialized artifact; returns a callable running the pipeline.

    The deserialization counterpart of the reference's
    ``onnxruntime.InferenceSession(model_path)`` (`sample/provider_utils.py`).
    """
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return jax.jit(exported.call)

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


# ---------------------------------------------------------------------------
# Shape-polymorphic ("dynamic axes") input specs.
#
# The reference ships dynamic-shape .onnx artifacts for its tensor-input
# standalones: the E estimator's dynamic N/M
# (`onnx_export/export_essential_matrix_estimator.py:132-179`), voxel
# downsampling's dynamic N (`export_voxel_downsampling.py:51-76`), and
# --dynamic-axes on the matcher exports. The jax.export equivalent is a
# symbolic-dimension trace: ONE .jaxexport file serves every shape satisfying
# the scope constraints (each concrete shape still XLA-compiles once at load
# time, like an ORT session specializing a dynamic graph).
# ---------------------------------------------------------------------------

def _sym_args_sinkhorn(cfg: MatcherConfig):
    scope = jax.export.SymbolicScope(["n >= 1", "m >= 1"])
    b, n, m, d = jax.export.symbolic_shape("b, n, m, d", scope=scope)
    return (jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, d), jnp.float32))


def _sym_args_essential(cfg: MatcherConfig):
    from .registry import _essential_grid_side

    g = _essential_grid_side(cfg) ** 2
    # n/m >= 3: the bidirectional top-k needs top_k rows/cols;
    # n/m <= grid cells: every feature index must map onto the pixel grid.
    scope = jax.export.SymbolicScope(
        [f"n >= 3", f"m >= 3", f"n <= {g}", f"m <= {g}"])
    n, m = jax.export.symbolic_shape("n, m", scope=scope)
    return (jax.ShapeDtypeStruct((n + 1, m + 1), jnp.float32),
            jax.ShapeDtypeStruct((3, 3), jnp.float32))


def _sym_args_voxel(cfg: MatcherConfig):
    scope = jax.export.SymbolicScope(["n >= 1"])
    (n,) = jax.export.symbolic_shape("n", scope=scope)
    return (jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32))


def _sym_args_image_head(cfg: MatcherConfig):
    """Symbolic (B, 1, H, W) for the dense single-image heads (score /
    descriptor maps are pure stencils — no top-k or block reshapes, so the
    trace is fully shape-polymorphic)."""
    scope = jax.export.SymbolicScope(["h >= 32", "w >= 32"])
    b, h, w = jax.export.symbolic_shape("b, h, w", scope=scope)
    return (jax.ShapeDtypeStruct((b, 1, h, w), jnp.float32),)


def _sym_args_matcher(cfg: MatcherConfig):
    """Symbolic (1, 1, H, W) pair for the two-image composite matchers
    (round-4; one artifact serves every resolution, K static — reference
    dynamic-axes parity,
    `onnx_export/export_shi_tomasi_angle_sparse_bad_sinkhorn.py:185-248`).

    K (max_keypoints) and the per-pair descriptor structure stay
    compile-time (that part of the round-3 rationale stands: top-k counts
    and block tilings are static structure on TPU), but H/W are symbolic.
    The scope carries the one constraint the trace needs: the NMS block grid
    ceil(H/bs)*ceil(W/bs) must hold at least K candidates (written in the
    exact ceil-div form the trace compares, so the symbolic solver can
    decide ``lax.top_k``'s k <= n check)."""
    bs = cfg.nms_radius + 1
    k = cfg.max_keypoints
    scope = jax.export.SymbolicScope([
        "h >= 64", "w >= 64",
        f"floordiv(-h, {bs})*floordiv(-w, {bs}) >= {k}",
    ])
    h, w = jax.export.symbolic_shape("h, w", scope=scope)
    img = jax.ShapeDtypeStruct((1, 1, h, w), jnp.float32)
    return (img, img)


def _sym_args_matcher_k_inv(cfg: MatcherConfig):
    return _sym_args_matcher(cfg) + (jax.ShapeDtypeStruct((3, 3),
                                                          jnp.float32),)


def _sym_args_sparse_head(cfg: MatcherConfig):
    """Symbolic (1, 1, H, W) for the single-image SPARSE heads (keypoints +
    descriptors): same top-k block-grid constraint as the composite matchers
    (`_sym_args_matcher`), one image input."""
    return _sym_args_matcher(cfg)[:1]


#: pipelines exportable with symbolic dimensions -> arg-spec builder.
#: Round 5: EVERY registry name is here — full reference --dynamic-axes
#: parity (every reference export script takes the flag, e.g.
#: `onnx_export/export_akaze_sparse_bad_sinkhorn.py:203,268-280`,
#: `export_shi_tomasi_bad_sinkhorn.py:162-164`). K (max_keypoints) and the
#: descriptor pair count stay compile-time structure; H/W (and batch, for the
#: dense heads) are symbolic. The AKAZE FED ladder is a pure stencil loop
#: (static scale/iteration counts, zero-padded convs), so it traces
#: symbolically like the Shi-Tomasi stencils — nothing blocks it.
POLYMORPHIC_EXPORTS = {
    "sinkhorn": _sym_args_sinkhorn,
    "essential_matrix_estimator": _sym_args_essential,
    "voxel_downsampling": _sym_args_voxel,
    # dense single-image heads (symbolic B, H, W — pure stencils)
    "shi_tomasi": _sym_args_image_head,
    "fast": _sym_args_image_head,
    "dog": _sym_args_image_head,
    "dog_with_score": _sym_args_image_head,
    "bad": _sym_args_image_head,
    "shi_tomasi_angle": _sym_args_image_head,
    "shi_tomasi_bad": _sym_args_image_head,
    "akaze": _sym_args_image_head,
    # sparse single-image head (symbolic H/W under the top-k constraint)
    "shi_tomasi_angle_sparse_bad": _sym_args_sparse_head,
    # composite two-image matchers (+extraction/essential variants)
    "shi_tomasi_bad_sinkhorn": _sym_args_matcher,
    "shi_tomasi_bad_sinkhorn_extraction": _sym_args_matcher,
    "shi_tomasi_sparse_bad_sinkhorn": _sym_args_matcher,
    "shi_tomasi_sparse_bad_sinkhorn_extraction": _sym_args_matcher,
    "shi_tomasi_angle_sparse_bad_sinkhorn": _sym_args_matcher,
    "shi_tomasi_angle_sparse_bad_sinkhorn_with_filters": _sym_args_matcher,
    "shi_tomasi_angle_sparse_bad_sinkhorn_with_filters_extraction":
        _sym_args_matcher,
    "shi_tomasi_angle_sparse_bad_sinkhorn_extraction": _sym_args_matcher,
    "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix":
        _sym_args_matcher_k_inv,
    "akaze_sparse_bad_sinkhorn": _sym_args_matcher,
    "akaze_sparse_bad_sinkhorn_extraction": _sym_args_matcher,
    "akaze_sparse_bad_sinkhorn_essential_matrix": _sym_args_matcher_k_inv,
}


def export_model_polymorphic(name: str, cfg: MatcherConfig | None = None,
                             platform: str | None = None,
                             **overrides) -> jax.export.Exported:
    """Lower a pipeline with symbolic input dimensions (dynamic-axes parity).

    Every registry pipeline supports this (``POLYMORPHIC_EXPORTS`` covers all
    24 names); keypoint/match counts stay compile-time structure (top-k counts
    and block tilings are static on TPU), image H/W — and batch, for the dense
    heads — are symbolic.
    """
    if name not in POLYMORPHIC_EXPORTS:
        raise ValueError(
            f"{name!r} has no shape-polymorphic export; available: "
            f"{sorted(POLYMORPHIC_EXPORTS)}")
    spec = registry.get(name)
    if platform is not None and "use_pallas" not in overrides and (
            cfg is None or cfg.use_pallas is None):
        overrides["use_pallas"] = platform == "tpu"
    fn = registry.build(name, cfg, **overrides)
    resolved = registry.resolve_config(spec, cfg, **overrides)
    args = POLYMORPHIC_EXPORTS[name](resolved)
    platforms = (platform,) if platform is not None else None
    return jax.export.export(fn, platforms=platforms)(*args)


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


def export_streaming(name: str, height: int, width: int, batch: int = 1,
                     cfg: MatcherConfig | None = None,
                     platform: str | None = None,
                     **overrides) -> tuple[jax.export.Exported,
                                           jax.export.Exported]:
    """Serialize the streaming split (`models/streaming.py`) as TWO artifacts.

    Returns ``(extract, match)`` Exported objects: ``extract`` takes one
    (B, 1, H, W) image and emits the (keypoints, scores, descriptors)
    feature set; ``match`` takes two feature sets (+ ``k_inv`` for the
    essential pipelines) and emits the matcher outputs. Together they are
    the deployable form of the VO CLI's default serving mode — a consumer
    caches the previous frame's features and runs detect/describe once per
    frame, which no single two-image artifact can express (the reference's
    ONNX graphs recompute both frames every ``session.run``).
    """
    from .streaming import build_streaming

    base = name.removesuffix("_extraction")
    spec = registry.get(base)
    if platform is not None and "use_pallas" not in overrides and (
            cfg is None or cfg.use_pallas is None):
        overrides["use_pallas"] = platform == "tpu"
    extract, match = build_streaming(name, cfg, **overrides)
    resolved = registry.resolve_config(spec, cfg, **overrides)
    img = jax.ShapeDtypeStruct((batch, 1, height, width), jnp.float32)
    k, p = resolved.max_keypoints, resolved.num_pairs
    feats = (jax.ShapeDtypeStruct((batch, k, 2), jnp.float32),
             jax.ShapeDtypeStruct((batch, k), jnp.float32),
             jax.ShapeDtypeStruct((batch, k, p), jnp.float32))
    extra = ((jax.ShapeDtypeStruct((3, 3), jnp.float32),)
             if spec.takes_k_inv else ())
    platforms = (platform,) if platform is not None else None
    exported_extract = jax.export.export(extract, platforms=platforms)(img)
    exported_match = jax.export.export(match, platforms=platforms)(
        feats, feats, *extra)
    return exported_extract, exported_match


def artifact_path(out_dir: str, name: str, platform: str,
                  polymorphic: bool = False) -> str:
    tag = ".poly" if polymorphic else ""
    return os.path.join(out_dir, f"{name}{tag}.{platform}{_SUFFIX}")


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

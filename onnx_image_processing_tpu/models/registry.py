"""Pipeline registry: name → compiled executable.

The TPU-native analogue of the reference's export layer (`onnx_export/export.py:21-62`
registry + one `torch.onnx.export` script per model, SURVEY.md §3.1): "exporting" a
model here means binding a pipeline function to a config and lowering it through
``jax.jit`` with static shapes. ``build()`` returns a callable whose first call
compiles (and caches) the XLA executable; ``compile_model()`` AOT-lowers for a
given image shape, which is the compile-check the reference CI performs with
``onnx.checker`` (`.github/workflows/onnx-export.yml:35-97`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.config import MatcherConfig
from ..ops import dog_responses, dog_score, fast_score, shi_tomasi_score
from .shi_tomasi_family import (
    shi_tomasi_bad_detect,
    shi_tomasi_with_angle,
    shi_tomasi_angle_sparse_bad_detect,
    shi_tomasi_bad_sinkhorn_match,
    shi_tomasi_sparse_bad_sinkhorn_match,
    shi_tomasi_angle_sparse_bad_sinkhorn_match,
    shi_tomasi_angle_sparse_bad_sinkhorn_match_with_filters,
)
from .akaze_family import akaze_detect_cfg, akaze_sparse_bad_sinkhorn_match
from .essential_family import (
    shi_tomasi_angle_sparse_bad_sinkhorn_essential_match,
    akaze_sparse_bad_sinkhorn_essential_match,
)
from .extraction import with_match_extraction


@dataclass(frozen=True)
class PipelineSpec:
    name: str
    fn: Callable            # fn(*inputs, cfg) -> outputs
    n_images: int           # image-input count (0 for tensor-input pipelines)
    defaults: MatcherConfig
    description: str = ""
    takes_k_inv: bool = False  # essential-matrix pipelines take a (3,3) K^-1
    # Single-image heads that run NMS/top-k keypoint SELECTION (sparse
    # detect+describe heads). Symbolic/export shape choices must satisfy the
    # top-k block-grid constraint ceil(H/bs)*ceil(W/bs) >= max_keypoints for
    # these, exactly as for the two-image matchers — arg builders branch on
    # `n_images == 2 or selects_keypoints`, never on pipeline names.
    selects_keypoints: bool = False
    # Non-image pipelines (standalone Sinkhorn / E estimator / voxel
    # downsampling — reference export_{sinkhorn,essential_matrix_estimator,
    # voxel_downsampling}.py) describe their inputs here:
    # (cfg, height, width, batch) -> tuple[jax.ShapeDtypeStruct].
    make_args: Callable | None = None


def arg_specs(spec: "PipelineSpec", cfg: MatcherConfig, height: int,
              width: int, batch: int = 1) -> tuple:
    """Abstract input shapes for AOT lowering / export / verification."""
    if spec.make_args is not None:
        return tuple(spec.make_args(cfg, height, width, batch))
    args = [jax.ShapeDtypeStruct((batch, 1, height, width), jnp.float32)
            for _ in range(spec.n_images)]
    if spec.takes_k_inv:
        args.append(jax.ShapeDtypeStruct((3, 3), jnp.float32))
    return tuple(args)


_REGISTRY: dict[str, PipelineSpec] = {}


def register(spec: PipelineSpec) -> None:
    _REGISTRY[spec.name] = spec


def names() -> list[str]:
    return sorted(_REGISTRY)


def get(name: str) -> PipelineSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown pipeline {name!r}; available: {names()}")
    return _REGISTRY[name]


def resolve_config(spec: "PipelineSpec", cfg: MatcherConfig | None = None,
                   **overrides) -> MatcherConfig:
    """The ONE config-resolution rule: explicit cfg (else the spec defaults)
    with flat overrides folded in. Shared by build/compile/export/verify so
    traced functions and their arg_specs can never disagree."""
    return ((cfg or spec.defaults).with_(**overrides)
            if (cfg or overrides) else spec.defaults)


def build(name: str, cfg: MatcherConfig | None = None, **overrides) -> Callable:
    """Bind a pipeline to a config and wrap in ``jax.jit``.

    Returns a jitted callable taking ``n_images`` (B, 1, H, W) arrays.
    """
    spec = get(name)
    cfg = resolve_config(spec, cfg, **overrides)

    def fn(*images):
        return spec.fn(*images, cfg)

    fn.__name__ = name
    return jax.jit(fn)


def build_batched(name: str, cfg: MatcherConfig | None = None,
                  chunk: int | None = 6, **overrides) -> Callable:
    """`build`, composed for multi-pair single-chip THROUGHPUT serving.

    Returns a jitted callable over (B, 1, H, W) image batches that runs B
    independent single-pair pipelines under ``jax.vmap`` instead of one
    stacked (2B)-image batch. Measured on v5e (BASELINE.md batch-scaling):
    the stacked layout triggers an XLA layout pathology in the fused
    multi-pair graph (NMS reduce_window 36 -> 756 us at B=2), while this
    composition keeps every stage's B=1-native layout. With the fused Pallas
    select frontend (round 4) the vmapped rate is flat ~0.47-0.48 ms/pair at
    B in {6, 8} (~2,100 pairs/s); batches beyond ``chunk`` (default 6) run as
    sequential chunk-sized sub-batches via ``lax.map`` — any remainder
    (B % chunk pairs) executes as one final smaller sub-batch — which holds
    that rate at any depth (B >= 12 monolithic graphs measurably degrade in
    the detect-stage fusions). Results are identical to the stacked call
    (tests/test_parallel.py::test_vmap_pairs_matches_stacked); ``chunk=None``
    restores the monolithic vmap. For multi-chip scaling compose with
    `parallel.shard_batch` (one chunked stream per device).
    """
    from ..parallel import vmap_pairs

    return jax.jit(vmap_pairs(build(name, cfg, **overrides), chunk=chunk))


def compile_model(name: str, height: int, width: int, batch: int = 1,
                  cfg: MatcherConfig | None = None, **overrides):
    """AOT-compile a pipeline for a static image shape.

    Returns the compiled executable (``jax.stages.Compiled``) — the deployable
    artifact analogous to the reference's optimized .onnx file.
    """
    spec = get(name)
    fn = build(name, cfg, **overrides)
    resolved = resolve_config(spec, cfg, **overrides)
    return fn.lower(*arg_specs(spec, resolved, height, width, batch)).compile()


# ---------------------------------------------------------------------------
# Registered pipelines — names mirror the reference's export registry outputs
# (`onnx_export/export.py:21-62`) plus the standalone detector heads.
# ---------------------------------------------------------------------------

_BASE = MatcherConfig()
# Registry defaults follow the reference's *export* defaults — the shipped
# .onnx artifacts, not the module-constructor defaults: 512 pairs, 1024 kpts,
# hard binarization, epsilon 0.05, nms radius 5
# (`onnx_export/export.py:21-62`, `export_shi_tomasi_angle_sparse_bad_sinkhorn
# .py:84-143`; soft epsilon=1.0 dilutes P to ~1/K on real images).
_CI = MatcherConfig(num_pairs=512, max_keypoints=1024, binarize=True,
                    soft_binarize=False, epsilon=0.05, nms_radius=5)

register(PipelineSpec(
    "shi_tomasi",
    lambda img, cfg: shi_tomasi_score(img, block_size=cfg.block_size),
    1, _BASE, "Shi-Tomasi corner score map"))
register(PipelineSpec(
    "shi_tomasi_bad", shi_tomasi_bad_detect, 1, _BASE,
    "Shi-Tomasi scores + dense BAD descriptor map"))
# FAST/DoG standalone detectors (reference: export_fast.py, export_dog.py).
# Hyperparameters come from the config's nested FASTConfig/DoGConfig, so CLI
# overrides like fast_threshold=30 reach the op (reference flag parity:
# `export_fast.py:44-60` --threshold/--use-nms/--nms-radius,
# `export_dog.py:46-70` --num-scales/--sigma-base/--sigma-ratio/--kernel-size).
register(PipelineSpec(
    "fast",
    lambda img, cfg: fast_score(img, threshold=cfg.fast.threshold,
                                use_nms=cfg.fast.use_nms,
                                nms_radius=cfg.fast.nms_radius),
    1, _BASE, "FAST-9 binary corner score map"))
register(PipelineSpec(
    "dog",
    lambda img, cfg: dog_responses(img, num_scales=cfg.dog.num_scales,
                                   sigma_base=cfg.dog.sigma_base,
                                   sigma_ratio=cfg.dog.sigma_ratio,
                                   kernel_size=cfg.dog.kernel_size),
    1, _BASE, "Difference-of-Gaussians band responses"))
register(PipelineSpec(
    "dog_with_score",
    lambda img, cfg: dog_score(img, num_scales=cfg.dog.num_scales,
                               sigma_base=cfg.dog.sigma_base,
                               sigma_ratio=cfg.dog.sigma_ratio,
                               kernel_size=cfg.dog.kernel_size),
    1, _BASE, "DoG max-|response| score map"))
register(PipelineSpec(
    "shi_tomasi_angle", shi_tomasi_with_angle, 1,
    _BASE.with_(block_size=5), "Shi-Tomasi scores + orientation map"))
register(PipelineSpec(
    "shi_tomasi_angle_sparse_bad", shi_tomasi_angle_sparse_bad_detect, 1,
    _BASE.with_(block_size=5), "single-image keypoints + oriented descriptors",
    selects_keypoints=True))

register(PipelineSpec(
    "shi_tomasi_bad_sinkhorn", shi_tomasi_bad_sinkhorn_match, 2,
    _CI.with_(block_size=3), "dense-descriptor two-image matcher"))
register(PipelineSpec(
    "shi_tomasi_sparse_bad_sinkhorn", shi_tomasi_sparse_bad_sinkhorn_match,
    2, _CI.with_(block_size=3), "sparse unoriented matcher"))
register(PipelineSpec(
    "shi_tomasi_angle_sparse_bad_sinkhorn",
    shi_tomasi_angle_sparse_bad_sinkhorn_match, 2,
    _CI.with_(block_size=5), "rotation-invariant sparse matcher (flagship)"))
register(PipelineSpec(
    "shi_tomasi_angle_sparse_bad_sinkhorn_with_filters",
    shi_tomasi_angle_sparse_bad_sinkhorn_match_with_filters, 2,
    _CI.with_(block_size=5, ratio_threshold=2.0, dustbin_margin=0.3),
    "flagship matcher + in-graph outlier filters"))

register(PipelineSpec(
    "akaze", akaze_detect_cfg, 1, _BASE,
    "AKAZE scores + orientation maps"))
# AKAZE matcher export defaults: binarization "none", eps 0.05, nms radius 3
# (`onnx_export/export_akaze_sparse_bad_sinkhorn.py:103-167`); export.py adds
# 512 pairs / 1024 kpts.
register(PipelineSpec(
    "akaze_sparse_bad_sinkhorn", akaze_sparse_bad_sinkhorn_match, 2,
    MatcherConfig(num_pairs=512, max_keypoints=1024, epsilon=0.05, nms_radius=3),
    "AKAZE rotation-invariant sparse matcher"))

register(PipelineSpec(
    "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix",
    shi_tomasi_angle_sparse_bad_sinkhorn_essential_match, 2,
    _CI.with_(block_size=5), "flagship matcher + in-graph essential matrix",
    takes_k_inv=True))
register(PipelineSpec(
    "akaze_sparse_bad_sinkhorn_essential_matrix",
    akaze_sparse_bad_sinkhorn_essential_match, 2,
    MatcherConfig(num_pairs=512, max_keypoints=1024, epsilon=0.05, nms_radius=3),
    "AKAZE matcher + in-graph essential matrix", takes_k_inv=True))

# ---------------------------------------------------------------------------
# Standalone non-composite exports — the reference ships these as their own
# .onnx artifacts (`onnx_export/export_bad.py`, `export_sinkhorn.py`,
# `export_essential_matrix_estimator.py`, `export_voxel_downsampling.py`).
# ---------------------------------------------------------------------------

import math as _math

from ..geometry import estimate_essential_matrix
from ..ops import dense_bad, load_bad_params, sinkhorn_match, voxel_downsampling

register(PipelineSpec(
    "bad",
    lambda img, cfg: dense_bad(img, load_bad_params(cfg.num_pairs),
                               binarize=cfg.binarize,
                               soft_binarize=cfg.soft_binarize,
                               temperature=cfg.temperature),
    1, _BASE,
    "dense BAD descriptor map (standalone; reference export_bad.py with "
    "--binarization none|soft|hard = binarize/soft_binarize flags)"))

register(PipelineSpec(
    "sinkhorn",
    lambda d1, d2, cfg: sinkhorn_match(
        d1, d2, iterations=cfg.sinkhorn_iterations, epsilon=cfg.epsilon,
        unused_score=cfg.unused_score, distance_type=cfg.distance_type,
        use_pallas=cfg.use_pallas),
    0, _BASE,
    "standalone Sinkhorn matcher on (B, K, D) descriptor tensors "
    "(reference export_sinkhorn.py)",
    make_args=lambda cfg, h, w, b: (
        jax.ShapeDtypeStruct((b, cfg.max_keypoints, cfg.num_pairs),
                             jnp.float32),
        jax.ShapeDtypeStruct((b, cfg.max_keypoints, cfg.num_pairs),
                             jnp.float32))))


def _essential_grid_side(cfg: MatcherConfig) -> int:
    return max(2, _math.isqrt(cfg.max_keypoints))


register(PipelineSpec(
    "essential_matrix_estimator",
    lambda p, k_inv, cfg: estimate_essential_matrix(
        p, k_inv,
        image_shape=(_essential_grid_side(cfg), _essential_grid_side(cfg))),
    0, _BASE,
    "standalone grid-variant weighted-8-point E estimator on a Sinkhorn "
    "matrix (reference export_essential_matrix_estimator.py; feature index i "
    "maps to a sqrt(K) x sqrt(K) pixel grid)",
    make_args=lambda cfg, h, w, b: (
        jax.ShapeDtypeStruct((_essential_grid_side(cfg) ** 2 + 1,
                              _essential_grid_side(cfg) ** 2 + 1),
                             jnp.float32),
        jax.ShapeDtypeStruct((3, 3), jnp.float32))))

# Input point count for the standalone voxel-downsampling export. The
# reference uses dynamic N (`export_voxel_downsampling.py:76-82`); under XLA
# the executable is specialized per N, so the registry pins a deployment size
# (override via config-free recompile at any other N through the op itself).
VOXEL_EXPORT_POINTS = 8192

register(PipelineSpec(
    "voxel_downsampling",
    lambda pts, leaf, cfg: voxel_downsampling(pts, leaf),
    0, _BASE,
    "standalone voxel-grid downsampling: (N, 3) points + scalar leaf size -> "
    "(N, 3) centroids + validity mask (reference export_voxel_downsampling.py)",
    make_args=lambda cfg, h, w, b: (
        jax.ShapeDtypeStruct((VOXEL_EXPORT_POINTS, 3), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32))))


for _name in ("shi_tomasi_sparse_bad_sinkhorn",
              "shi_tomasi_angle_sparse_bad_sinkhorn",
              "shi_tomasi_angle_sparse_bad_sinkhorn_with_filters",
              "shi_tomasi_bad_sinkhorn",
              "akaze_sparse_bad_sinkhorn"):
    _spec = get(_name)
    register(PipelineSpec(
        _name + "_extraction", with_match_extraction(_spec.fn), 2,
        _spec.defaults, _spec.description + " + mutual-NN match extraction"))

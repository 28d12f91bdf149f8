"""Streaming (feature-cached) matchers for sequential frame workloads.

The reference's VO loop runs the FULL two-image matcher once per frame —
``session.run(prev, curr)`` (`sample/visual_odometry.py:542-550`) — so the
previous frame's detector/orientation/descriptor work is recomputed every
frame and thrown away. A single exported ONNX graph cannot cache
intermediates across ``session.run`` calls; a pair of jitted functions can.
This module splits every sparse matcher at its natural seam:

    extract(image)            -> (keypoints, scores, descriptors)   per frame
    match(feats_prev, feats_curr[, k_inv]) -> the matcher's outputs

``extract`` runs once per NEW frame; the caller keeps the previous frame's
(tiny) feature set on device — (K, 2) + (K,) + (K, P) ≈ 0.3 MB at K=512 —
instead of re-deriving it from the (H, W) image. Per-frame device time on
the flagship drops accordingly (detect + select + describe run once, not
twice; see BASELINE.md "streaming VO"). The reference-frame aging of the VO
robustness state machine composes naturally: the cached feature set IS the
reference frame, matched against each new frame until the loop refreshes it.

Outputs are BIT-IDENTICAL to the two-image graphs on CPU (pinned by
tests/test_streaming.py): the stacked pipelines are batch-parallel in every
stage — the two-image model literally runs ``extract`` at batch 2B and
splits (`shi_tomasi_family._sparse_detect_describe`,
`akaze_family.akaze_sparse_detect_describe`) — so extracting per image
computes the same values in the same order. On TPU the frontend (keypoints,
scores, descriptors incl. the Pallas sampler) stays bit-exact, while the
Sinkhorn tail's XLA fusions re-tile in the smaller graph and move P entries
by <= ~1e-5 absolute — two valid f32 evaluations of the same math, pinned at
that tolerance in the hardware tier
(`test_tpu_hardware.py::test_streaming_split_on_hardware`).

Reference seam this mirrors: the reference ships the SPLIT models too —
`export_shi_tomasi_angle_sparse_bad.py` (single-image detector+descriptor)
and `export_sinkhorn.py` (descriptor-tensor matcher) — but its samples never
compose them into a streaming loop; this module is that composition, with
the essential/filters tails included.
"""

from __future__ import annotations

from typing import Callable

import jax

from ..core.config import MatcherConfig
from ..ops import (
    extract_mutual_matches,
    sinkhorn_match,
    sinkhorn_match_with_filters,
)
from .akaze_family import akaze_sparse_detect_describe
from .essential_family import essential_from_match
from .shi_tomasi_family import _dense_detect_describe, _sparse_detect_describe


def _sinkhorn_cfg(desc1, desc2, cfg: MatcherConfig):
    return sinkhorn_match(desc1, desc2, iterations=cfg.sinkhorn_iterations,
                          epsilon=cfg.epsilon, unused_score=cfg.unused_score,
                          distance_type=cfg.distance_type,
                          use_pallas=cfg.use_pallas)


def _match_plain(feats1, feats2, cfg: MatcherConfig):
    (kpts1, _, desc1), (kpts2, _, desc2) = feats1, feats2
    return kpts1, kpts2, _sinkhorn_cfg(desc1, desc2, cfg)


def _match_with_filters(feats1, feats2, cfg: MatcherConfig):
    (kpts1, _, desc1), (kpts2, _, desc2) = feats1, feats2
    probs, valid = sinkhorn_match_with_filters(
        desc1, desc2, iterations=cfg.sinkhorn_iterations, epsilon=cfg.epsilon,
        unused_score=cfg.unused_score, distance_type=cfg.distance_type,
        ratio_threshold=cfg.ratio_threshold, dustbin_margin=cfg.dustbin_margin,
        use_pallas=cfg.use_pallas)
    return kpts1, kpts2, probs, valid


def _match_essential(feats1, feats2, k_inv, cfg: MatcherConfig):
    (kpts1, ks1, desc1), (kpts2, ks2, desc2) = feats1, feats2
    if kpts1.shape[0] != 1:
        # Same invariant as the two-image path (essential_family.py): the
        # solve consumes pair 0 only, so a bigger batch would silently
        # return an E fit to one pair.
        raise ValueError(
            f"essential-matrix pipelines require batch size 1, "
            f"got {kpts1.shape[0]}")
    probs = _sinkhorn_cfg(desc1, desc2, cfg)
    e = essential_from_match(kpts1, ks1, kpts2, ks2, probs, k_inv, cfg)
    return kpts1, kpts2, probs, e


def _angle_frontend(image, cfg):
    return _sparse_detect_describe(image, cfg, with_angle=True)


def _plain_frontend(image, cfg):
    return _sparse_detect_describe(image, cfg, with_angle=False)


# name -> (frontend(image, cfg) -> (kpts, scores, desc),
#          tail(feats1, feats2, *extra_inputs, cfg) -> matcher outputs,
#          takes_k_inv)
_STREAMING: dict[str, tuple[Callable, Callable, bool]] = {
    "shi_tomasi_bad_sinkhorn":
        (_dense_detect_describe, _match_plain, False),
    "shi_tomasi_sparse_bad_sinkhorn":
        (_plain_frontend, _match_plain, False),
    "shi_tomasi_angle_sparse_bad_sinkhorn":
        (_angle_frontend, _match_plain, False),
    "shi_tomasi_angle_sparse_bad_sinkhorn_with_filters":
        (_angle_frontend, _match_with_filters, False),
    "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix":
        (_angle_frontend, _match_essential, True),
    "akaze_sparse_bad_sinkhorn":
        (akaze_sparse_detect_describe, _match_plain, False),
    "akaze_sparse_bad_sinkhorn_essential_matrix":
        (akaze_sparse_detect_describe, _match_essential, True),
}


def streaming_names() -> list[str]:
    """Pipelines with a streaming split (plus their `_extraction` variants)."""
    return sorted(_STREAMING)


def supports_streaming(name: str) -> bool:
    return name.removesuffix("_extraction") in _STREAMING


def build_streaming(name: str, cfg: MatcherConfig | None = None,
                    **overrides) -> tuple[Callable, Callable]:
    """The streaming form of ``models.build(name)``: an (extract, match) pair.

    ``extract(image (B,1,H,W)) -> (keypoints (B,K,2), scores (B,K),
    descriptors (B,K,P))`` runs the per-image frontend;
    ``match(feats_prev, feats_curr[, k_inv])`` returns exactly what the
    two-image model returns for ``(image_prev, image_curr)`` — bit-identical
    on CPU, frontend-bit-exact with P at f32 fusion tolerance on TPU (see
    module docstring; tests/test_streaming.py + the hardware tier). Passing
    a ``*_extraction`` name appends the mutual-NN match extraction to
    ``match``'s outputs, mirroring ``with_match_extraction``.

    Sequential serving recipe (what the VO CLI does by default)::

        extract, match = models.build_streaming(name, **overrides)
        feats_ref = extract(frame0)
        for frame in frames[1:]:
            feats = extract(frame)
            out = match(feats_ref, feats)     # ~half the two-image cost
            ...
            feats_ref = feats                 # or keep it: reference aging

    Multi-stream serving: extract/match are batch-parallel, so B camera
    streams advance one frame per call at (B, 1, H, W). B=8 is the measured
    per-pair sweet spot on v5e; for deeper stream counts wrap both in
    ``parallel.chunk_batch(fn, 8)``, which holds the B=8 rate flat through
    B=24 (BASELINE.md batched-streaming table, round 5).
    """
    from .registry import get, resolve_config

    with_extraction = name.endswith("_extraction")
    base = name.removesuffix("_extraction")
    if base not in _STREAMING:
        raise KeyError(
            f"no streaming split for {name!r}; available: {streaming_names()} "
            "(+ their *_extraction variants)")
    frontend, tail, takes_k_inv = _STREAMING[base]
    resolved = resolve_config(get(base), cfg, **overrides)

    def extract(image):
        return frontend(image, resolved)

    if with_extraction:
        def match(feats1, feats2, *extra):
            kpts1, kpts2, probs, *extras = tail(feats1, feats2, *extra,
                                                resolved)
            mk1, mk2, scores, valid = extract_mutual_matches(
                probs, kpts1, kpts2, max_matches=resolved.max_matches,
                threshold=resolved.match_threshold)
            return (mk1, mk2, scores, valid, *extras)
    else:
        def match(feats1, feats2, *extra):
            return tail(feats1, feats2, *extra, resolved)

    extract.__name__ = f"{base}_streaming_extract"
    match.__name__ = f"{name}_streaming_match"
    return jax.jit(extract), jax.jit(match)

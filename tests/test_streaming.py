"""Streaming (feature-cached) matcher parity: bit-identical to the two-image
graphs.

The streaming split (`models/streaming.py`) exists so sequential workloads
(the VO loop) stop recomputing the previous frame's detect/describe work —
the reference's loop reruns the full two-image graph per frame
(`sample/visual_odometry.py:542-550`). Correctness contract: the composed
``match(extract(img1), extract(img2))`` must equal the two-image model's
``fn(img1, img2)`` BIT-EXACTLY — the stacked pipelines are batch-parallel in
every stage, so per-image extraction computes the same values.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_image_processing_tpu import models

_CPU_KW = dict(max_keypoints=64, use_pallas=False)


def _assert_trees_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("name", models.streaming_names())
def test_streaming_matches_two_image_bitexact(name, gray_image_pair):
    img1, img2 = (jnp.asarray(i) for i in gray_image_pair)
    spec = models.get(name)
    kw = dict(_CPU_KW)
    if name.startswith("akaze"):
        # Keep the AKAZE diffusion ladder cheap on CPU.
        kw["max_keypoints"] = 32
    extract, match = models.build_streaming(name, **kw)
    feats1, feats2 = extract(img1), extract(img2)
    if spec.takes_k_inv:
        k_inv = jnp.asarray(np.linalg.inv(np.array(
            [[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]], np.float32)))
        ours = match(feats1, feats2, k_inv)
        ref = models.build(name, **kw)(img1, img2, k_inv)
    else:
        ours = match(feats1, feats2)
        ref = models.build(name, **kw)(img1, img2)
    _assert_trees_equal(ours, ref)


def test_streaming_extraction_matches_wrapper(gray_image_pair):
    """The `_extraction` streaming variant mirrors with_match_extraction."""
    img1, img2 = (jnp.asarray(i) for i in gray_image_pair)
    name = "shi_tomasi_angle_sparse_bad_sinkhorn"
    extract, match = models.build_streaming(name + "_extraction",
                                            max_matches=32, **_CPU_KW)
    ours = match(extract(img1), extract(img2))
    ref = models.build(name + "_extraction", max_matches=32,
                       **_CPU_KW)(img1, img2)
    _assert_trees_equal(ours, ref)


def test_streaming_essential_ransac_bitexact(gray_image_pair):
    """The in-graph RANSAC tail also splits (its Gumbel table is a trace-time
    constant, identical in both graphs)."""
    img1, img2 = (jnp.asarray(i) for i in gray_image_pair)
    name = "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix"
    kw = dict(_CPU_KW, essential_ransac_hypotheses=32,
              essential_irls_iters=2)
    k_inv = jnp.asarray(np.linalg.inv(np.array(
        [[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]], np.float32)))
    extract, match = models.build_streaming(name, **kw)
    ours = match(extract(img1), extract(img2), k_inv)
    ref = models.build(name, **kw)(img1, img2, k_inv)
    _assert_trees_equal(ours, ref)


def test_streaming_essential_rejects_batched_features(gray_image_pair):
    """Same invariant as the two-image essential path: the solve consumes
    pair 0 only, so B>1 feature batches must fail loudly instead of silently
    returning an E fit to one pair."""
    img1, img2 = (jnp.asarray(i) for i in gray_image_pair)
    name = "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix"
    k_inv = jnp.asarray(np.linalg.inv(np.array(
        [[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]], np.float32)))
    extract, match = models.build_streaming(name, **_CPU_KW)
    feats1 = extract(jnp.concatenate([img1, img1], axis=0))
    feats2 = extract(jnp.concatenate([img2, img2], axis=0))
    with pytest.raises(ValueError, match="batch size 1"):
        match(feats1, feats2, k_inv)


def test_streaming_feature_cache_reuse(gray_image_pair):
    """The point of the split: a cached feature set matches against several
    new frames without re-extraction, each result equal to the two-image
    model on the corresponding pair (the VO reference-aging access pattern).
    """
    img1, img2 = (jnp.asarray(i) for i in gray_image_pair)
    img3 = jnp.roll(img2, 3, axis=3)
    name = "shi_tomasi_angle_sparse_bad_sinkhorn"
    extract, match = models.build_streaming(name, **_CPU_KW)
    fn = models.build(name, **_CPU_KW)
    feats_ref = extract(img1)
    for frame in (img2, img3):
        _assert_trees_equal(match(feats_ref, extract(frame)),
                            fn(img1, frame))


def test_streaming_unknown_name_raises():
    with pytest.raises(KeyError, match="no streaming split"):
        models.build_streaming("shi_tomasi")


def test_supports_streaming():
    assert models.supports_streaming("akaze_sparse_bad_sinkhorn")
    assert models.supports_streaming(
        "shi_tomasi_angle_sparse_bad_sinkhorn_extraction")
    assert not models.supports_streaming("fast")

"""Differential tests: detector/orientation/keypoint ops vs the reference PyTorch code."""

import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from onnx_image_processing_tpu.ops import (
    shi_tomasi_score,
    angle_estimation,
    nms_maxpool,
    select_topk_keypoints,
)


@requires_reference
@pytest.mark.parametrize("block_size", [3, 5])
def test_shi_tomasi_matches_reference(gray_image, block_size):
    import torch
    from pytorch_model.detector.shi_tomasi import ShiTomasiScore

    ref = ShiTomasiScore(block_size=block_size)
    with torch.no_grad():
        expected = ref(torch.from_numpy(gray_image)).numpy()

    got = np.asarray(shi_tomasi_score(jnp.asarray(gray_image), block_size=block_size))
    scale = max(1.0, np.abs(expected).max())
    np.testing.assert_allclose(got, expected, atol=1e-3 * scale, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("patch_size,sigma", [(15, 2.5), (7, 1.5)])
def test_angle_estimation_matches_reference(gray_image, patch_size, sigma):
    import torch
    from pytorch_model.orientation.angle_estimation import AngleEstimator

    ref = AngleEstimator(patch_size=patch_size, sigma=sigma)
    with torch.no_grad():
        expected = ref(torch.from_numpy(gray_image)).numpy()

    got = np.asarray(angle_estimation(jnp.asarray(gray_image), patch_size=patch_size, sigma=sigma))
    # atan2 output: compare angle difference modulo 2*pi.
    d = np.abs(np.angle(np.exp(1j * (got - expected))))
    assert d.max() < 1e-3


@requires_reference
def test_nms_topk_matches_reference(gray_image):
    import torch
    from pytorch_model.detector.shi_tomasi import ShiTomasiScore
    from pytorch_model.utils.keypoint_utils import apply_nms_maxpool, select_topk_keypoints as ref_topk

    with torch.no_grad():
        scores_t = ShiTomasiScore(block_size=5)(torch.from_numpy(gray_image)).squeeze(1)
        mask_t = apply_nms_maxpool(scores_t, nms_radius=3)
        kpts_t, ks_t = ref_topk(scores_t, mask_t, 128, 0.0, 16)

    scores_j = shi_tomasi_score(jnp.asarray(gray_image), block_size=5)[:, 0]
    mask_j = nms_maxpool(scores_j, 3)
    kpts_j, ks_j = select_topk_keypoints(scores_j, mask_j, 128, 0.0, 16)

    # NMS masks must agree except at near-tie pixels.
    agree = (np.asarray(mask_j) == mask_t.numpy()).mean()
    assert agree > 0.999

    # Keypoints compared as sets (top-k tie order may differ between backends).
    set_ref = {tuple(p) for p in kpts_t[0].numpy().astype(int) if p[0] >= 0}
    set_jax = {tuple(p) for p in np.asarray(kpts_j[0]).astype(int) if p[0] >= 0}
    inter = len(set_ref & set_jax)
    assert inter >= 0.98 * max(len(set_ref), 1), (len(set_ref), len(set_jax), inter)

    # Scores of selected keypoints agree as sorted multisets.
    np.testing.assert_allclose(
        np.sort(np.asarray(ks_j[0]))[::-1], np.sort(ks_t[0].numpy())[::-1],
        rtol=1e-3, atol=1e-2,
    )


def test_topk_block_path_equals_sort_path():
    """The block-reduced top-k (nms_radius hint) must produce the same keypoint
    set and scores as the flat-sort path on continuous score maps — the NMS
    distance guarantee makes the per-block max reduction lossless."""
    rng = np.random.default_rng(7)
    for r in (1, 2, 3, 5):
        scores = jnp.asarray(rng.uniform(0, 10, (2, 120, 161)).astype(np.float32))
        mask = nms_maxpool(scores, r)
        k_sort, s_sort = select_topk_keypoints(scores, mask, 200, 0.0, 4)
        k_blk, s_blk = select_topk_keypoints(scores, mask, 200, 0.0, 4,
                                             nms_radius=r)
        np.testing.assert_allclose(np.asarray(s_sort), np.asarray(s_blk),
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(k_sort), np.asarray(k_blk))


def test_topk_block_path_tiny_map_falls_back():
    """Fewer blocks than requested slots -> the flat path must kick in."""
    rng = np.random.default_rng(3)
    scores = jnp.asarray(rng.uniform(0, 1, (1, 24, 32)).astype(np.float32))
    mask = nms_maxpool(scores, 5)
    k_blk, s_blk = select_topk_keypoints(scores, mask, 64, 0.0, 0, nms_radius=5)
    k_sort, s_sort = select_topk_keypoints(scores, mask, 64, 0.0, 0)
    np.testing.assert_array_equal(np.asarray(k_blk), np.asarray(k_sort))
    np.testing.assert_allclose(np.asarray(s_blk), np.asarray(s_sort))


def test_topk_pads_invalid_with_minus_one(gray_image):
    scores = shi_tomasi_score(jnp.asarray(gray_image))[:, 0]
    mask = nms_maxpool(scores, 3)
    # Absurdly high threshold: nothing survives.
    kpts, ks = select_topk_keypoints(scores, mask, 64, score_threshold=1e12)
    assert np.all(np.asarray(kpts) == -1.0)
    assert np.all(np.asarray(ks) == 0.0)


@requires_reference
def test_angle_multiscale_matches_reference(gray_image):
    """The reference's multiscale estimator always returns scale 0 and warns
    (`orientation/angle_estimation.py:175-295`); we reproduce that contract."""
    import warnings

    import torch
    from pytorch_model.orientation.angle_estimation import AngleEstimatorMultiScale

    from onnx_image_processing_tpu.ops import angle_estimation_multiscale

    with torch.no_grad(), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = AngleEstimatorMultiScale(num_scales=3)
        out = ref(torch.from_numpy(gray_image))
        exp_angles = (out[0] if isinstance(out, (tuple, list)) else out).numpy()

    angles, scale_idx = angle_estimation_multiscale(jnp.asarray(gray_image),
                                                    num_scales=3)
    np.testing.assert_allclose(np.asarray(angles), exp_angles, atol=1e-4)
    assert float(np.abs(np.asarray(scale_idx)).max()) == 0.0


def test_subpixel_refinement_matches_host(gray_image):
    """In-graph parabola refinement must match the host implementation used by
    the feature_detection CLI."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu.ops import (
        nms_maxpool, select_topk_keypoints, shi_tomasi_score,
        refine_keypoints_subpixel)
    from onnx_image_processing_tpu.utils import (
        refine_keypoints_subpixel as host_refine)

    scores = shi_tomasi_score(jnp.asarray(gray_image), block_size=5)[:, 0]
    kpts, ks = select_topk_keypoints(scores, nms_maxpool(scores, 3), 64)
    ref_k, ref_s = refine_keypoints_subpixel(scores, kpts, ks)

    host_in = np.concatenate([np.asarray(kpts)[0], np.asarray(ks)[0][:, None]],
                             axis=1)
    valid = host_in[:, 0] >= 0
    host_out = host_refine(np.asarray(scores)[0], host_in[valid])
    np.testing.assert_allclose(np.asarray(ref_k)[0][valid], host_out[:, :2],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_s)[0][valid], host_out[:, 2],
                               atol=1e-3, rtol=1e-4)


def test_topk_approx_mode_plumbing():
    """topk_mode="approx" wiring: on CPU lax.approx_max_k falls back to the
    exact reduction, so the approx path must reproduce the block path bit
    for bit here (the approximation itself is bounded on hardware by
    tests/test_tpu_hardware.py::test_approx_topk_recall_on_hardware —
    measured recall 1.000 @480p, 0.990 @1080p)."""
    rng = np.random.default_rng(11)
    scores = jnp.asarray(rng.uniform(0, 10, (2, 120, 161)).astype(np.float32))
    mask = nms_maxpool(scores, 5)
    k_blk, s_blk = select_topk_keypoints(scores, mask, 100, 0.0, 4,
                                         nms_radius=5)
    k_apx, s_apx = select_topk_keypoints(scores, mask, 100, 0.0, 4,
                                         nms_radius=5, approx=True)
    np.testing.assert_array_equal(np.asarray(k_blk), np.asarray(k_apx))
    np.testing.assert_allclose(np.asarray(s_blk), np.asarray(s_apx))

    # Unknown topk_mode must raise at config construction (covers every
    # pipeline path, incl. the fused front-end's selector).
    import pytest as _pytest

    from onnx_image_processing_tpu.core import MatcherConfig

    with _pytest.raises(ValueError, match="unknown topk_mode"):
        MatcherConfig(max_keypoints=16, topk_mode="blok", use_pallas=False)
    with _pytest.raises(ValueError, match="unknown topk_mode"):
        MatcherConfig().with_(topk_mode="blok")

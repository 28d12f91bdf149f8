"""Differential tests: FAST, DoG, AKAZE detectors vs the reference PyTorch code."""

import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from onnx_image_processing_tpu.ops import (
    fast_score,
    dog_responses,
    dog_score,
    nonlinear_diffusion,
    hessian_score,
    akaze_detect,
)


@requires_reference
@pytest.mark.parametrize("threshold,use_nms", [(20, False), (10, True)])
def test_fast_matches_reference(gray_image, threshold, use_nms):
    import torch
    from pytorch_model.detector.fast import FASTScore

    ref = FASTScore(threshold=threshold, use_nms=use_nms, nms_radius=3)
    with torch.no_grad():
        expected = ref(torch.from_numpy(gray_image)).numpy()

    got = np.asarray(fast_score(jnp.asarray(gray_image), threshold=float(threshold),
                                use_nms=use_nms, nms_radius=3))
    np.testing.assert_array_equal(got, expected)


def test_fast_detects_synthetic_corner():
    """A bright square on dark background must fire at its corners only."""
    img = np.zeros((1, 1, 32, 32), np.float32)
    img[:, :, 10:22, 10:22] = 200.0
    got = np.asarray(fast_score(jnp.asarray(img), threshold=20.0))[0, 0]
    assert got.sum() > 0
    # interior of the square is flat -> no detections
    assert got[13:19, 13:19].sum() == 0


@requires_reference
@pytest.mark.parametrize("num_scales", [3, 5])
def test_dog_matches_reference(gray_image, num_scales):
    import torch
    from pytorch_model.detector.dog import DoGDetector, DoGDetectorWithScore

    with torch.no_grad():
        exp_bands = DoGDetector(num_scales=num_scales)(torch.from_numpy(gray_image)).numpy()
        exp_score = DoGDetectorWithScore(num_scales=num_scales)(
            torch.from_numpy(gray_image)).numpy()

    got_bands = np.asarray(dog_responses(jnp.asarray(gray_image), num_scales=num_scales))
    got_score = np.asarray(dog_score(jnp.asarray(gray_image), num_scales=num_scales))
    np.testing.assert_allclose(got_bands, exp_bands, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got_score, exp_score, atol=2e-3, rtol=1e-4)


@requires_reference
def test_nonlinear_diffusion_matches_reference(gray_image):
    import torch
    from pytorch_model.detector.akaze import NonLinearDiffusion

    ref = NonLinearDiffusion(num_iterations=3, kappa=0.05)
    with torch.no_grad():
        expected = ref(torch.from_numpy(gray_image)).numpy()
    got = np.asarray(nonlinear_diffusion(jnp.asarray(gray_image),
                                         num_iterations=3, kappa=0.05))
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-5)


@requires_reference
def test_hessian_score_matches_reference(gray_image):
    import torch
    from pytorch_model.detector.akaze import HessianDetector, NonLinearDiffusion

    with torch.no_grad():
        diffused = NonLinearDiffusion(3, 0.05)(torch.from_numpy(gray_image))
        expected = HessianDetector(threshold=0.001, nms_size=5)(diffused).numpy()
    diffused_j = nonlinear_diffusion(jnp.asarray(gray_image), 3, 0.05)
    got = np.asarray(hessian_score(diffused_j, threshold=0.001, nms_size=5))
    # NMS equality comparisons can flip at float ties; compare off-tie values.
    close = np.isclose(got, expected, atol=1e-3, rtol=1e-4)
    assert close.mean() > 0.999


@requires_reference
def test_akaze_matches_reference(gray_image):
    import torch
    from pytorch_model.detector.akaze import AKAZE

    ref = AKAZE(num_scales=3, diffusion_iterations=3, kappa=0.05,
                threshold=0.001, nms_size=5)
    with torch.no_grad():
        s_e, o_e = ref(torch.from_numpy(gray_image))

    s, o = akaze_detect(jnp.asarray(gray_image), num_scales=3,
                        diffusion_iterations=3, kappa=0.05,
                        threshold=0.001, nms_size=5)
    s, o = np.asarray(s), np.asarray(o)
    close_s = np.isclose(s, s_e.numpy(), atol=1e-3, rtol=1e-4)
    assert close_s.mean() > 0.999
    # Orientation only matters where a detection exists; compare there, and only
    # where the score agrees (NMS tie flips change the selected scale).
    det = (s > 0) & (s_e.numpy() > 0) & close_s
    if det.any():
        do = np.abs(o - o_e.numpy())[det]
        assert np.quantile(do, 0.99) < 1e-3


@requires_reference
def test_registry_fast_hyperparams_reach_op(gray_image):
    """Reference export-flag parity (`export_fast.py:44-60`): building the
    'fast' registry entry with fast_threshold/fast_use_nms overrides must
    match the reference module at the same non-default settings."""
    import torch
    from pytorch_model.detector.fast import FASTScore

    from onnx_image_processing_tpu import models

    ref = FASTScore(threshold=30, use_nms=True, nms_radius=2)
    with torch.no_grad():
        expected = ref(torch.from_numpy(gray_image)).numpy()

    fn = models.build("fast", fast_threshold=30.0, fast_use_nms=True,
                      fast_nms_radius=2)
    got = np.asarray(fn(jnp.asarray(gray_image)))
    np.testing.assert_array_equal(got, expected)
    # And the default build must differ (i.e. the overrides actually bind).
    default = np.asarray(models.build("fast")(jnp.asarray(gray_image)))
    assert not np.array_equal(got, default)


@requires_reference
def test_registry_dog_hyperparams_reach_op(gray_image):
    """`export_dog.py:46-70` flag parity through the registry config."""
    import torch
    from pytorch_model.detector.dog import DoGDetectorWithScore

    from onnx_image_processing_tpu import models

    with torch.no_grad():
        expected = DoGDetectorWithScore(num_scales=4, sigma_base=2.0,
                                        sigma_ratio=1.5)(
            torch.from_numpy(gray_image)).numpy()
    fn = models.build("dog_with_score", dog_num_scales=4, dog_sigma_base=2.0,
                      dog_sigma_ratio=1.5)
    got = np.asarray(fn(jnp.asarray(gray_image)))
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-4)


def test_matcher_config_folds_prefixed_keys():
    from onnx_image_processing_tpu.core import MatcherConfig

    cfg = MatcherConfig().with_(fast_threshold=30.0, akaze_kappa=0.1,
                                dog_num_scales=4, max_keypoints=64)
    assert cfg.fast.threshold == 30.0 and cfg.fast.use_nms is False
    assert cfg.akaze.kappa == 0.1 and cfg.akaze.num_scales == 3
    assert cfg.dog.num_scales == 4 and cfg.max_keypoints == 64
    # from_kwargs ignores unknowns/Nones but folds known prefixed keys.
    cfg2 = MatcherConfig.from_kwargs(fast_use_nms=True, bogus_key=1,
                                     epsilon=None)
    assert cfg2.fast.use_nms is True and cfg2.epsilon == 1.0

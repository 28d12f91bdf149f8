"""Differential tests: BAD descriptors vs the reference PyTorch implementation."""

import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from onnx_image_processing_tpu.ops import (
    load_bad_params,
    dense_bad,
    sparse_bad,
    extract_descriptors_at_keypoints,
    extract_descriptors_at_keypoints_subpixel,
)


def _random_keypoints(rng, h, w, k, margin=0, n_invalid=5):
    y = rng.integers(margin, h - margin, size=k).astype(np.float32)
    x = rng.integers(margin, w - margin, size=k).astype(np.float32)
    kpts = np.stack([y, x], axis=-1)
    if n_invalid > 0:
        kpts[-n_invalid:] = -1.0
    return kpts[None]


@requires_reference
@pytest.mark.parametrize("num_pairs", [256, 512])
def test_dense_bad_unoriented(gray_image, num_pairs):
    import torch
    from pytorch_model.descriptor.bad import BADDescriptor

    # float64 oracle: the reference's float32 integral-image (double cumsum over a
    # replicate-padded image, bad.py:71) accumulates ~0.1 absolute error at 120x160;
    # our separable box sums are ~1e-4 from the true (float64) values, so parity is
    # checked against the reference run in double precision.
    ref = BADDescriptor(num_pairs=num_pairs, binarize=False).double()
    with torch.no_grad():
        expected = ref(torch.from_numpy(gray_image).double()).numpy()

    params = load_bad_params(num_pairs)
    got = np.asarray(dense_bad(jnp.asarray(gray_image), params))
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-4)


@requires_reference
def test_dense_bad_binarized(gray_image):
    import torch
    from pytorch_model.descriptor.bad import BADDescriptor

    for soft in (True, False):
        # float64 oracle — see test_dense_bad_unoriented.
        ref = BADDescriptor(num_pairs=256, binarize=True, soft_binarize=soft,
                            temperature=10.0).double()
        with torch.no_grad():
            expected = ref(torch.from_numpy(gray_image).double()).numpy()
        got = np.asarray(dense_bad(jnp.asarray(gray_image), load_bad_params(256),
                                   binarize=True, soft_binarize=soft, temperature=10.0))
        if soft:
            np.testing.assert_allclose(got, expected, atol=5e-3)
        else:
            assert (got == expected).mean() > 0.999  # hard bits may flip at exact ties


@requires_reference
@pytest.mark.parametrize("sampling_mode", ["nearest", "bilinear"])
def test_sparse_bad_unoriented(gray_image, rng, sampling_mode):
    import torch
    from pytorch_model.descriptor.bad import SparseBAD

    h, w = gray_image.shape[2:]
    kpts = _random_keypoints(rng, h, w, 64)

    ref = SparseBAD(num_pairs=256, normalize_descriptors=True, sampling_mode=sampling_mode)
    with torch.no_grad():
        expected = ref(torch.from_numpy(gray_image), torch.from_numpy(kpts)).numpy()

    got = np.asarray(sparse_bad(jnp.asarray(gray_image), jnp.asarray(kpts),
                                load_bad_params(256), sampling_mode=sampling_mode))
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


@requires_reference
def test_sparse_bad_oriented(gray_image, rng):
    import torch
    from pytorch_model.descriptor.bad import SparseBAD
    from pytorch_model.orientation.angle_estimation import AngleEstimator

    h, w = gray_image.shape[2:]
    kpts = _random_keypoints(rng, h, w, 64)
    with torch.no_grad():
        angles = AngleEstimator()(torch.from_numpy(gray_image))
        ref = SparseBAD(num_pairs=256, normalize_descriptors=True, sampling_mode="nearest")
        expected = ref(torch.from_numpy(gray_image), torch.from_numpy(kpts), angles).numpy()

    got = np.asarray(sparse_bad(jnp.asarray(gray_image), jnp.asarray(kpts),
                                load_bad_params(256),
                                orientation=jnp.asarray(angles.numpy())))
    # Nearest-neighbor rounding at half-integer rotated offsets can pick the
    # other pixel; compare with a small mismatched-element budget.
    close = np.isclose(got, expected, atol=2e-3, rtol=1e-3)
    assert close.mean() > 0.995, close.mean()


@requires_reference
def test_extract_descriptors(gray_image, rng):
    import torch
    from pytorch_model.descriptor.bad import (
        BADDescriptor,
        extract_descriptors_at_keypoints as ref_extract,
        extract_descriptors_at_keypoints_subpixel as ref_extract_sub,
    )

    h, w = gray_image.shape[2:]
    with torch.no_grad():
        dmap = BADDescriptor(num_pairs=256)(torch.from_numpy(gray_image))

    kpts_int = _random_keypoints(rng, h, w, 32, n_invalid=0)
    kpts_sub = kpts_int + rng.uniform(0, 0.9, kpts_int.shape).astype(np.float32)
    kpts_sub[..., 0] = np.clip(kpts_sub[..., 0], 0, h - 1)
    kpts_sub[..., 1] = np.clip(kpts_sub[..., 1], 0, w - 1)

    with torch.no_grad():
        exp_int = ref_extract(dmap, torch.from_numpy(kpts_int).long()).numpy()
        exp_sub = ref_extract_sub(dmap, torch.from_numpy(kpts_sub)).numpy()

    dmap_j = jnp.asarray(dmap.numpy())
    got_int = np.asarray(extract_descriptors_at_keypoints(dmap_j, jnp.asarray(kpts_int)))
    got_sub = np.asarray(extract_descriptors_at_keypoints_subpixel(dmap_j, jnp.asarray(kpts_sub)))
    np.testing.assert_allclose(got_int, exp_int, atol=1e-4)
    np.testing.assert_allclose(got_sub, exp_sub, atol=1e-3, rtol=1e-3)


@requires_reference
def test_dense_bad_oriented_matches_reference(gray_image):
    """Dense rotation-aware path (`bad.py:112-187`): conv bank + grid_sample at
    per-pixel rotated offsets. Small image — this path is O(H*W*P) gathers."""
    import torch
    from pytorch_model.descriptor.bad import BADDescriptor
    from pytorch_model.orientation.angle_estimation import AngleEstimator

    small = gray_image[:, :, :48, :64]
    with torch.no_grad():
        angles = AngleEstimator()(torch.from_numpy(small))
        ref = BADDescriptor(num_pairs=256, binarize=False)
        expected = ref(torch.from_numpy(small), angles).numpy()

    got = np.asarray(dense_bad(jnp.asarray(small), load_bad_params(256),
                               orientation=jnp.asarray(angles.numpy())))
    # Bilinear taps at rotated positions; borders clamp identically.
    np.testing.assert_allclose(got, expected, atol=5e-2, rtol=1e-3)


@requires_reference
def test_sparse_bad_tiny_image(rng):
    """Images smaller than the 56-px sampling window (edge-extension path)."""
    import torch
    from pytorch_model.descriptor.bad import SparseBAD

    img = rng.uniform(0, 255, (1, 1, 40, 50)).astype(np.float32)
    kpts = _random_keypoints(rng, 40, 50, 16, n_invalid=2)
    ref = SparseBAD(num_pairs=256, normalize_descriptors=True)
    with torch.no_grad():
        expected = ref(torch.from_numpy(img), torch.from_numpy(kpts)).numpy()
    got = np.asarray(sparse_bad(jnp.asarray(img), jnp.asarray(kpts),
                                load_bad_params(256)))
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_dense_oriented_tiled_equals_gather(gray_image):
    """The tiled route (pixel grid streamed through the sparse sampler) must
    reproduce the gather-formulation oriented dense map."""
    rng = np.random.default_rng(13)
    img = jnp.asarray(gray_image[:, :, :72, :96])
    theta = jnp.asarray(
        rng.uniform(-3, 3, (1, 1, 72, 96)).astype(np.float32))
    params = load_bad_params(256)
    g = np.asarray(dense_bad(img, params, orientation=theta,
                             oriented_route="gather"))
    t = np.asarray(dense_bad(img, params, orientation=theta,
                             oriented_route="tiled"))
    np.testing.assert_allclose(t, g, atol=2e-3)


@pytest.mark.parametrize("num_pairs", [256, 512])
def test_sample_layout_reconstruction(num_pairs):
    """The shared unique-box layout (ops/bad.sample_layout) must exactly
    reconstruct the learned pair table: off/radius at idx1/idx2 equal the
    original per-pair endpoints, groups are radius-contiguous, and the boxes
    on the sample axis are pairwise distinct within each radius group."""
    from onnx_image_processing_tpu.ops.bad import sample_layout

    params = load_bad_params(num_pairs)
    lay = sample_layout(params)
    s = lay.groups[-1][2]
    assert lay.off_y.shape == (s,) and lay.off_x.shape == (s,)
    assert s <= 2 * num_pairs  # dedup never grows the axis

    # Radius per sample slot from the group table.
    rad = np.empty(s, np.int32)
    prev_hi = 0
    for r, lo, hi in lay.groups:
        assert lo == prev_hi  # contiguous, in order
        rad[lo:hi] = r
        # boxes unique within the group
        boxes = set(zip(lay.off_y[lo:hi].tolist(), lay.off_x[lo:hi].tolist()))
        assert len(boxes) == hi - lo
        prev_hi = hi
    assert prev_hi == s

    np.testing.assert_array_equal(lay.off_y[lay.idx1], params.offset_y1)
    np.testing.assert_array_equal(lay.off_x[lay.idx1], params.offset_x1)
    np.testing.assert_array_equal(lay.off_y[lay.idx2], params.offset_y2)
    np.testing.assert_array_equal(lay.off_x[lay.idx2], params.offset_x2)
    np.testing.assert_array_equal(rad[lay.idx1], params.radii)
    np.testing.assert_array_equal(rad[lay.idx2], params.radii)

"""End-to-end differential tests: composite pipelines vs reference nn.Modules.

House idiom (SURVEY.md §4): run both implementations on the same inputs and
compare. Keypoints are compared as exact (y, x) rows where scores are distinct
(torch.topk vs lax.top_k tie order may differ — SURVEY.md §7), probabilities
to a small tolerance on rows whose keypoints agree.
"""

import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from onnx_image_processing_tpu.core import MatcherConfig
from onnx_image_processing_tpu import models


def _to_torch(x):
    import torch

    return torch.from_numpy(np.asarray(x))


def _kpt_set(kpts_row):
    return {tuple(p) for p in np.asarray(kpts_row).tolist()}


def _perm_to_ref(k_ours, k_ref):
    """Permutation ``perm`` with ``k_ours[perm[i]] == k_ref[i]``, keyed on the
    (y, x) rows; duplicate keys (the (-1, -1) invalid padding) are matched in
    order. Makes assignment comparisons permutation-invariant: torch.topk and
    lax.top_k order score ties differently, so P must be compared through the
    keypoint mapping, never gated on identical ordering."""
    ours = [tuple(q) for q in np.asarray(k_ours).tolist()]
    ref = [tuple(q) for q in np.asarray(k_ref).tolist()]
    pos = {}
    for i, t in enumerate(ours):
        pos.setdefault(t, []).append(i)
    return np.asarray([pos[t].pop(0) for t in ref], dtype=np.int64)


def _align_probs(p, k1, k2, k1_ref, k2_ref):
    """Reorder our (K+1, K+1) probability matrix into the reference's keypoint
    order (dustbin row/column stays last)."""
    perm1 = _perm_to_ref(k1, k1_ref)
    perm2 = _perm_to_ref(k2, k2_ref)
    k = len(perm1)
    rows = np.concatenate([perm1, [k]])
    cols = np.concatenate([perm2, [k]])
    return np.asarray(p)[rows][:, cols], perm1, perm2


@requires_reference
def test_shi_tomasi_bad_detector_parity(gray_image):
    import torch
    from pytorch_model.feature_detection import ShiTomasiBADDetector

    ref = ShiTomasiBADDetector(block_size=3, num_pairs=256)
    with torch.no_grad():
        s_e, d_e = ref(_to_torch(gray_image))

    cfg = MatcherConfig(block_size=3, num_pairs=256)
    s, d = models.shi_tomasi_bad_detect(jnp.asarray(gray_image), cfg)
    np.testing.assert_allclose(np.asarray(s), s_e.numpy(), atol=1e-2, rtol=1e-4)
    # Descriptor-map tolerance bounded by the reference's f32 integral-image
    # error (~0.1 at this size; exact-parity case covered by test_bad_parity's
    # float64 oracle).
    np.testing.assert_allclose(np.asarray(d), d_e.numpy(), atol=0.15, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("name,ref_cls_name,n_out", [
    ("shi_tomasi_sparse_bad_sinkhorn", "ShiTomasiSparseBADSinkhornMatcher", 3),
    ("shi_tomasi_angle_sparse_bad_sinkhorn", "ShiTomasiAngleSparseBADSinkhornMatcher", 3),
])
def test_sparse_matcher_parity(gray_image_pair, name, ref_cls_name, n_out):
    import torch
    import pytorch_model.feature_detection as ref_fd
    import pytorch_model.feature_detection.shi_tomasi_angle_sparse_bad_sinkhorn as ref_angle

    img1, img2 = gray_image_pair
    k = 128
    ref_cls = getattr(ref_fd, ref_cls_name, None) or getattr(ref_angle, ref_cls_name)
    ref = ref_cls(max_keypoints=k, num_pairs=256)
    with torch.no_grad():
        out_e = ref(_to_torch(img1), _to_torch(img2))

    # Reference modules built with *constructor* defaults; mirror them exactly
    # (the registry's own defaults follow the export-script defaults instead).
    block = 5 if "angle" in name else 3
    cfg = MatcherConfig(max_keypoints=k, num_pairs=256, block_size=block)
    fn = models.build(name, cfg)
    out = fn(jnp.asarray(img1), jnp.asarray(img2))

    assert len(out) == n_out
    k1, k2, p = (np.asarray(o) for o in out[:3])
    k1_e, k2_e, p_e = (o.numpy() for o in out_e[:3])

    # Keypoint sets must agree (ordering may differ at score ties).
    assert _kpt_set(k1[0]) == _kpt_set(k1_e[0])
    assert _kpt_set(k2[0]) == _kpt_set(k2_e[0])

    # Probability matrix compared through the keypoint mapping — asserted
    # unconditionally (never gated on identical top-k ordering).
    p_aligned, _, _ = _align_probs(p[0], k1[0], k2[0], k1_e[0], k2_e[0])
    np.testing.assert_allclose(p_aligned, p_e[0], atol=2e-3)
    # Marginal structure always holds.
    assert p.shape == (1, k + 1, k + 1)
    np.testing.assert_allclose(p[0].sum(), 2 * k, rtol=1e-2)


@requires_reference
def test_with_filters_matcher_parity(gray_image_pair):
    import torch
    from pytorch_model.feature_detection.shi_tomasi_angle_sparse_bad_sinkhorn import (
        ShiTomasiAngleSparseBADSinkhornMatcherWithFilters,
    )

    img1, img2 = gray_image_pair
    k = 128
    ref = ShiTomasiAngleSparseBADSinkhornMatcherWithFilters(
        max_keypoints=k, num_pairs=256, ratio_threshold=2.0, dustbin_margin=0.3)
    with torch.no_grad():
        k1_e, k2_e, p_e, v_e = ref(_to_torch(img1), _to_torch(img2))

    cfg = MatcherConfig(max_keypoints=k, num_pairs=256, block_size=5,
                        ratio_threshold=2.0, dustbin_margin=0.3)
    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn_with_filters", cfg)
    k1, k2, p, v = fn(jnp.asarray(img1), jnp.asarray(img2))

    assert _kpt_set(np.asarray(k1)[0]) == _kpt_set(k1_e.numpy()[0])
    assert _kpt_set(np.asarray(k2)[0]) == _kpt_set(k2_e.numpy()[0])
    p_aligned, perm1, _ = _align_probs(np.asarray(p)[0], np.asarray(k1)[0],
                                       np.asarray(k2)[0], k1_e.numpy()[0],
                                       k2_e.numpy()[0])
    # P compared off the filter boundaries: filtered rows are rewritten to
    # one-hot dustbin, so a single near-threshold flip changes a whole row.
    v_ours = np.asarray(v)[0][perm1]
    both_valid = v_ours & v_e.numpy()[0]
    both_invalid = ~v_ours & ~v_e.numpy()[0]
    agree = v_ours == v_e.numpy()[0]
    assert agree.mean() > 0.98  # valid masks may flip near filter thresholds
    np.testing.assert_allclose(p_aligned[:-1][both_valid | both_invalid],
                               p_e.numpy()[0][:-1][both_valid | both_invalid],
                               atol=2e-3)


def test_extraction_wrapper_shapes(gray_image_pair):
    img1, img2 = gray_image_pair
    cfg = MatcherConfig(max_keypoints=64, num_pairs=256, max_matches=32,
                        match_threshold=0.05, block_size=5)
    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn_extraction", cfg)
    mk1, mk2, s, v = fn(jnp.asarray(img1), jnp.asarray(img2))
    assert mk1.shape == (1, 32, 2) and mk2.shape == (1, 32, 2)
    assert s.shape == (1, 32) and v.shape == (1, 32)
    s, v = np.asarray(s), np.asarray(v)
    # Scores sorted descending; invalid entries have zero/negative score.
    assert (np.diff(s[0]) <= 1e-7).all()
    assert (s[0][v[0]] >= 0.05 - 1e-6).all()


def test_registry_compile_check():
    """Analogue of the reference CI's onnx.checker pass over every registry
    model (`.github/workflows/onnx-export.yml:35-97`): every registered
    pipeline must AOT-lower and compile at a small static shape."""
    for name in models.names():
        spec = models.get(name)
        cfg = spec.defaults.with_(max_keypoints=32, max_matches=16)
        compiled = models.compile_model(name, height=64, width=80, cfg=cfg)
        assert compiled is not None


def test_matcher_is_rotation_sensitive_vs_invariant(gray_image):
    """Property: the angle-aware descriptor matches a rotated copy better than
    the unoriented one (rotation invariance of oriented BAD)."""
    img = np.asarray(gray_image)
    rot = np.rot90(img[0, 0]).copy()[None, None]  # 90° rotation
    h = min(img.shape[2], rot.shape[2])
    w = min(img.shape[3], rot.shape[3])
    a, b = img[:, :, :h, :w], rot[:, :, :h, :w]

    cfg = MatcherConfig(max_keypoints=64, num_pairs=256, block_size=5)
    f_angle = models.build("shi_tomasi_angle_sparse_bad_sinkhorn", cfg)
    f_plain = models.build("shi_tomasi_sparse_bad_sinkhorn", cfg)
    _, _, p_angle = f_angle(jnp.asarray(a), jnp.asarray(b))
    _, _, p_plain = f_plain(jnp.asarray(a), jnp.asarray(b))
    conf_angle = np.asarray(p_angle)[0, :-1, :-1].max(axis=1).mean()
    conf_plain = np.asarray(p_plain)[0, :-1, :-1].max(axis=1).mean()
    assert conf_angle > conf_plain


@requires_reference
def test_akaze_matcher_parity(gray_image_pair):
    import torch
    from pytorch_model.feature_detection.akaze_sparse_bad_sinkhorn import (
        AKAZESparseBADSinkhornMatcher,
    )

    img1, img2 = gray_image_pair
    k = 128
    ref = AKAZESparseBADSinkhornMatcher(max_keypoints=k, num_pairs=256)
    with torch.no_grad():
        k1_e, k2_e, p_e = ref(_to_torch(img1), _to_torch(img2))

    cfg = MatcherConfig(max_keypoints=k, num_pairs=256)
    fn = models.build("akaze_sparse_bad_sinkhorn", cfg)
    k1, k2, p = fn(jnp.asarray(img1), jnp.asarray(img2))

    assert _kpt_set(np.asarray(k1)[0]) == _kpt_set(k1_e.numpy()[0])
    assert _kpt_set(np.asarray(k2)[0]) == _kpt_set(k2_e.numpy()[0])
    p_aligned, _, _ = _align_probs(np.asarray(p)[0], np.asarray(k1)[0],
                                   np.asarray(k2)[0], k1_e.numpy()[0],
                                   k2_e.numpy()[0])
    np.testing.assert_allclose(p_aligned, p_e.numpy()[0], atol=2e-3)


def test_akaze_sampled_orientation_matches_dense(gray_image_pair):
    """The AKAZE frontend's per-keypoint tie-normalized orientation select is
    BIT-equal to sampling the dense orientation map built from the SAME
    per-scale parts: nearest gather commutes with the elementwise select
    (`models/akaze_family.py`). End-to-end numerics vs the reference are
    covered by ``test_akaze_matcher_parity``."""
    import jax

    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        _resolve_border_margin, _select_keypoints)
    from onnx_image_processing_tpu.ops.akaze import (
        _scale_select, akaze_detect_parts)
    from onnx_image_processing_tpu.ops.sampling import sample_nearest

    img1, img2 = gray_image_pair
    images = jnp.concatenate([jnp.asarray(img1), jnp.asarray(img2)], axis=0)
    cfg = MatcherConfig(max_keypoints=96, num_pairs=256)

    ss, m10, m01 = akaze_detect_parts(images)          # shared ground truth
    scores = jnp.max(ss, axis=0)[:, None]
    margin = _resolve_border_margin(cfg, sparse=True)
    kpts, _ = _select_keypoints(scores, cfg, margin)
    ky, kx = kpts[..., 0], kpts[..., 1]

    # Dense formulation: full orientation map, sampled at keypoints.
    _, orient_dense = _scale_select(ss, jnp.arctan2(m01, m10))
    theta_dense = sample_nearest(orient_dense[:, 0], ky, kx)

    # Frontend formulation: sample the parts, select per keypoint.
    at_k = jax.vmap(lambda m: sample_nearest(m, ky, kx))
    ss_k = at_k(ss)
    theta_s = jnp.arctan2(at_k(m01), at_k(m10))
    tie = (ss_k == ss_k.max(axis=0, keepdims=True)).astype(jnp.float32)
    tie = tie / jnp.maximum(tie.sum(axis=0, keepdims=True), 1.0)
    theta_sampled = (theta_s * tie).sum(axis=0)

    np.testing.assert_array_equal(np.asarray(theta_sampled),
                                  np.asarray(theta_dense))


def test_essential_pipeline_outputs(gray_image_pair):
    """4-output fused pipeline: matcher outputs + rank-2 E (BASELINE config #5)."""
    img1, img2 = gray_image_pair
    cfg = MatcherConfig(max_keypoints=64, num_pairs=256, block_size=5)
    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix", cfg)
    k_inv = jnp.asarray(np.linalg.inv(
        np.array([[100., 0, 80], [0, 100., 60], [0, 0, 1]], np.float32)))
    k1, k2, p, e = fn(jnp.asarray(img1), jnp.asarray(img2), k_inv)
    assert k1.shape == (1, 64, 2) and p.shape == (1, 65, 65)
    e = np.asarray(e)
    assert e.shape == (3, 3)
    s = np.linalg.svd(e, compute_uv=False)
    assert s[2] < 1e-4 * max(s[0], 1e-12)          # rank 2
    np.testing.assert_allclose(s[0], s[1], rtol=1e-3)  # sigma1 == sigma2


def test_essential_pipeline_ransac_mode(gray_image_pair):
    """essential_ransac_hypotheses > 0: same matcher outputs (keypoints/P are
    upstream of the solve), still a valid rank-2 E, and a different — robust —
    solve path. One static jit graph, export-safe."""
    img1, img2 = gray_image_pair
    base = MatcherConfig(max_keypoints=64, num_pairs=256, block_size=5)
    k_inv = jnp.asarray(np.linalg.inv(
        np.array([[100., 0, 80], [0, 100., 60], [0, 0, 1]], np.float32)))
    name = "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix"
    k1a, k2a, pa, ea = models.build(name, base)(
        jnp.asarray(img1), jnp.asarray(img2), k_inv)
    cfg = base.with_(essential_ransac_hypotheses=64, essential_irls_iters=2)
    k1b, k2b, pb, eb = models.build(name, cfg)(
        jnp.asarray(img1), jnp.asarray(img2), k_inv)
    np.testing.assert_array_equal(np.asarray(k1a), np.asarray(k1b))
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    e = np.asarray(eb)
    assert np.isfinite(e).all()
    s = np.linalg.svd(e, compute_uv=False)
    assert s[2] < 1e-4 * max(s[0], 1e-12)
    np.testing.assert_allclose(s[0], s[1], rtol=1e-3)


@requires_reference
def test_dense_matcher_parity(gray_image_pair):
    """The dense matcher's sparse-bilinear descriptor path must match the
    reference's dense-map + grid_sample extraction (they are the same linear
    functional; keypoints are integers so interpolation is exact lookup)."""
    import torch
    from pytorch_model.feature_detection import ShiTomasiBADSinkhornMatcher

    img1, img2 = gray_image_pair
    k = 128
    ref = ShiTomasiBADSinkhornMatcher(max_keypoints=k, num_pairs=256)
    with torch.no_grad():
        k1_e, k2_e, p_e = ref(_to_torch(img1), _to_torch(img2))

    cfg = MatcherConfig(max_keypoints=k, num_pairs=256, block_size=3)
    fn = models.build("shi_tomasi_bad_sinkhorn", cfg)
    k1, k2, p = fn(jnp.asarray(img1), jnp.asarray(img2))

    assert _kpt_set(np.asarray(k1)[0]) == _kpt_set(k1_e.numpy()[0])
    assert _kpt_set(np.asarray(k2)[0]) == _kpt_set(k2_e.numpy()[0])
    p_aligned, _, _ = _align_probs(np.asarray(p)[0], np.asarray(k1)[0],
                                   np.asarray(k2)[0], k1_e.numpy()[0],
                                   k2_e.numpy()[0])
    np.testing.assert_allclose(p_aligned, p_e.numpy()[0], atol=2e-3)


@requires_reference
def test_describe_at_given_keypoints_parity(gray_image):
    import torch
    from pytorch_model.feature_detection.shi_tomasi_angle import (
        ShiTomasiAngleSparseBAD,
    )

    rng = np.random.default_rng(9)
    kpts = np.stack([rng.integers(8, 112, 48), rng.integers(8, 152, 48)],
                    axis=-1).astype(np.float32)[None]
    ref = ShiTomasiAngleSparseBAD(num_pairs=256)
    with torch.no_grad():
        s_e, a_e, d_e = ref(_to_torch(gray_image), _to_torch(kpts))

    cfg = MatcherConfig(num_pairs=256, block_size=5)
    s, a, d = models.shi_tomasi_angle_sparse_bad_describe(
        jnp.asarray(gray_image), jnp.asarray(kpts), cfg)
    np.testing.assert_allclose(np.asarray(s), s_e.numpy(), atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a), a_e.numpy(), atol=1e-4)
    close = np.isclose(np.asarray(d), d_e.numpy(), atol=2e-3, rtol=1e-3)
    assert close.mean() > 0.995  # nearest-rounding ties at rotated offsets


@requires_reference
def test_flagship_parity_on_real_photo():
    """Flagship matcher diffed against the reference on a natural image
    (reference `sample_data/*.jpg`), not just synthetics — strict, ungated
    assignment comparison through the keypoint mapping."""
    import glob

    import torch
    from PIL import Image
    from pytorch_model.feature_detection.shi_tomasi_angle_sparse_bad_sinkhorn import (
        ShiTomasiAngleSparseBADSinkhornMatcher,
    )

    paths = sorted(glob.glob("/root/reference/sample_data/*.jpg"))
    if not paths:
        pytest.skip("reference sample_data not available")
    img = np.asarray(
        Image.open(paths[0]).convert("L").resize((320, 240), Image.BILINEAR),
        dtype=np.float32)[None, None]
    shifted = np.roll(img, 9, axis=3)

    k = 128
    ref = ShiTomasiAngleSparseBADSinkhornMatcher(max_keypoints=k, num_pairs=256)
    with torch.no_grad():
        k1_e, k2_e, p_e = ref(_to_torch(img), _to_torch(shifted))

    cfg = MatcherConfig(max_keypoints=k, num_pairs=256, block_size=5)
    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn", cfg)
    k1, k2, p = fn(jnp.asarray(img), jnp.asarray(shifted))

    assert _kpt_set(np.asarray(k1)[0]) == _kpt_set(k1_e.numpy()[0])
    assert _kpt_set(np.asarray(k2)[0]) == _kpt_set(k2_e.numpy()[0])
    p_aligned, _, _ = _align_probs(np.asarray(p)[0], np.asarray(k1)[0],
                                   np.asarray(k2)[0], k1_e.numpy()[0],
                                   k2_e.numpy()[0])
    np.testing.assert_allclose(p_aligned, p_e.numpy()[0], atol=2e-3)


@requires_reference
def test_single_image_detector_parity(gray_image):
    import torch
    from pytorch_model.feature_detection.shi_tomasi_angle import (
        ShiTomasiAngleSparseBADDetector,
    )

    k = 96
    ref = ShiTomasiAngleSparseBADDetector(max_keypoints=k, num_pairs=256)
    with torch.no_grad():
        k_e, s_e, d_e = ref(_to_torch(gray_image))

    cfg = MatcherConfig(max_keypoints=k, num_pairs=256, block_size=5)
    kpts, scores, desc = models.shi_tomasi_angle_sparse_bad_detect(
        jnp.asarray(gray_image), cfg)
    assert _kpt_set(np.asarray(kpts)[0]) == _kpt_set(k_e.numpy()[0])
    perm = _perm_to_ref(np.asarray(kpts)[0], k_e.numpy()[0])
    np.testing.assert_allclose(np.asarray(scores)[0][perm], s_e.numpy()[0],
                               atol=1e-2, rtol=1e-4)
    close = np.isclose(np.asarray(desc)[0][perm], d_e.numpy()[0],
                       atol=2e-3, rtol=1e-3)
    assert close.mean() > 0.995  # nearest-rounding ties at rotated offsets


@pytest.mark.parametrize("hw", [(123, 157), (96, 640), (481, 130)])
def test_flagship_odd_sizes(hw):
    """Non-aligned image sizes must flow through every stage (block top-k
    padding, sampler window clamping, stacked-pair batching) without NaNs."""
    h, w = hw
    rng = np.random.default_rng(hash(hw) % 2**31)
    i1 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    cfg = MatcherConfig(max_keypoints=48, num_pairs=256, block_size=5)
    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn", cfg)
    k1, k2, p = fn(i1, i2)
    k1, k2, p = np.asarray(k1), np.asarray(k2), np.asarray(p)
    assert p.shape == (1, 49, 49) and np.isfinite(p).all()
    valid = k1[0, :, 0] >= 0
    assert valid.any()
    assert (k1[0][valid, 0] < h).all() and (k1[0][valid, 1] < w).all()


@requires_reference
@pytest.mark.parametrize("kwargs,with_angle", [
    # Pinned from tools/soak.py --reference draws: non-default nms radius +
    # sharp epsilon + bilinear (the amplification-prone regime) ...
    (dict(max_keypoints=24, num_pairs=256, sampling_mode="bilinear",
          binarize=True, soft_binarize=True, nms_radius=7,
          epsilon=0.05, distance_type="l2"), True),
    # ... and hard-binarize L1 at a non-default radius.
    (dict(max_keypoints=40, num_pairs=512, sampling_mode="nearest",
          binarize=True, soft_binarize=False, nms_radius=5,
          epsilon=1.0, distance_type="l1"), False),
])
def test_nondefault_config_parity(kwargs, with_angle):
    """Config-space parity vs the reference at non-default hyperparameters
    (pinned from randomized soak draws — tools/soak.py --reference)."""
    import torch

    if with_angle:
        from pytorch_model.feature_detection.shi_tomasi_angle_sparse_bad_sinkhorn import (  # noqa: E501
            ShiTomasiAngleSparseBADSinkhornMatcher as RefCls)
        from onnx_image_processing_tpu.models.shi_tomasi_family import (
            shi_tomasi_angle_sparse_bad_sinkhorn_match as match)
        reg = "shi_tomasi_angle_sparse_bad_sinkhorn"
    else:
        from pytorch_model.feature_detection.shi_tomasi_sparse_bad_sinkhorn import (  # noqa: E501
            ShiTomasiSparseBADSinkhornMatcher as RefCls)
        from onnx_image_processing_tpu.models.shi_tomasi_family import (
            shi_tomasi_sparse_bad_sinkhorn_match as match)
        reg = "shi_tomasi_sparse_bad_sinkhorn"

    rng = np.random.default_rng(99)
    img1 = rng.uniform(0, 255, (1, 1, 160, 220)).astype(np.float32)
    img2 = np.roll(img1, 5, axis=3)

    ref = RefCls(**kwargs)
    with torch.no_grad():
        k1_e, k2_e, p_e = (t.numpy() for t in ref(
            _to_torch(img1), _to_torch(img2)))

    cfg = models.get(reg).defaults.with_(topk_mode="sort", **kwargs)
    k1, k2, p = (np.asarray(v) for v in match(jnp.asarray(img1),
                                              jnp.asarray(img2), cfg))

    assert _kpt_set(k1[0]) == _kpt_set(k1_e[0])
    assert _kpt_set(k2[0]) == _kpt_set(k2_e[0])
    inv1 = {tuple(v): i for i, v in enumerate(k1_e[0].tolist())}
    inv2 = {tuple(v): i for i, v in enumerate(k2_e[0].tolist())}
    k = kwargs["max_keypoints"]
    m1 = np.array([inv1[tuple(v)] for v in k1[0].tolist()] + [k])
    m2 = np.array([inv2[tuple(v)] for v in k2[0].tolist()] + [k])
    diff = np.abs(p[0] - p_e[0][np.ix_(m1, m2)])
    tol = 5e-2 if kwargs["binarize"] and not kwargs["soft_binarize"] else 2e-2
    assert (diff > tol).mean() <= (5e-3 if kwargs["epsilon"] <= 0.05 else 2e-3)


def test_uint8_input_bit_identical():
    """DEPLOYMENT.md rule 1: pipelines accept camera-native uint8 frames with
    BIT-IDENTICAL results (every entry op opens with astype(float32)), so
    clients can ship 4x fewer bytes. Pin it for the flagship and the AKAZE
    matcher (different entry stencils)."""
    from onnx_image_processing_tpu import models

    rng = np.random.default_rng(5)
    u8_1 = rng.integers(0, 256, (1, 1, 120, 160)).astype(np.uint8)
    u8_2 = np.roll(u8_1, 4, axis=3)

    for name in ("shi_tomasi_angle_sparse_bad_sinkhorn",
                 "akaze_sparse_bad_sinkhorn"):
        fn = models.build(name, max_keypoints=32, num_pairs=256,
                          use_pallas=False)
        out_u8 = fn(jnp.asarray(u8_1), jnp.asarray(u8_2))
        out_f32 = fn(jnp.asarray(u8_1.astype(np.float32)),
                     jnp.asarray(u8_2.astype(np.float32)))
        for a, b in zip(out_u8, out_f32):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Pallas kernel tests: interpret-mode parity vs the jnp oracle (SURVEY.md §4:
the interpret/compiled dichotomy stands in for the reference's export/runtime
one)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_image_processing_tpu.kernels.sparse_sampler import (
    dma_geometry,
    sparse_box_sample,
    reference_box_sample,
)


@pytest.fixture(scope="module")
def sample_problem():
    rng = np.random.default_rng(3)
    b, k, s, ps, r = 1, 16, 64, 56, 7
    h, w = 120, 160
    img = rng.uniform(0, 255, (b, h, w)).astype(np.float32)
    imgp = np.pad(img, ((0, 0), (r, r), (r, r)), mode="edge")
    sy = (rng.integers(0, (h - ps) // 8 + 1, (b, k)) * 8).astype(np.int32)
    sx = rng.integers(0, w - ps, (b, k)).astype(np.int32)
    ly = rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32)
    lx = rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32)
    groups = ((0, 0, 16), (1, 16, 32), (3, 32, 48), (7, 48, 64))
    return (jnp.asarray(imgp), jnp.asarray(sy), jnp.asarray(sx),
            jnp.asarray(ly), jnp.asarray(lx), ps, r, groups)


@pytest.mark.parametrize("bilinear", [False, True])
def test_sparse_sampler_interpret_matches_oracle(sample_problem, bilinear):
    imgp, sy, sx, ly, lx, ps, r, groups = sample_problem
    got = np.asarray(sparse_box_sample(imgp, sy, sx, ly, lx, ps, r, groups,
                                       bilinear=bilinear, interpret=True))
    exp = np.asarray(reference_box_sample(imgp, sy, sx, ly, lx, ps, r, groups,
                                          bilinear=bilinear))
    np.testing.assert_allclose(got, exp, atol=5e-3)


def test_sparse_sampler_resident_image_swap_interpret():
    """Per-image VMEM residency with B=2: the kernel must re-DMA the resident
    image at each image boundary on the grid (keypoints are image-major)."""
    rng = np.random.default_rng(11)
    b, k, s, ps, r = 2, 16, 32, 56, 7
    h, w = 120, 160
    img = rng.uniform(0, 255, (b, h, w)).astype(np.float32)
    imgp = np.pad(img, ((0, 0), (r, r), (r, r)), mode="edge")
    sy = (rng.integers(0, (h - ps) // 8 + 1, (b, k)) * 8).astype(np.int32)
    sx = rng.integers(0, w - ps, (b, k)).astype(np.int32)
    ly = rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32)
    lx = rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32)
    groups = ((0, 0, 8), (2, 8, 20), (6, 20, 32))
    args = (jnp.asarray(imgp), jnp.asarray(sy), jnp.asarray(sx),
            jnp.asarray(ly), jnp.asarray(lx), ps, r, groups)
    got = np.asarray(sparse_box_sample(*args, interpret=True))
    exp = np.asarray(reference_box_sample(*args))
    np.testing.assert_allclose(got, exp, atol=5e-3)


def test_sparse_sampler_tile64_interpret():
    """tile=64 (the adaptive default for K % 64 == 0) with per-image
    residency and a multi-image batch must match the oracle."""
    rng = np.random.default_rng(17)
    b, k, s, ps, r = 2, 64, 48, 56, 7
    h, w = 128, 192
    img = rng.uniform(0, 255, (b, h, w)).astype(np.float32)
    imgp = np.pad(img, ((0, 0), (r, r), (r, r)), mode="edge")
    sy = (rng.integers(0, (h - ps) // 8 + 1, (b, k)) * 8).astype(np.int32)
    sx = rng.integers(0, w - ps, (b, k)).astype(np.int32)
    ly = rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32)
    lx = rng.uniform(0, ps - 1, (b, k, s)).astype(np.float32)
    groups = ((0, 0, 12), (3, 12, 30), (7, 30, 48))
    args = (jnp.asarray(imgp), jnp.asarray(sy), jnp.asarray(sx),
            jnp.asarray(ly), jnp.asarray(lx), ps, r, groups)
    got = np.asarray(sparse_box_sample(*args, tile=64, interpret=True))
    exp = np.asarray(reference_box_sample(*args))
    np.testing.assert_allclose(got, exp, atol=5e-3)


def test_sparse_sampler_windowed_path_interpret(sample_problem):
    """The windowed-DMA fallback (images beyond the VMEM residency budget)
    must match the oracle too. Forced by zeroing the budget; a fresh K makes
    the jit trace anew (the budget is read at trace time)."""
    import onnx_image_processing_tpu.kernels.sparse_sampler as ss

    imgp, sy, sx, ly, lx, ps, r, groups = sample_problem
    sy2, sx2, ly2, lx2 = sy[:, :8], sx[:, :8], ly[:, :8], lx[:, :8]
    old = ss._VMEM_RESIDENT_MAX_BYTES
    ss._VMEM_RESIDENT_MAX_BYTES = 0
    try:
        got = np.asarray(sparse_box_sample(imgp, sy2, sx2, ly2, lx2, ps, r,
                                           groups, interpret=True))
    finally:
        ss._VMEM_RESIDENT_MAX_BYTES = old
    exp = np.asarray(reference_box_sample(imgp, sy2, sx2, ly2, lx2, ps, r,
                                          groups))
    np.testing.assert_allclose(got, exp, atol=5e-3)


def test_oracle_matches_direct_box_means(sample_problem):
    """The jnp oracle itself must equal brute-force box means."""
    imgp, sy, sx, ly, lx, ps, r, groups = sample_problem
    out = np.asarray(reference_box_sample(imgp, sy, sx, ly, lx, ps, r, groups))
    img = np.asarray(imgp)
    rng = np.random.default_rng(0)
    for _ in range(50):
        k = int(rng.integers(0, ly.shape[1]))
        s = int(rng.integers(0, ly.shape[2]))
        rr = next(g[0] for g in groups if g[1] <= s < g[2])
        cy = int(np.round(float(np.asarray(ly)[0, k, s])))
        cx = int(np.round(float(np.asarray(lx)[0, k, s])))
        y0 = int(np.asarray(sy)[0, k])
        x0 = int(np.asarray(sx)[0, k])
        # Patch-local center (cy, cx) maps to padded-image (y0+cy+r, x0+cx+r).
        py, px = y0 + cy + r, x0 + cx + r
        manual = img[0, py - rr:py + rr + 1, px - rr:px + rr + 1].mean()
        np.testing.assert_allclose(out[0, k, s], manual, atol=1e-3)


def test_dma_geometry_alignment():
    psd_y, psd_x, bank_w = dma_geometry(56, 7)
    assert psd_y % 8 == 0 and psd_x % 128 == 0
    assert psd_y >= 56 + 14 and psd_x >= 127 + 56 + 14


def test_sparse_bad_pallas_flag_consistency(gray_image):
    """use_pallas=False (jnp) on CPU must equal the auto (CPU->jnp) path."""
    from onnx_image_processing_tpu.ops import load_bad_params, sparse_bad

    rng = np.random.default_rng(5)
    kpts = np.stack([rng.integers(0, 120, 32), rng.integers(0, 160, 32)],
                    axis=-1).astype(np.float32)[None]
    a = np.asarray(sparse_bad(jnp.asarray(gray_image), jnp.asarray(kpts),
                              load_bad_params(256), use_pallas=False))
    b = np.asarray(sparse_bad(jnp.asarray(gray_image), jnp.asarray(kpts),
                              load_bad_params(256), use_pallas=None))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_integer_exact_path_interpret():
    """With integer-valued images the int8-digit contraction must agree with
    the jnp oracle to f32-division precision (the int path's box SUMS are
    exact; only the 1/area mean division rounds)."""
    from onnx_image_processing_tpu.ops import load_bad_params, sparse_bad

    rng = np.random.default_rng(21)
    h, w, k = 96, 144, 16
    img = jnp.asarray(rng.integers(0, 256, (1, 1, h, w)).astype(np.float32))
    kp = jnp.asarray(np.stack([rng.uniform(8, h - 8, (1, k)),
                               rng.uniform(8, w - 8, (1, k))],
                              -1).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, (1, 1, h, w)).astype(np.float32))
    params = load_bad_params(256)

    import onnx_image_processing_tpu.kernels.sparse_sampler as ss
    import functools

    orig = ss.sparse_box_sample

    def interpreted(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    ss.sparse_box_sample = interpreted
    try:
        got = np.asarray(sparse_bad(img, kp, params, orientation=theta,
                                    use_pallas=True, integer_image=True,
                                    normalize_descriptors=False))
    finally:
        ss.sparse_box_sample = orig
    want = np.asarray(sparse_bad(img, kp, params, orientation=theta,
                                 use_pallas=False,
                                 normalize_descriptors=False))
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize("hw", [(480, 640), (200, 300)])
def test_detect_frontend_interpret_matches_ops(hw):
    """Fused Shi-Tomasi + moments + NMS front-end vs the XLA ops composition,
    including non-multiple-of-stripe heights and border semantics (replicate
    for score, zero for moments, -inf-outside for NMS)."""
    from onnx_image_processing_tpu.kernels.detect_frontend import (
        detect_frontend, detect_frontend_reference)

    h, w = hw
    rng = np.random.default_rng(31)
    img = jnp.asarray(rng.uniform(0, 255, (2, 1, h, w)).astype(np.float32))
    got = detect_frontend(img, interpret=True)
    exp = detect_frontend_reference(img)
    for g, e, name, tol in zip(got, exp, ("masked", "m10", "m01"),
                               (2e-2, 2e-2, 2e-2)):
        g, e = np.asarray(g), np.asarray(e)
        scale = max(1.0, float(np.abs(e).max()))
        np.testing.assert_allclose(g / scale, e / scale, atol=tol / scale,
                                   err_msg=name)
    # NMS survivor sets must agree except at razor-thin ties.
    m_g, m_e = np.asarray(got[0]), np.asarray(exp[0])
    assert ((m_g > 0) != (m_e > 0)).mean() < 1e-4


def test_detect_frontend_no_angle_interpret():
    from onnx_image_processing_tpu.kernels.detect_frontend import (
        detect_frontend, detect_frontend_reference)

    rng = np.random.default_rng(33)
    img = jnp.asarray(rng.uniform(0, 255, (1, 1, 96, 144)).astype(np.float32))
    got = detect_frontend(img, with_angle=False, interpret=True)
    exp = detect_frontend_reference(img, with_angle=False)
    assert got[1] is None and got[2] is None
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(exp[0]),
                               atol=2e-2)


def test_flagship_fused_detect_interpret_matches_xla_path(gray_image):
    """The flagship matcher with the fused detect front-end (interpret mode)
    must reproduce the plain XLA path: same keypoints, same descriptors."""
    import onnx_image_processing_tpu.kernels.detect_frontend as df
    from onnx_image_processing_tpu.core.config import MatcherConfig
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        _sparse_detect_describe)

    rng = np.random.default_rng(35)
    both = jnp.asarray(rng.uniform(0, 255, (2, 1, 120, 160)).astype(np.float32))

    cfg = MatcherConfig(max_keypoints=64)
    kpts_x, _, desc_x = _sparse_detect_describe(both, cfg, with_angle=True)

    orig = df.detect_frontend

    def interpreted(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    df.detect_frontend = interpreted
    try:
        cfg_p = MatcherConfig(max_keypoints=64, use_pallas=True,
                              fused_detect=True)
        import onnx_image_processing_tpu.kernels.sparse_sampler as ss
        orig_s = ss.sparse_box_sample

        def interp_s(*args, **kw):
            kw["interpret"] = True
            return orig_s(*args, **kw)

        ss.sparse_box_sample = interp_s
        try:
            kpts_p, _, desc_p = _sparse_detect_describe(both, cfg_p,
                                                     with_angle=True)
        finally:
            ss.sparse_box_sample = orig_s
    finally:
        df.detect_frontend = orig

    # The two score maps agree only to float-associativity noise, so rank-K
    # ordering near ties may differ: compare keypoint SETS (and descriptors
    # through the matching), not slot order.
    kx, kp = np.asarray(kpts_x), np.asarray(kpts_p)
    dx_, dp = np.asarray(desc_x), np.asarray(desc_p)
    for b in range(kx.shape[0]):
        set_x = {tuple(v) for v in kx[b].tolist()}
        set_p = {tuple(v) for v in kp[b].tolist()}
        # Allow a rank-boundary swap at most (scores within noise of slot K).
        assert len(set_x ^ set_p) <= 2
        common = set_x & set_p
        ix = {tuple(v): i for i, v in enumerate(kx[b].tolist())}
        ip = {tuple(v): i for i, v in enumerate(kp[b].tolist())}
        for kpt in common:
            np.testing.assert_allclose(dp[b, ip[kpt]], dx_[b, ix[kpt]],
                                       atol=2e-3)


def test_akaze_ladder_interpret_matches_oracle():
    """Fused AKAZE ladder kernel vs its jnp oracle (scores + moment maps).

    On real TPU hardware the kernel is bit-identical to the XLA path (same
    tap order, same f32 adds); interpret mode tolerates float-order noise.
    """
    from onnx_image_processing_tpu.kernels.akaze_ladder import akaze_ladder
    from onnx_image_processing_tpu.ops.akaze import akaze_ladder_reference

    rng = np.random.default_rng(23)
    img = rng.uniform(0, 255, (2, 96, 128)).astype(np.float32)
    s_k, m10_k, m01_k = (np.asarray(o) for o in
                         akaze_ladder(jnp.asarray(img), interpret=True))
    s_r, m10_r, m01_r = (np.asarray(o) for o in
                         akaze_ladder_reference(jnp.asarray(img)[:, None]))
    np.testing.assert_allclose(s_k, s_r, atol=1e-3)
    np.testing.assert_allclose(m10_k, m10_r, atol=5e-3)
    np.testing.assert_allclose(m01_k, m01_r, atol=5e-3)
    # The NMS survivor sets must agree except at razor-thin score ties.
    assert ((s_k > 0) != (s_r > 0)).mean() < 1e-4


def test_akaze_detect_pallas_flag_consistency():
    """akaze_detect(use_pallas=True) through the interpreted kernel equals the
    XLA path, including the cross-scale tie-normalized orientation select."""
    import onnx_image_processing_tpu.kernels.akaze_ladder as al
    from onnx_image_processing_tpu.ops.akaze import akaze_detect

    rng = np.random.default_rng(24)
    img = jnp.asarray(rng.uniform(0, 255, (1, 1, 64, 96)).astype(np.float32))

    orig = al.akaze_ladder

    def interpreted(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    al.akaze_ladder = interpreted
    try:
        s_p, o_p = (np.asarray(o) for o in akaze_detect(img, use_pallas=True))
    finally:
        al.akaze_ladder = orig
    s_j, o_j = (np.asarray(o) for o in akaze_detect(img, use_pallas=False))
    np.testing.assert_allclose(s_p, s_j, atol=1e-3)
    kpts = s_j[0, 0] > 1e-3
    np.testing.assert_allclose(o_p[0, 0][kpts], o_j[0, 0][kpts], atol=1e-3)


# ---------------------------------------------------------------------------
# Fused NMS + block-select frontend (kernels/select_frontend.py)
# ---------------------------------------------------------------------------

def _select_oracle(scores, r, thr, margin):
    """The XLA selection front the fused kernel replaces, composed verbatim
    from ops/keypoints.py (nms_maxpool -> masking -> _block_reduce_xla)."""
    from onnx_image_processing_tpu.ops import keypoints as kp

    b, h, w = scores.shape
    masked = scores * kp.nms_maxpool(scores, r)
    if margin > 0:
        yv = (jnp.arange(h) >= margin) & (jnp.arange(h) < h - margin)
        xv = (jnp.arange(w) >= margin) & (jnp.arange(w) < w - margin)
        masked = masked * (yv[:, None] & xv[None, :]).astype(masked.dtype)
    masked = jnp.where(masked > thr, masked, 0.0)
    return kp._block_reduce_xla(masked, r + 1, w)


@pytest.mark.parametrize("h,w,r,margin,thr,b", [
    (480, 640, 3, 16, 0.01, 1),   # flagship shape
    (64, 80, 1, 4, 0.0, 2),       # minimum radius
    (123, 217, 3, 8, 0.05, 2),    # odd, non-multiple-of-block sizes
    (96, 128, 7, 10, 0.0, 1),     # maximum supported radius
    (200, 200, 2, 0, 0.0, 3),     # no border margin, batch 3
])
def test_select_frontend_interpret_bitexact(h, w, r, margin, thr, b):
    """Interpret-mode fused kernel vs the XLA reduce_window path: the block
    maxima and raster-first argmin grids must be BIT-identical (the top-k /
    decode tail is shared, so grid equality is output equality)."""
    from onnx_image_processing_tpu.kernels import select_frontend as sf

    assert sf.supports(h, w, r)
    rng = np.random.default_rng(h * 7 + w)
    s = jnp.asarray(rng.random((b, h, w), dtype=np.float32))
    bm_x, bi_x = _select_oracle(s, r, thr, margin)
    bm_p, bi_p = sf.nms_block_reduce(s, r, thr, margin, interpret=True)
    np.testing.assert_array_equal(np.asarray(bm_x), np.asarray(bm_p))
    np.testing.assert_array_equal(np.asarray(bi_x), np.asarray(bi_p))


def test_select_frontend_ties_bitexact():
    """Quantized score maps with massive in-block ties: the raster-first
    (min-linear-index) tie rule must match the XLA path exactly."""
    from onnx_image_processing_tpu.kernels import select_frontend as sf

    rng = np.random.default_rng(77)
    s = jnp.asarray((rng.integers(0, 5, (2, 120, 160)) / 4.0)
                    .astype(np.float32))
    bm_x, bi_x = _select_oracle(s, 3, 0.1, 8)
    bm_p, bi_p = sf.nms_block_reduce(s, 3, 0.1, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(bm_x), np.asarray(bm_p))
    np.testing.assert_array_equal(np.asarray(bi_x), np.asarray(bi_p))


def test_nms_select_topk_pallas_flag_consistency():
    """nms_select_topk(use_pallas=True, interpret) == use_pallas=False end to
    end, including the tiny-map fallback and sort/approx mode routing."""
    from onnx_image_processing_tpu.ops import nms_select_topk

    rng = np.random.default_rng(101)
    s = jnp.asarray(rng.random((2, 123, 217), dtype=np.float32))
    for mode in ("block", "sort"):
        k_x, s_x = nms_select_topk(s, 64, 0.01, 8, nms_radius=3,
                                   topk_mode=mode, use_pallas=False)
        k_p, s_p = nms_select_topk(s, 64, 0.01, 8, nms_radius=3,
                                   topk_mode=mode, use_pallas=True,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(k_x), np.asarray(k_p))
        np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
    # Tiny map: fewer blocks than slots -> both backends take the flat path.
    tiny = jnp.asarray(rng.random((1, 16, 24), dtype=np.float32))
    k_x, _ = nms_select_topk(tiny, 64, 0.0, 2, nms_radius=3, use_pallas=False)
    k_p, _ = nms_select_topk(tiny, 64, 0.0, 2, nms_radius=3, use_pallas=True,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(k_x), np.asarray(k_p))


def test_select_frontend_supports_guard():
    """supports() rejects radii outside the halo/geometry envelope and maps
    whose raster indices would lose f32 exactness."""
    from onnx_image_processing_tpu.kernels import select_frontend as sf

    assert not sf.supports(480, 640, 0)
    assert not sf.supports(480, 640, 8)
    assert sf.supports(2160, 3840, 3)        # 4K still f32-exact
    assert not sf.supports(4096, 8192, 7)    # beyond the 2^24 envelope
    # Symbolic dims (shape-polymorphic export traces) must return False,
    # not raise InconclusiveDimensionOperation.
    h_sym, w_sym = jax.export.symbolic_shape("H,W")
    assert not sf.supports(h_sym, w_sym, 3)


@pytest.mark.parametrize("r,w", [(2, 100), (5, 1280), (4, 250), (6, 500)])
def test_select_frontend_padded_no_wrap_duplicates(r, w):
    """Pad anchors in the PADDED output layout must stay score-0 even when
    the lane-roll window wraps around the 128-aligned width (bs does not
    divide Wp): a wrap onto real column-0..bs-2 data used to duplicate those
    keypoints into pad slots, which top-k then returned twice."""
    from onnx_image_processing_tpu.kernels import select_frontend as sf
    from onnx_image_processing_tpu.ops import keypoints as kp

    bs = r + 1
    h = 96
    assert sf._round_up(sf._round_up(w, bs), 128) % bs != 0, \
        "geometry must be wrap-prone for this regression test"
    rng = np.random.default_rng(w * 13 + r)
    scores = rng.uniform(0.0, 1.0, (1, h, w)).astype(np.float32)
    scores[0, 10, 0] = 5.0          # strongest keypoint, in column 0
    scores[0, 40, 1] = 4.5          # second strongest, in column 1
    s = jnp.asarray(scores)

    bm_p, bi_p = sf.nms_block_reduce_padded(s, r, 0.0, 0, interpret=True)
    bm_o, bi_o = _select_oracle(s, r, 0.0, 0)
    hb, wb = bm_o.shape[1:]
    np.testing.assert_array_equal(np.asarray(bm_p[:, :hb, :wb]),
                                  np.asarray(bm_o))
    np.testing.assert_array_equal(np.asarray(bi_p[:, :hb, :wb]),
                                  np.asarray(bi_o))
    pad = np.asarray(bm_p).copy()
    pad[:, :hb, :wb] = 0.0
    assert pad.max() == 0.0, "pad slots must carry score 0.0"

    # End to end: the production padded-layout consumer returns each
    # keypoint exactly once.
    kpts, _ = kp.nms_select_topk(s, 16, 0.0, 0, nms_radius=r,
                                 use_pallas=True, interpret=True)
    kx, _ = kp.nms_select_topk(s, 16, 0.0, 0, nms_radius=r, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(kpts), np.asarray(kx))
    valid = np.asarray(kpts)[0]
    valid = valid[valid[:, 0] >= 0]
    assert len({tuple(p) for p in valid.tolist()}) == len(valid)


def test_sinkhorn_kernel_interpret_matches_jnp():
    """VMEM-resident Sinkhorn kernel (interpret mode) vs the fori_loop path:
    same recurrence, same f32 LSE — bit-exact on every tested config."""
    from onnx_image_processing_tpu.kernels.sinkhorn_kernel import sinkhorn_core
    from onnx_image_processing_tpu.ops.sinkhorn import (_cost_matrix,
                                                        sinkhorn_match)

    rng = np.random.default_rng(11)
    for n, m, eps in ((64, 64, 0.05), (60, 90, 1.0), (7, 129, 0.3)):
        d1 = jnp.asarray(rng.normal(0, 0.5, (2, n, 64)).astype(np.float32))
        d2 = jnp.asarray(rng.normal(0, 0.5, (2, m, 64)).astype(np.float32))
        p_jnp = np.asarray(sinkhorn_match(d1, d2, epsilon=eps,
                                          use_pallas=False))

        # Kernel on the same assembled inputs (interpret mode).
        cost = np.asarray(_cost_matrix(d1, d2, "l2"))
        ls = jnp.pad(jnp.asarray(-cost / eps), ((0, 0), (0, 1), (0, 1)),
                     constant_values=-1.0 / eps)
        lmu = jnp.concatenate([jnp.zeros((2, n), jnp.float32),
                               jnp.full((2, 1), np.log(m), jnp.float32)], 1)
        lnu = jnp.concatenate([jnp.zeros((2, m), jnp.float32),
                               jnp.full((2, 1), np.log(n), jnp.float32)], 1)
        p_ker = np.asarray(sinkhorn_core(ls, lmu, lnu, interpret=True))
        np.testing.assert_allclose(p_ker, p_jnp, atol=1e-6)


def test_sinkhorn_kernel_supports_guard():
    from onnx_image_processing_tpu.kernels import sinkhorn_kernel as sk

    assert sk.supports(513, 513)
    assert sk.supports(1025, 1025)      # measured on hardware
    assert not sk.supports(2049, 2049)  # exceeds the VMEM budget

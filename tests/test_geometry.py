"""Differential + property tests: essential-matrix estimation."""

import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from onnx_image_processing_tpu.geometry import (
    min_eigvec9,
    project_onto_essential_manifold,
    hartley_normalization,
    estimate_essential_matrix,
    estimate_essential_from_keypoints,
)


def _k_matrix(fx=16.0, fy=16.0, cx=16.0, cy=16.0):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


@requires_reference
def test_estimator_matches_reference_on_random_p():
    """Same fixture as the reference's own self-test
    (`essential_matrix_estimator.py:406-437`): random (1025, 1025) P."""
    import torch
    from pytorch_model.geometry.essential_matrix_estimator import (
        EssentialMatrixEstimator,
    )

    k = _k_matrix()
    ref = EssentialMatrixEstimator(K=torch.from_numpy(k), image_shape=(32, 32),
                                   top_k=3, n_iter=30, n_iter_manifold=10)
    torch.manual_seed(42)
    p = torch.rand(1025, 1025)
    with torch.no_grad():
        e_ref = ref(p).numpy()

    k_inv = np.linalg.inv(k).astype(np.float32)
    e = np.asarray(estimate_essential_matrix(jnp.asarray(p.numpy()),
                                             jnp.asarray(k_inv),
                                             image_shape=(32, 32),
                                             method="power"))
    # Reference's own PyTorch-vs-ORT tolerance is 1e-4 (`:463`); power
    # iteration accumulates fp32 differences across 30 matvecs, so 1e-3 here.
    np.testing.assert_allclose(e, e_ref, atol=1e-3)


@requires_reference
def test_estimator_matches_reference_dynamic_shape():
    import torch
    from pytorch_model.geometry.essential_matrix_estimator import (
        EssentialMatrixEstimator,
    )

    k = _k_matrix()
    ref = EssentialMatrixEstimator(K=torch.from_numpy(k), image_shape=(32, 32))
    torch.manual_seed(1)
    p = torch.rand(513, 257)
    with torch.no_grad():
        e_ref = ref(p).numpy()
    e = np.asarray(estimate_essential_matrix(
        jnp.asarray(p.numpy()), jnp.asarray(np.linalg.inv(k).astype(np.float32)),
        image_shape=(32, 32), method="power"))
    np.testing.assert_allclose(e, e_ref, atol=1e-3)


def test_essential_matrix_invariants():
    """E must be rank 2 with two equal singular values, regardless of input."""
    rng = np.random.default_rng(0)
    p = rng.uniform(size=(65, 65)).astype(np.float32)
    k_inv = np.linalg.inv(_k_matrix()).astype(np.float32)
    e = np.asarray(estimate_essential_matrix(jnp.asarray(p), jnp.asarray(k_inv),
                                             image_shape=(8, 8)))
    s = np.linalg.svd(e, compute_uv=False)
    assert s[2] < 1e-5 * max(s[0], 1e-12)
    np.testing.assert_allclose(s[0], s[1], rtol=1e-3)


def test_recovers_synthetic_epipolar_geometry():
    """Points generated from a known (R, t) must yield E with the right
    epipolar constraint: x2^T E x1 ~ 0 for all correspondences."""
    rng = np.random.default_rng(3)
    n = 64
    # Random 3-D points in front of two cameras.
    x3d = np.concatenate([rng.uniform(-1, 1, (n, 2)), rng.uniform(3, 6, (n, 1))],
                         axis=1)
    angle = 0.08
    r = np.array([[np.cos(angle), 0, np.sin(angle)],
                  [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]], np.float32)
    t = np.array([0.5, 0.1, 0.02], np.float32)
    x1 = x3d / x3d[:, 2:3]
    xc2 = (r @ x3d.T).T + t
    x2 = xc2 / xc2[:, 2:3]

    # Perfect one-to-one assignment matrix (identity + dustbin).
    p = np.zeros((n + 1, n + 1), np.float32)
    p[:n, :n] = np.eye(n)
    kpts1 = np.stack([x1[:, 1], x1[:, 0]], axis=-1).astype(np.float32)  # (y, x)
    kpts2 = np.stack([x2[:, 1], x2[:, 0]], axis=-1).astype(np.float32)
    valid = np.ones(n, bool)

    e = np.asarray(estimate_essential_from_keypoints(
        jnp.asarray(p), jnp.asarray(kpts1), jnp.asarray(kpts2),
        jnp.asarray(valid), jnp.asarray(valid), jnp.eye(3, dtype=jnp.float32)))

    # Epipolar residuals relative to E scale.
    h1 = np.concatenate([x1[:, :2], np.ones((n, 1))], axis=1)
    h2 = np.concatenate([x2[:, :2], np.ones((n, 1))], axis=1)
    resid = np.abs(np.einsum("ni,ij,nj->n", h2, e, h1))
    assert resid.max() < 1e-3 * np.abs(e).max()

    # And E must be parallel to the true E = [t]_x R.
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    e_true = tx @ r
    cos = np.abs((e * e_true).sum()) / (np.linalg.norm(e) * np.linalg.norm(e_true))
    assert cos > 0.999


def test_hartley_normalization_properties():
    rng = np.random.default_rng(1)
    pts = rng.normal(2.0, 3.0, (50, 2)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, 50).astype(np.float32)
    t, s, c = hartley_normalization(jnp.asarray(pts), jnp.asarray(w))
    t, s, c = np.asarray(t), float(s), np.asarray(c)
    pn = (pts - c) * s
    centroid = (w[:, None] * pn).sum(0) / w.sum()
    np.testing.assert_allclose(centroid, 0.0, atol=1e-5)
    rms = np.sqrt((w * (pn ** 2).sum(1)).sum() / w.sum())
    np.testing.assert_allclose(rms, np.sqrt(2.0), rtol=1e-4)
    # T applied to homogeneous pts equals (pts - c) * s.
    h = np.concatenate([pts, np.ones((50, 1), np.float32)], axis=1)
    np.testing.assert_allclose((h @ t.T)[:, :2], pn, atol=1e-4)


def test_min_eigvec9_against_numpy():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(20, 9)).astype(np.float32)
    m = a.T @ a
    v = np.asarray(min_eigvec9(jnp.asarray(m)))  # default eigh path
    w, vecs = np.linalg.eigh(m)
    v_true = vecs[:, 0]
    assert abs(np.dot(v, v_true)) > 0.999
    # The reference-parity power path converges at rate ~(1 - gap/trace);
    # verify it heads toward the same eigenvector given enough iterations.
    v_p = np.asarray(min_eigvec9(jnp.asarray(m), n_iter=20000, method="power"))
    assert abs(np.dot(v_p, v_true)) > 0.99


def test_manifold_projection_against_numpy_svd():
    rng = np.random.default_rng(4)
    e = rng.normal(size=(3, 3)).astype(np.float32)
    pe = np.asarray(project_onto_essential_manifold(jnp.asarray(e), n_iter=50))
    u, s, vt = np.linalg.svd(e)
    s_avg = (s[0] + s[1]) / 2
    e_true = u @ np.diag([s_avg, s_avg, 0.0]) @ vt
    # Sign-corrected U/V can flip overall sign; compare up to sign.
    err = min(np.abs(pe - e_true).max(), np.abs(pe + e_true).max())
    assert err < 1e-4 * s_avg


def test_kth_largest_matches_lax_topk():
    """The sort-free bidirectional-top-k threshold must equal lax.top_k's
    k-th value exactly, including duplicate-heavy inputs (the mask semantics
    of `essential_matrix_estimator.py:307-330` depend on it)."""
    import jax
    from onnx_image_processing_tpu.geometry.essential_matrix import _kth_largest

    rng = np.random.default_rng(7)
    for trial in range(4):
        p = rng.uniform(0, 1, (97, 83)).astype(np.float32)
        if trial >= 2:  # quantize to force long duplicate runs
            p = np.round(p * 8) / 8
        for k in (1, 2, 3, 5):
            ref_r = np.asarray(jax.lax.top_k(jnp.asarray(p), k)[0][:, k - 1:k])
            got_r = np.asarray(_kth_largest(jnp.asarray(p), k, axis=1))
            np.testing.assert_array_equal(ref_r, got_r)
            ref_c = np.asarray(jax.lax.top_k(jnp.asarray(p.T), k)[0][:, k - 1:k].T)
            got_c = np.asarray(_kth_largest(jnp.asarray(p), k, axis=0))
            np.testing.assert_array_equal(ref_c, got_c)


def test_min_eigvec9_fast_matches_eigh():
    """Unrolled-Cholesky inverse iteration vs exact eigh, including the
    near-singular spectra the 8-point normal matrix actually has."""
    rng = np.random.default_rng(8)
    for _ in range(10):
        a = rng.standard_normal((9, 9)).astype(np.float32)
        m = a @ a.T
        w, vecs = np.linalg.eigh(m)
        w[0] *= 1e-6  # min eigenvalue ~0, like a consistent 8-point system
        m = ((vecs * w) @ vecs.T).astype(np.float32)
        m = (m + m.T) / 2
        ve = np.asarray(min_eigvec9(jnp.asarray(m), method="eigh"))
        vf = np.asarray(min_eigvec9(jnp.asarray(m), method="fast"))
        assert min(np.abs(vf - ve).max(), np.abs(vf + ve).max()) < 1e-4


def test_manifold_projection_exact3_matches_f64():
    """Closed-form Cardano projection vs an f64 numpy oracle, covering the
    generic, sigma1~sigma2 (rotation-degenerate), and near-rank-2 cases."""
    rng = np.random.default_rng(9)
    for t in range(15):
        e = rng.standard_normal((3, 3)).astype(np.float32)
        if t % 3 == 1:
            u, s, vt = np.linalg.svd(e)
            s = np.array([1.0, 1.0 - 1e-6, 0.3], np.float32)
            e = ((u * s) @ vt).astype(np.float32)
        if t % 3 == 2:
            u, s, vt = np.linalg.svd(e)
            s = np.array([1.0, 0.8, 1e-7], np.float32)
            e = ((u * s) @ vt).astype(np.float32)
        u, s, vt = np.linalg.svd(e.astype(np.float64))
        s_avg = (s[0] + s[1]) / 2
        ref = u @ np.diag([s_avg, s_avg, 0.0]) @ vt
        got = np.asarray(project_onto_essential_manifold(jnp.asarray(e),
                                                         method="exact3"))
        assert np.abs(got - ref).max() < 2e-5 * np.abs(ref).max()


def test_essential_fast_method_matches_eigh_end_to_end():
    from onnx_image_processing_tpu.geometry.essential_matrix import (
        essential_from_weighted_points)

    rng = np.random.default_rng(10)
    r, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(r) < 0:
        r[:, 0] *= -1
    tv = rng.standard_normal(3)
    tv /= np.linalg.norm(tv)
    x3 = rng.uniform(-1, 1, (128, 3))
    x3[:, 2] += 4
    x1 = (x3[:, :2] / x3[:, 2:3]).astype(np.float32)
    xc = x3 @ r.T + tv
    x2 = (xc[:, :2] / xc[:, 2:3] + 1e-3 * rng.standard_normal((128, 2))).astype(
        np.float32)
    w = jnp.asarray(np.eye(128, dtype=np.float32))
    ef = np.array(essential_from_weighted_points(w, jnp.asarray(x1),
                                                 jnp.asarray(x2), method="fast"))
    ee = np.array(essential_from_weighted_points(w, jnp.asarray(x1),
                                                 jnp.asarray(x2), method="eigh"))
    ef /= np.linalg.norm(ef)
    ee /= np.linalg.norm(ee)
    if np.sum(ef * ee) < 0:
        ef = -ef
    assert np.abs(ef - ee).max() < 1e-4


def _two_view(n=256, noise=1e-3, outlier_frac=0.0, seed=0):
    """Matched normalized correspondences from a known (R, t), optionally
    contaminated by permuting a fraction of the image-2 points."""
    rng = np.random.default_rng(seed)
    x3 = np.concatenate([rng.uniform(-1, 1, (n, 2)), rng.uniform(3, 8, (n, 1))],
                        axis=1)
    ang = 0.1
    r = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([0.4, 0.1, 0.05])
    t = t / np.linalg.norm(t)
    x1 = (x3[:, :2] / x3[:, 2:3]).astype(np.float32)
    xc = x3 @ r.T + t
    x2 = (xc[:, :2] / xc[:, 2:3]).astype(np.float32)
    x1 += noise * rng.standard_normal((n, 2)).astype(np.float32)
    x2 += noise * rng.standard_normal((n, 2)).astype(np.float32)
    if outlier_frac:
        nout = int(outlier_frac * n)
        idx = rng.choice(n, nout, replace=False)
        x2[idx] = x2[idx][rng.permutation(nout)]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    e_true = tx @ r
    return x1, x2, e_true / np.linalg.norm(e_true)


def _e_err(e, e_true):
    e = np.asarray(e, np.float64)
    e = e / np.linalg.norm(e)
    return min(np.abs(e - e_true).max(), np.abs(e + e_true).max())


def test_sampson_error_matched_matches_matrix_diag():
    """Matched-pair Sampson must equal the diagonal of the all-pairs matrix,
    and broadcast over leading hypothesis axes."""
    from onnx_image_processing_tpu.geometry import sampson_error_matched
    from onnx_image_processing_tpu.geometry.essential_matrix import (
        sampson_error_matrix)

    rng = np.random.default_rng(5)
    x1, x2, e_true = _two_view(n=64, noise=5e-3)
    e = jnp.asarray(e_true.astype(np.float32))
    full = np.asarray(sampson_error_matrix(e, jnp.asarray(x1), jnp.asarray(x2)))
    diag = np.asarray(sampson_error_matched(e, jnp.asarray(x1), jnp.asarray(x2)))
    # einsum vs matmul contraction order: last-ulp f32 differences only.
    np.testing.assert_allclose(diag, np.diagonal(full), rtol=1e-4, atol=1e-12)

    es = jnp.asarray(rng.standard_normal((7, 3, 3)).astype(np.float32))
    batched = np.asarray(sampson_error_matched(es, jnp.asarray(x1),
                                               jnp.asarray(x2)))
    assert batched.shape == (7, 64)
    one = np.asarray(sampson_error_matched(es[3], jnp.asarray(x1),
                                           jnp.asarray(x2)))
    np.testing.assert_allclose(batched[3], one, rtol=1e-6)


def test_essential_from_matched_points_recovers_geometry():
    from onnx_image_processing_tpu.geometry import essential_from_matched_points

    x1, x2, e_true = _two_view(noise=1e-4)
    w = jnp.ones(len(x1), jnp.float32)
    e = essential_from_matched_points(w, jnp.asarray(x1), jnp.asarray(x2))
    assert _e_err(e, e_true) < 5e-3
    # "fast" method (the vmapped hypothesis solver) agrees with eigh.
    ef = essential_from_matched_points(w, jnp.asarray(x1), jnp.asarray(x2),
                                       method="fast")
    assert _e_err(ef, e_true) < 5e-3


def test_essential_ransac_rejects_outliers():
    """40% gross outliers: the vectorized RANSAC must stay near the true E
    where the plain weighted LS fit is pulled far off (the measured failure
    mode of the reference's soft-weighted in-graph solve)."""
    import jax

    from onnx_image_processing_tpu.geometry import (
        essential_from_matched_points, essential_ransac_from_candidates)

    from onnx_image_processing_tpu.geometry import sampson_error_matched

    x1, x2, e_true = _two_view(outlier_frac=0.4)
    tau = (2.0 / 300.0) ** 2  # 2 px at f=300 in normalized coords

    # Weights mildly correlated with correctness — the pipeline contract
    # (candidate weights are Sinkhorn probabilities, and wrong matches score
    # lower). Fully uninformative weights are a harsher setting where the
    # MSAC consensus itself gets noisy on some draws (~0.18 on this one).
    s_true = np.asarray(sampson_error_matched(
        jnp.asarray(e_true.astype(np.float32)), jnp.asarray(x1),
        jnp.asarray(x2)))
    inl = s_true < tau
    rng = np.random.default_rng(1)
    w = jnp.asarray(np.where(inl, rng.uniform(0.5, 1.0, len(x1)),
                             rng.uniform(0.1, 0.6, len(x1))).astype(np.float32))

    fn = jax.jit(lambda w, a, b: essential_ransac_from_candidates(
        w, a, b, tau, hypotheses=128, polish_iters=2))
    e_r = fn(w, jnp.asarray(x1), jnp.asarray(x2))
    e_ls = essential_from_matched_points(w, jnp.asarray(x1), jnp.asarray(x2))
    assert _e_err(e_r, e_true) < 0.1
    assert _e_err(e_ls, e_true) > 0.25  # the non-robust fit really is broken

    # Deterministic: the Gumbel table is a trace-time constant.
    e_r2 = fn(w, jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_array_equal(np.asarray(e_r), np.asarray(e_r2))


def test_essential_ransac_zero_weights_is_finite():
    from onnx_image_processing_tpu.geometry import (
        essential_ransac_from_candidates)

    rng = np.random.default_rng(12)
    w0 = jnp.zeros((64,), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-1, 1, (64, 2)).astype(np.float32))
    p2 = jnp.asarray(rng.uniform(-1, 1, (64, 2)).astype(np.float32))
    e = np.asarray(essential_ransac_from_candidates(w0, p1, p2, 1e-4,
                                                    hypotheses=16,
                                                    polish_iters=2))
    assert np.isfinite(e).all()


def test_estimate_essential_from_keypoints_ransac_mode():
    """Keypoint-level entry: contaminated P (30% wrong assignments) — the
    RANSAC mode must recover the true E, the soft LS solve must not."""
    from onnx_image_processing_tpu.geometry import (
        estimate_essential_from_keypoints)

    rng = np.random.default_rng(6)
    x1, x2, e_true = _two_view(n=128, noise=5e-4)
    n = len(x1)
    perm = np.arange(n)
    idx = rng.choice(n, int(0.3 * n), replace=False)
    perm[idx] = idx[rng.permutation(len(idx))]
    p = np.zeros((n + 1, n + 1), np.float32)
    p[np.arange(n), perm] = rng.uniform(0.5, 1.0, n).astype(np.float32)
    kpts1 = np.stack([x1[:, 1], x1[:, 0]], -1).astype(np.float32)  # (y, x)
    kpts2 = np.stack([x2[:, 1], x2[:, 0]], -1).astype(np.float32)
    valid = jnp.ones(n, bool)
    args = (jnp.asarray(p), jnp.asarray(kpts1), jnp.asarray(kpts2),
            valid, valid, jnp.eye(3, dtype=jnp.float32))
    # k_inv = I, so "pixels" are already normalized units: ransac_px is the
    # tolerance directly (3e-3 ~ a few px at a typical f).
    e_r = estimate_essential_from_keypoints(
        *args, ransac_hypotheses=128, irls_iters=2, ransac_px=3e-3)
    e_ls = estimate_essential_from_keypoints(*args)
    assert _e_err(e_r, e_true) < 0.05
    assert _e_err(e_r, e_true) < _e_err(e_ls, e_true)


def test_essential_zero_weights_is_finite():
    """Degenerate input (no matches anywhere) must not NaN on any method."""
    from onnx_image_processing_tpu.geometry.essential_matrix import (
        essential_from_weighted_points)

    rng = np.random.default_rng(11)
    w0 = jnp.zeros((64, 64), jnp.float32)
    p0 = jnp.asarray(rng.uniform(-1, 1, (64, 2)).astype(np.float32))
    for method in ("eigh", "fast", "power"):
        e0 = np.asarray(essential_from_weighted_points(w0, p0, p0, method=method))
        assert np.isfinite(e0).all(), method

"""Weighted 8-point essential-matrix estimation, fully in-graph.

TPU-native re-design of `pytorch_model/geometry/essential_matrix_estimator.py`.
The reference avoids SVD/eigh because ONNX opset 14 cannot export them
(`essential_matrix_estimator.py:7-22`); on TPU the same fixed-iteration power
iterations are *also* the right call — deterministic `lax.fori_loop`s of 9x9 /
3x3 matvecs compile to a handful of MXU/VPU ops with no SVD performance cliffs,
and they preserve output parity with the reference. The 9x9 normal matrix is
built by the same Kronecker factorization (never materializing the (N*M, 9)
design matrix; O(N+M) memory, two GEMMs — `essential_matrix_estimator
.py:351-382`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _det3(m: jax.Array) -> jax.Array:
    """Cofactor-expansion determinant of a 3x3 matrix."""
    return (m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
            - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
            + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]))


def min_eigvec9(m: jax.Array, n_iter: int = 30, method: str = "eigh") -> jax.Array:
    """Minimum eigenvector of a symmetric PSD 9x9 matrix.

    method="eigh" (default): exact ``jnp.linalg.eigh`` — a 9x9 solve is
    negligible on any backend and always converged. method="power" replicates
    the reference's trace-shifted power iteration
    (`essential_matrix_estimator.py:150-172`) bit-for-bit for parity testing.
    NOTE: the trace shift makes that iteration converge at rate
    ~(1 - gap/trace(M)); with realistic point sets trace(M) is O(100x) the
    spectral gap, so the reference's 30 iterations do NOT reach the true
    eigenvector — "power" exists for differential tests, not accuracy.
    """
    if method == "eigh":
        _, vecs = jnp.linalg.eigh(m)
        return vecs[:, 0]
    lam = jnp.trace(m)
    m_s = lam * jnp.eye(9, dtype=m.dtype) - m

    def body(_, v):
        v = m_s @ v
        return v / (jnp.linalg.norm(v) + 1e-8)

    v0 = jnp.full((9,), 1.0 / 3.0, dtype=m.dtype)
    return jax.lax.fori_loop(0, n_iter, body, v0)


def _power_iter3(b: jax.Array, n_iter: int) -> jax.Array:
    def body(_, v):
        v = b @ v
        return v / (jnp.linalg.norm(v) + 1e-8)

    v0 = jnp.full((3,), 1.0 / np.sqrt(3.0), dtype=b.dtype)
    return jax.lax.fori_loop(0, n_iter, body, v0)


def project_onto_essential_manifold(e: jax.Array, n_iter: int = 10,
                                    method: str = "svd") -> jax.Array:
    """Project a 3x3 matrix to singular values [s, s, 0].

    method="svd" (default): exact ``jnp.linalg.svd`` on the 3x3 with det-sign
    correction. method="power" replicates the reference's power-iteration SVD
    (`essential_matrix_estimator.py:174-240`): right singular vectors from
    power iterations on E^T E (largest) and its trace-shifted complement
    (smallest), completed by a cross product, with branch-free det-sign
    correction on both U and V.
    """
    if method == "svd":
        u, s, vt = jnp.linalg.svd(e)
        u = u.at[:, 2].multiply(jnp.sign(jnp.linalg.det(u)))
        v = vt.T
        v = v.at[:, 2].multiply(jnp.sign(jnp.linalg.det(v)))
        s_avg = (s[0] + s[1]) / 2.0
        d = jnp.diag(jnp.stack([s_avg, s_avg, jnp.zeros((), e.dtype)]))
        return u @ d @ v.T

    b = e.T @ e
    lam = jnp.trace(b)

    v1 = _power_iter3(b, n_iter)
    v3 = _power_iter3(lam * jnp.eye(3, dtype=b.dtype) - b, n_iter)
    v2 = jnp.cross(v3, v1)
    v2 = v2 / (jnp.linalg.norm(v2) + 1e-8)

    v = jnp.stack([v1, v2, v3], axis=-1)
    sign_v = jnp.sign(_det3(v))
    v = v.at[:, 2].multiply(sign_v)

    ev0 = e @ v[:, 0]
    ev1 = e @ v[:, 1]
    sigma1 = jnp.linalg.norm(ev0)
    sigma2 = jnp.linalg.norm(ev1)
    s_avg = (sigma1 + sigma2) / 2.0

    u1 = ev0 / (sigma1 + 1e-8)
    u2 = ev1 / (sigma2 + 1e-8)
    u3 = jnp.cross(u1, u2)
    u = jnp.stack([u1, u2, u3], axis=-1)
    sign_u = jnp.sign(_det3(u))
    u = u.at[:, 2].multiply(sign_u)

    s = jnp.diag(jnp.stack([s_avg, s_avg, jnp.zeros((), e.dtype)]))
    return u @ s @ v.T


def hartley_normalization(pts: jax.Array, weights: jax.Array):
    """Weighted Hartley normalization: centroid to origin, RMS distance sqrt(2).

    Args:
        pts: (N, 2) points; weights: (N,).

    Returns:
        (T (3,3), scale, centroid (2,)). Parity:
        `essential_matrix_estimator.py:242-286`.
    """
    w_sum = weights.sum() + 1e-8
    centroid = (weights[:, None] * pts).sum(axis=0) / w_sum
    pts_c = pts - centroid
    dist_sq = (pts_c ** 2).sum(axis=-1)
    mean_dist = jnp.sqrt((weights * dist_sq).sum() / w_sum + 1e-8)
    scale = jnp.sqrt(jnp.asarray(2.0, pts.dtype)) / (mean_dist + 1e-8)

    z = jnp.zeros((), pts.dtype)
    o = jnp.ones((), pts.dtype)
    t = jnp.stack([
        jnp.stack([scale, z, -scale * centroid[0]]),
        jnp.stack([z, scale, -scale * centroid[1]]),
        jnp.stack([z, z, o]),
    ])
    return t, scale, centroid


def bidirectional_topk_weights(p_core: jax.Array, top_k: int = 3,
                               prob_threshold: float = 0.01) -> jax.Array:
    """Keep P[i,j] only where it is top-k in BOTH its row and column and above
    an absolute threshold; surviving probabilities become 8-point weights.

    Parity: `essential_matrix_estimator.py:307-330`.
    """
    thresh_row = jax.lax.top_k(p_core, top_k)[0][:, top_k - 1:top_k]      # (N, 1)
    thresh_col = jax.lax.top_k(p_core.T, top_k)[0][:, top_k - 1:top_k].T  # (1, M)
    mask = (p_core >= thresh_row) & (p_core >= thresh_col) & (p_core > prob_threshold)
    return p_core * mask.astype(p_core.dtype)


def essential_from_weighted_points(
    weights: jax.Array,
    pts1_n: jax.Array,
    pts2_n: jax.Array,
    n_iter: int = 30,
    n_iter_manifold: int = 10,
    method: str = "eigh",
) -> jax.Array:
    """Core weighted 8-point solve from normalized (x, y) point sets.

    Args:
        weights: (N, M) pair weights (already masked).
        pts1_n: (N, 2) K^-1-normalized (x, y) coords of image-1 points.
        pts2_n: (M, 2) for image 2.
        method: "eigh" (default) solves the 9x9/3x3 eigenproblems exactly and
            denormalizes in the standard x2^T E x1 = 0 convention;
            "power" reproduces the reference's fixed-iteration scheme AND its
            denormalization formula T2^T E_raw T1
            (`essential_matrix_estimator.py:390-392`) for differential parity.

    Returns:
        (3, 3) essential matrix.
    """
    n = pts1_n.shape[0]
    m = pts2_n.shape[0]

    w1 = weights.sum(axis=1)
    w2 = weights.sum(axis=0)
    t1, s1, c1 = hartley_normalization(pts1_n, w1)
    t2, s2, c2 = hartley_normalization(pts2_n, w2)
    pts1_hn = (pts1_n - c1) * s1
    pts2_hn = (pts2_n - c2) * s2

    f1 = jnp.concatenate([pts1_hn, jnp.ones((n, 1), pts1_hn.dtype)], axis=-1)
    f2 = jnp.concatenate([pts2_hn, jnp.ones((m, 1), pts2_hn.dtype)], axis=-1)
    f1_flat = (f1[:, :, None] * f1[:, None, :]).reshape(n, 9)
    f2_flat = (f2[:, :, None] * f2[:, None, :]).reshape(m, 9)

    # HIGHEST: bf16-truncated operands here bias the 9x9 normal matrix.
    wf2 = jnp.matmul(weights, f2_flat,
                     precision=jax.lax.Precision.HIGHEST)   # (N, 9) MXU GEMM
    m_flat = jnp.matmul(f1_flat.T, wf2,
                        precision=jax.lax.Precision.HIGHEST)  # (9, 9)
    m_mat = m_flat.reshape(3, 3, 3, 3).transpose(0, 2, 1, 3).reshape(9, 9)

    if method == "power":
        e_raw = min_eigvec9(m_mat, n_iter, method="power").reshape(3, 3)
        e_denorm = t2.T @ e_raw @ t1
        return project_onto_essential_manifold(e_denorm, n_iter_manifold,
                                               method="power")
    # e_raw satisfies x1_hn^T e_raw x2_hn = 0 (design rows are f1 (x) f2), so
    # the standard-convention (x2^T E x1 = 0) denormalization is
    # (T1^T e_raw T2)^T.
    e_raw = min_eigvec9(m_mat, n_iter, method="eigh").reshape(3, 3)
    e_denorm = (t1.T @ e_raw @ t2).T
    return project_onto_essential_manifold(e_denorm, method="svd")


@partial(jax.jit, static_argnames=("image_shape", "top_k", "n_iter",
                                   "n_iter_manifold", "prob_threshold", "method"))
def estimate_essential_matrix(
    p: jax.Array,
    k_inv: jax.Array,
    image_shape: tuple[int, int] = (32, 32),
    top_k: int = 3,
    n_iter: int = 30,
    n_iter_manifold: int = 10,
    prob_threshold: float = 0.01,
    method: str = "eigh",
) -> jax.Array:
    """Standalone estimator: P + grid-mapped point indices → E.

    Feature point index i maps to pixel (x = i % W, y = i // W) on the
    configured grid; coordinates are normalized by ``k_inv``. Parity:
    `essential_matrix_estimator.py:292-399` (grid variant).

    Args:
        p: (N+1, M+1) Sinkhorn matrix with dustbin.
        k_inv: (3, 3) inverse camera intrinsics.

    Returns:
        (3, 3) essential matrix.
    """
    n = p.shape[0] - 1
    m = p.shape[1] - 1
    h, w = image_shape
    if h * w < max(n, m):
        raise ValueError(f"grid {image_shape} too small for N={n}, M={m}")

    p_core = p[:n, :m].astype(jnp.float32)
    weights = bidirectional_topk_weights(p_core, top_k, prob_threshold)

    idx = jnp.arange(h * w, dtype=jnp.float32)
    px = idx % w
    py = idx // w
    coords_h = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)     # (H*W, 3)
    coords_n = (coords_h @ k_inv.astype(jnp.float32).T)[:, :2]
    return essential_from_weighted_points(weights, coords_n[:n], coords_n[:m],
                                          n_iter, n_iter_manifold, method)


def estimate_essential_from_keypoints(
    p: jax.Array,
    keypoints1: jax.Array,
    keypoints2: jax.Array,
    valid1: jax.Array,
    valid2: jax.Array,
    k_inv: jax.Array,
    top_k: int = 3,
    n_iter: int = 30,
    n_iter_manifold: int = 10,
    method: str = "eigh",
) -> jax.Array:
    """E from actual (y, x) keypoints and their Sinkhorn matrix (batch-free).

    Invalid (padded (-1, -1)) keypoints get zero weight via the validity masks
    before the bidirectional top-k, exactly as the fused reference pipelines do
    (`shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix.py:212-218,349-357`).

    Args:
        p: (K+1, K+1); keypoints*: (K, 2) in (y, x); valid*: (K,) bool.

    Returns:
        (3, 3) essential matrix.
    """
    n = keypoints1.shape[0]
    m = keypoints2.shape[0]
    p_core = p[:n, :m].astype(jnp.float32)
    p_core = p_core * valid1.astype(p_core.dtype)[:, None]
    p_core = p_core * valid2.astype(p_core.dtype)[None, :]
    weights = bidirectional_topk_weights(p_core, top_k)

    k_inv = k_inv.astype(jnp.float32)

    def normalize(kpts):
        xy1 = jnp.stack([kpts[:, 1], kpts[:, 0], jnp.ones_like(kpts[:, 0])],
                        axis=-1)  # (K, 3) homogeneous (x, y, 1)
        return (xy1 @ k_inv.T)[:, :2]

    return essential_from_weighted_points(weights, normalize(keypoints1),
                                          normalize(keypoints2),
                                          n_iter, n_iter_manifold, method)

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



def _mm(a, b):
    """3x3/9x9 matmul with pinned f32 precision: XLA's default TPU matmul
    truncates operands to bf16, a ~1e-2 relative error on the essential
    matrix; these matrices are tiny so exactness is free."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

def _det3(m: jax.Array) -> jax.Array:
    """Cofactor-expansion determinant of a 3x3 matrix."""
    return (m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
            - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
            + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]))


def _chol_solve(a: jax.Array, rhs: jax.Array, jitter: float = 0.0):
    """Unrolled Cholesky factor + solve for a small static-size SPD matrix.

    Fully scalar-unrolled (n <= 9 here): XLA fuses the whole factorization and
    both triangular solves into one fusion with no device loops — unlike
    ``jnp.linalg.eigh``/``cholesky``, which lower to iterative LAPACK-style
    routines that cost tens of microseconds of sequential small ops on TPU.
    """
    n = a.shape[0]
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[i, j] + (jitter if i == j else 0.0)
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                l[i][j] = s / l[j][j]
    # forward substitution L y = rhs
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x)


def min_eigvec9(m: jax.Array, n_iter: int = 30, method: str = "eigh") -> jax.Array:
    """Minimum eigenvector of a symmetric PSD 9x9 matrix.

    method="eigh" (default): exact ``jnp.linalg.eigh`` — a 9x9 solve is
    negligible on any backend and always converged. method="fast": shifted
    inverse iteration with an unrolled 9x9 Cholesky solve — agrees with eigh
    to ~4e-6 and is exact f32 (no bf16 matmuls anywhere), but measured SLOWER
    on TPU than eigh (~37 us vs ~33 us standalone; ~40 us worse inside the
    full solve) because its ~700-op sequential scalar chain is latency-bound
    on the VPU, so it is an accuracy/portability alternative, not the
    default. method="power" replicates the
    reference's trace-shifted power iteration
    (`essential_matrix_estimator.py:150-172`) bit-for-bit for parity testing.
    NOTE: the trace shift makes that iteration converge at rate
    ~(1 - gap/trace(M)); with realistic point sets trace(M) is O(100x) the
    spectral gap, so the reference's 30 iterations do NOT reach the true
    eigenvector — "power" exists for differential tests, not accuracy.
    """
    if method == "fast":
        # delta regularizes the exactly-singular case (the min eigenvalue of
        # the 8-point normal matrix is ~0 by construction); it shifts the
        # spectrum uniformly so the minimizer is unchanged.
        delta = 1e-6 * jnp.trace(m) / 9.0 + 1e-30
        v = jnp.full((9,), 1.0 / 3.0, dtype=m.dtype)
        for _ in range(3):
            v = _chol_solve(m, v, jitter=delta)
            v = v / (jnp.linalg.norm(v) + 1e-30)
        return v
    if method == "eigh":
        _, vecs = jnp.linalg.eigh(m)
        return vecs[:, 0]
    if method != "power":
        raise ValueError(f"min_eigvec9: unknown method {method!r} "
                         "(expected 'eigh', 'fast', or 'power')")
    lam = jnp.trace(m)
    m_s = lam * jnp.eye(9, dtype=m.dtype) - m

    def body(_, v):
        v = _mm(m_s, v)
        return v / (jnp.linalg.norm(v) + 1e-8)

    v0 = jnp.full((9,), 1.0 / 3.0, dtype=m.dtype)
    return jax.lax.fori_loop(0, n_iter, body, v0)


def _power_iter3(b: jax.Array, n_iter: int) -> jax.Array:
    def body(_, v):
        v = _mm(b, v)
        return v / (jnp.linalg.norm(v) + 1e-8)

    v0 = jnp.full((3,), 1.0 / np.sqrt(3.0), dtype=b.dtype)
    return jax.lax.fori_loop(0, n_iter, body, v0)


def _eig3_sym(b: jax.Array):
    """Analytic eigenvalues (desc) of a symmetric 3x3 matrix (Cardano).

    Closed-form trigonometric solution of the characteristic cubic — exact to
    f32, one XLA fusion, no on-device iteration.
    """
    q = jnp.trace(b) / 3.0
    p1 = b[0, 1] ** 2 + b[0, 2] ** 2 + b[1, 2] ** 2
    p2 = ((b[0, 0] - q) ** 2 + (b[1, 1] - q) ** 2 + (b[2, 2] - q) ** 2
          + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    bn = (b - q * jnp.eye(3, dtype=b.dtype)) / p
    r = jnp.clip(_det3(bn) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    lam2 = 3.0 * q - lam1 - lam3
    return lam1, lam2, lam3


def _largest_column(m: jax.Array) -> jax.Array:
    """Column of a 3x3 matrix with the largest norm (branch-free)."""
    n = (m * m).sum(axis=0)
    best01 = jnp.where(n[0] >= n[1], 0, 1)
    best = jnp.where(n[best01] >= n[2], best01, 2)
    return m[:, best]


def project_onto_essential_manifold(e: jax.Array, n_iter: int = 10,
                                    method: str = "svd") -> jax.Array:
    """Project a 3x3 matrix to singular values [s, s, 0].

    method="svd" (default): exact ``jnp.linalg.svd`` with det-sign correction.
    method="exact3": closed-form — analytic eigenvalues of E^T E
    (Cardano), the null direction v3 from the adjugate of (E^T E - lam3 I)
    (well-conditioned: lam1, lam2 >> lam3 for any near-essential matrix), v1
    from the deflation product (B - lam2 I)(B - lam3 I) Gram-Schmidt'd against
    v3. When lam1 ~ lam2 the v1 direction is inherently arbitrary within the
    top subspace, and the projected output is invariant to that rotation to
    O(sigma1 - sigma2) — exactly the scale at which the product column
    degrades — so the fallback basis keeps the result correct. More accurate
    than the f32 on-device SVD (1.4e-6 vs 1.8e-5 against an f64 oracle) but
    measured no faster end-to-end (tiny-op dispatch dominates both), so it is
    an alternative, not the default.
    method="power" replicates the reference's power-iteration
    SVD (`essential_matrix_estimator.py:174-240`): right singular vectors from
    power iterations on E^T E (largest) and its trace-shifted complement
    (smallest), completed by a cross product, with branch-free det-sign
    correction on both U and V.
    """
    if method == "exact3":
        b = _mm(e.T, e)
        lam1, lam2, lam3 = _eig3_sym(b)
        eye = jnp.eye(3, dtype=b.dtype)
        # v3: null direction. Columns of adj(B - lam3 I) all lie along v3;
        # the largest one is numerically safest.
        a3 = b - lam3 * eye
        adj3 = jnp.stack([jnp.cross(a3[:, 1], a3[:, 2]),
                          jnp.cross(a3[:, 2], a3[:, 0]),
                          jnp.cross(a3[:, 0], a3[:, 1])], axis=-1)
        v3 = _largest_column(adj3)
        v3 = v3 / (jnp.linalg.norm(v3) + 1e-30)
        # v1: dominant direction from (B - lam2 I)(B - lam3 I) =
        # (lam1-lam2)(lam1-lam3) v1 v1^T, made robust by projecting out v3 and
        # falling back to the coordinate axis least aligned with v3.
        prod = _mm(b - lam2 * eye, b - lam3 * eye)
        v1 = _largest_column(prod)
        v1 = v1 - (v1 @ v3) * v3
        fb = eye[:, jnp.argmin(jnp.abs(v3))]
        fb = fb - (fb @ v3) * v3
        n1 = jnp.linalg.norm(v1)
        v1 = jnp.where(n1 > 1e-12 * jnp.abs(lam1) * jnp.abs(lam1 - lam3) + 1e-30,
                       v1 / (n1 + 1e-30), fb / (jnp.linalg.norm(fb) + 1e-30))
        v2 = jnp.cross(v3, v1)
        v2 = v2 / (jnp.linalg.norm(v2) + 1e-30)

        v = jnp.stack([v1, v2, v3], axis=-1)
        sign_v = jnp.sign(_det3(v))
        v = v.at[:, 2].multiply(sign_v)

        ev0 = _mm(e, v[:, 0])
        ev1 = _mm(e, v[:, 1])
        sigma1 = jnp.linalg.norm(ev0)
        sigma2 = jnp.linalg.norm(ev1)
        s_avg = (sigma1 + sigma2) / 2.0

        u1 = ev0 / (sigma1 + 1e-30)
        u2 = ev1 / (sigma2 + 1e-30)
        u3 = jnp.cross(u1, u2)
        u = jnp.stack([u1, u2, u3], axis=-1)
        sign_u = jnp.sign(_det3(u))
        u = u.at[:, 2].multiply(sign_u)

        s = jnp.diag(jnp.stack([s_avg, s_avg, jnp.zeros((), e.dtype)]))
        return _mm(_mm(u, s), v.T)
    if method == "svd":
        u, s, vt = jnp.linalg.svd(e)
        u = u.at[:, 2].multiply(jnp.sign(jnp.linalg.det(u)))
        v = vt.T
        v = v.at[:, 2].multiply(jnp.sign(jnp.linalg.det(v)))
        s_avg = (s[0] + s[1]) / 2.0
        d = jnp.diag(jnp.stack([s_avg, s_avg, jnp.zeros((), e.dtype)]))
        return _mm(_mm(u, d), v.T)
    if method != "power":
        raise ValueError(f"project_onto_essential_manifold: unknown method "
                         f"{method!r} (expected 'svd', 'exact3', or 'power')")

    b = _mm(e.T, e)
    lam = jnp.trace(b)

    v1 = _power_iter3(b, n_iter)
    v3 = _power_iter3(lam * jnp.eye(3, dtype=b.dtype) - b, n_iter)
    v2 = jnp.cross(v3, v1)
    v2 = v2 / (jnp.linalg.norm(v2) + 1e-8)

    v = jnp.stack([v1, v2, v3], axis=-1)
    sign_v = jnp.sign(_det3(v))
    v = v.at[:, 2].multiply(sign_v)

    ev0 = _mm(e, v[:, 0])
    ev1 = _mm(e, v[:, 1])
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
    return _mm(_mm(u, s), v.T)


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


def _kth_largest(p: jax.Array, k: int, axis: int) -> jax.Array:
    """k-th largest value (duplicates counted) along ``axis``, keepdims.

    Equals ``lax.top_k(p, k)[0][..., k-1]`` but via k max/count sweeps instead
    of a full sort — on TPU, sorting a (512, 512) matrix twice costs ~80 us
    while these sweeps are a few VPU passes. Iteration invariant: ``t`` is the
    c-th distinct level from the top and ``cnt`` counts elements >= t; once
    cnt >= k, t is the answer (index k-1 of the sorted-descending row falls
    inside t's run of duplicates).
    """
    t = jnp.max(p, axis=axis, keepdims=True)
    cnt = (p >= t).sum(axis=axis, keepdims=True)
    for _ in range(k - 1):
        nxt = jnp.max(jnp.where(p < t, p, -jnp.inf), axis=axis, keepdims=True)
        need_more = cnt < k
        t = jnp.where(need_more, nxt, t)
        cnt = jnp.where(need_more, (p >= t).sum(axis=axis, keepdims=True), cnt)
    return t


def bidirectional_topk_weights(p_core: jax.Array, top_k: int = 3,
                               prob_threshold: float = 0.01) -> jax.Array:
    """Keep P[i,j] only where it is top-k in BOTH its row and column and above
    an absolute threshold; surviving probabilities become 8-point weights.

    Parity: `essential_matrix_estimator.py:307-330` (the mask is identical to
    the reference's ``torch.topk`` thresholds; see ``_kth_largest``).
    """
    # Static shapes make this a free trace-time check; it preserves the
    # loud failure of the lax.top_k this replaced (a sweep past the axis
    # length would silently saturate at -inf and keep every element).
    if p_core.shape[0] < top_k or p_core.shape[1] < top_k:
        raise ValueError(
            f"bidirectional_topk_weights: P core shape {p_core.shape} has an "
            f"axis shorter than top_k={top_k}")
    thresh_row = _kth_largest(p_core, top_k, axis=1)      # (N, 1)
    thresh_col = _kth_largest(p_core, top_k, axis=0)      # (1, M)
    mask = (p_core >= thresh_row) & (p_core >= thresh_col) & (p_core > prob_threshold)
    return p_core * mask.astype(p_core.dtype)


def sampson_error_matrix(e: jax.Array, pts1_n: jax.Array, pts2_n: jax.Array,
                         eps: float = 1e-12) -> jax.Array:
    """All-pairs first-order geometric (Sampson) error for ``x2^T E x1 = 0``.

    Args:
        e: (3, 3) essential matrix in the standard convention.
        pts1_n / pts2_n: (N, 2) / (M, 2) normalized (x, y) points.

    Returns:
        (N, M) Sampson errors: (x2_j^T E x1_i)^2 / (|l2_i|^2 + |l1_j|^2)
        with l2 = E x1 (epipolar line in image 2) and l1 = E^T x2.
    """
    n, m = pts1_n.shape[0], pts2_n.shape[0]
    f1 = jnp.concatenate([pts1_n, jnp.ones((n, 1), pts1_n.dtype)], axis=-1)
    f2 = jnp.concatenate([pts2_n, jnp.ones((m, 1), pts2_n.dtype)], axis=-1)
    l2 = jnp.matmul(f1, e.T, precision=jax.lax.Precision.HIGHEST)   # (N, 3)
    l1 = jnp.matmul(f2, e, precision=jax.lax.Precision.HIGHEST)     # (M, 3)
    numer = jnp.matmul(l2, f2.T,
                       precision=jax.lax.Precision.HIGHEST) ** 2    # (N, M)
    denom = ((l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None]
             + (l1[:, 0] ** 2 + l1[:, 1] ** 2)[None, :])
    return numer / (denom + eps)


def sampson_error_matched(e: jax.Array, pts1_n: jax.Array, pts2_n: jax.Array,
                          eps: float = 1e-12) -> jax.Array:
    """Per-correspondence Sampson error for matched point PAIRS.

    The diagonal counterpart of :func:`sampson_error_matrix`, batched over
    leading E axes so one call scores every RANSAC hypothesis.

    Args:
        e: (..., 3, 3) essential matrices, standard ``x2^T E x1 = 0``.
        pts1_n / pts2_n: (N, 2) matched normalized (x, y) points (row i of
            image 1 corresponds to row i of image 2).

    Returns:
        (..., N) Sampson errors.
    """
    n = pts1_n.shape[0]
    f1 = jnp.concatenate([pts1_n, jnp.ones((n, 1), pts1_n.dtype)], axis=-1)
    f2 = jnp.concatenate([pts2_n, jnp.ones((n, 1), pts2_n.dtype)], axis=-1)
    # l2 = E x1 (epipolar line in image 2), l1 = E^T x2.
    l2 = jnp.einsum("...ab,nb->...na", e, f1,
                    precision=jax.lax.Precision.HIGHEST)
    l1 = jnp.einsum("...ab,na->...nb", e, f2,
                    precision=jax.lax.Precision.HIGHEST)
    numer = (l2 * f2).sum(axis=-1) ** 2
    denom = (l2[..., 0] ** 2 + l2[..., 1] ** 2
             + l1[..., 0] ** 2 + l1[..., 1] ** 2)
    return numer / (denom + eps)


def essential_from_matched_points(
    weights: jax.Array,
    pts1_n: jax.Array,
    pts2_n: jax.Array,
    method: str = "eigh",
    project: bool = True,
) -> jax.Array:
    """Weighted 8-point solve on 1-1 matched correspondences.

    The matched-pair counterpart of :func:`essential_from_weighted_points`
    (whose (N, M) soft-weight form mirrors the reference's all-pairs solve,
    `essential_matrix_estimator.py:351-382`): here row i of ``pts1_n``
    corresponds to row i of ``pts2_n`` with weight ``weights[i]``, so the
    design matrix is the explicit (N, 9) Kronecker rows and the normal matrix
    one tiny GEMM. This is the unit of work the in-graph RANSAC vmaps over
    hypotheses.

    Args:
        weights: (N,) per-correspondence weights.
        pts1_n / pts2_n: (N, 2) normalized (x, y) points.
        method: "eigh" (exact) or "fast" (unrolled-Cholesky inverse
            iteration — latency-bound scalar chain, so a vmap over S
            hypotheses costs the same wall clock as one solve).
        project: apply the essential-manifold projection. Hypothesis scoring
            skips it (Sampson error is well-defined for any rank-3 F and the
            projection's 3x3 eigensolve is the expensive part of the solve).

    Returns:
        (3, 3) essential matrix, standard ``x2^T E x1 = 0`` convention.
    """
    n = pts1_n.shape[0]
    t1, s1, c1 = hartley_normalization(pts1_n, weights)
    t2, s2, c2 = hartley_normalization(pts2_n, weights)
    pts1_hn = (pts1_n - c1) * s1
    pts2_hn = (pts2_n - c2) * s2
    h1 = jnp.concatenate([pts1_hn, jnp.ones((n, 1), pts1_hn.dtype)], axis=-1)
    h2 = jnp.concatenate([pts2_hn, jnp.ones((n, 1), pts2_hn.dtype)], axis=-1)
    # Design rows kron(h1_i, h2_i) — index (a*3+b) matches the all-pairs
    # solve's (f1-major, f2-minor) layout, so e_raw satisfies
    # x1_hn^T e_raw x2_hn = 0 and the same transposed denormalization applies.
    a = (h1[:, :, None] * h2[:, None, :]).reshape(n, 9)
    m_mat = jnp.matmul(a.T, weights[:, None] * a,
                       precision=jax.lax.Precision.HIGHEST)
    e_raw = min_eigvec9(m_mat, method=method).reshape(3, 3)
    e_denorm = _mm(_mm(t1.T, e_raw), t2).T
    if not project:
        return e_denorm
    return project_onto_essential_manifold(
        e_denorm, method="exact3" if method == "fast" else "svd")


def essential_ransac_from_candidates(
    weights: jax.Array,
    pts1_n: jax.Array,
    pts2_n: jax.Array,
    tau: jax.Array | float,
    hypotheses: int = 128,
    polish_iters: int = 2,
    seed: int = 0,
) -> jax.Array:
    """Fixed-shape vectorized RANSAC over matched candidate correspondences.

    The TPU-native robust estimator the reference's opset-14 graph cannot
    express and that IRLS alone cannot match: IRLS descends from the global
    soft-weighted fit, so when ambiguous matching puts that fit in the wrong
    basin, reweighting ENTRENCHES it (measured 28 -> 44 deg rotation RPE on
    the sprite scene, BASELINE.md round 4). RANSAC restarts from many minimal
    samples instead — and every stage here is static-shape and
    data-independent in its control flow, so the whole estimator jits,
    exports, and vmaps:

    1. **Hypothesis sampling** — weighted sampling WITHOUT replacement via the
       Gumbel-top-k trick: ``argtop_8(log w_i + G_si)`` over a fixed
       (hypotheses, N) Gumbel table drawn from a constant PRNG key at trace
       time (deterministic artifact, PROSAC-like: confident matches are
       sampled more often, which multiplies the all-inlier hypothesis rate).
    2. **Batched minimal solves** — ``vmap`` of the matched-pair 8-point
       solve with ``method="fast"``: the unrolled-Cholesky inverse iteration
       is a latency-bound scalar chain, so S hypotheses cost the same wall
       clock as one solve (each scalar becomes an (S,)-vector VPU op).
       Manifold projection is skipped for scoring.
    3. **MSAC scoring** — truncated inlier score
       ``sum_i w_i * max(0, 1 - sampson_i / tau)`` over ALL candidates, every
       hypothesis at once ((S, N) einsums).
    4. **Refit + polish** — weighted 8-point on the best hypothesis's hard
       inliers, then ``polish_iters`` Cauchy-IRLS steps (now safely inside
       the right basin — exactly where IRLS is strong).

    Args:
        weights: (N,) candidate weights; <= 0 marks invalid rows (they are
            never sampled and carry no score).
        pts1_n / pts2_n: (N, 2) matched normalized (x, y) candidates.
        tau: squared-Sampson inlier threshold in normalized coordinates
            (camera-aware: (px_tol / fx)^2, like a RANSAC pixel threshold).
        hypotheses: number of minimal samples (static; 128 default).
        polish_iters: Cauchy-IRLS iterations after the inlier refit.
        seed: PRNG seed for the (constant) Gumbel table.

    Returns:
        (3, 3) essential matrix.
    """
    n = weights.shape[0]
    tau = jnp.asarray(tau, jnp.float32)
    valid = weights > 0
    logw = jnp.where(valid, jnp.log(jnp.maximum(weights, 1e-30)), -jnp.inf)
    gumbel = jax.random.gumbel(jax.random.PRNGKey(seed), (hypotheses, n),
                               dtype=jnp.float32)
    _, idx = jax.lax.top_k(logw[None, :] + gumbel, 8)          # (S, 8)

    p1h = pts1_n[idx]                                          # (S, 8, 2)
    p2h = pts2_n[idx]
    # Uniform weights over the sampled (valid) points: a minimal sample is a
    # hard hypothesis, not a soft fit. Invalid picks (< 8 valid candidates)
    # zero out and the hypothesis degrades to a lower-rank LS — scored low.
    w8 = valid[idx].astype(jnp.float32)
    e_h = jax.vmap(
        lambda w, a, b: essential_from_matched_points(
            w, a, b, method="fast", project=False))(w8, p1h, p2h)  # (S, 3, 3)

    s_all = sampson_error_matched(e_h, pts1_n, pts2_n)          # (S, N)
    msac = jnp.maximum(0.0, 1.0 - s_all / (tau + jnp.float32(1e-30)))
    scores = (weights[None, :] * msac).sum(axis=1)              # (S,)
    best = jnp.argmax(scores)

    s_best = s_all[best]
    w_in = weights * (s_best < tau).astype(weights.dtype)
    e = essential_from_matched_points(w_in, pts1_n, pts2_n)

    if polish_iters:
        # LO-RANSAC-style local optimization: re-gate the inlier set against
        # the polished model each step, Cauchy-weighted within the gate —
        # with the gate threshold floored at 4x the current residual scale of
        # the TRUSTED core (the best hypothesis's inliers). Three measured
        # failure modes force this exact form:
        # (a) no gate at all — a just-outside-tau outlier still gets weight
        #     w/2 and drags the polish back toward the contaminated fit
        #     (sprite scene, round 4);
        # (b) re-gating at fixed tau — when tau sits near the inlier Sampson
        #     scale the gate collapses catastrophically (measured 59 -> 4 ->
        #     0 survivors on a 61%-inlier synthetic, ending in a garbage
        #     all-zero-weight solve);
        # (c) gating on a frozen/union set — collapse-proof but locks the
        #     hypothesis gate's false positives into every refit (deep-scene
        #     t-dir RPE 9.9 -> 14.4 deg vs 11.0 with re-gating).
        # The scale floor resolves the tension: when the model is good and
        # residuals are tiny the gate is exactly tau (full re-gate accuracy);
        # when tau is marginal relative to the true residual scale the floor
        # keeps every genuine inlier gated and the polish cannot collapse.
        in_core = w_in > 0
        n_core = in_core.sum()

        def body(_, e_cur):
            s = sampson_error_matched(e_cur, pts1_n, pts2_n)
            # Robust scale: MEDIAN residual of the trusted core under the
            # current model (a weighted mean is inflated by the hypothesis
            # gate's own false positives — measured as a too-wide gate that
            # costs deep-scene t-dir accuracy).
            s_sorted = jnp.sort(jnp.where(in_core, s, jnp.inf))
            sigma = s_sorted[jnp.clip((n_core - 1) // 2, 0, s.shape[0] - 1)]
            gate_tau = jnp.maximum(tau, 4.0 * jnp.where(jnp.isfinite(sigma),
                                                        sigma, 0.0))
            gate = (s < gate_tau).astype(weights.dtype)
            infl = 1.0 / (1.0 + s / (gate_tau + jnp.float32(1e-18)))
            return essential_from_matched_points(weights * gate * infl,
                                                 pts1_n, pts2_n)

        e = jax.lax.fori_loop(0, polish_iters, body, e)
    return e


def essential_from_weighted_points(
    weights: jax.Array,
    pts1_n: jax.Array,
    pts2_n: jax.Array,
    n_iter: int = 30,
    n_iter_manifold: int = 10,
    method: str = "eigh",
    irls_iters: int = 0,
    irls_tau: jax.Array | float | None = None,
) -> jax.Array:
    """Core weighted 8-point solve from normalized (x, y) point sets.

    Args:
        weights: (N, M) pair weights (already masked).
        pts1_n: (N, 2) K^-1-normalized (x, y) coords of image-1 points.
        pts2_n: (M, 2) for image 2.
        method: "eigh" (default) solves the 9x9/3x3 eigenproblems exactly
            and denormalizes in the standard x2^T E x1 = 0 convention; "fast"
            uses the unrolled-Cholesky inverse iteration + closed-form
            projection (f32-exact, bit-identical across backends, but
            measured slower on TPU — see ``min_eigvec9``).
            "power" reproduces the reference's fixed-iteration scheme AND its
            denormalization formula T2^T E_raw T1
            (`essential_matrix_estimator.py:390-392`) for differential parity.
        irls_iters: >0 adds fixed-iteration robust reweighting (IRLS): after
            each solve, every correspondence's weight is scaled by a Cauchy
            influence 1 / (1 + s / (c * sigma)) of its Sampson error s, with
            sigma the current weighted-mean error (c = 0.25), and the system
            is re-solved. This is the TPU-native robustness extension the
            reference's opset-14 graph cannot express (its in-graph solve is
            a single soft-weighted LS fit of ALL Sinkhorn weights,
            `shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix.py:184-271`,
            which ambiguous scenes break — 23.1 deg mean rotation RPE vs
            0.56 for RANSAC, BASELINE.md round 3). Fixed trip count, no
            data-dependent control flow — jit/export-safe. Not available
            with method="power" (that mode exists only for differential
            parity with the reference).

    Returns:
        (3, 3) essential matrix.
    """
    n = pts1_n.shape[0]
    m = pts2_n.shape[0]

    def solve(w):
        w1 = w.sum(axis=1)
        w2 = w.sum(axis=0)
        t1, s1, c1 = hartley_normalization(pts1_n, w1)
        t2, s2, c2 = hartley_normalization(pts2_n, w2)
        pts1_hn = (pts1_n - c1) * s1
        pts2_hn = (pts2_n - c2) * s2

        h1 = jnp.concatenate([pts1_hn, jnp.ones((n, 1), pts1_hn.dtype)],
                             axis=-1)
        h2 = jnp.concatenate([pts2_hn, jnp.ones((m, 1), pts2_hn.dtype)],
                             axis=-1)
        f1_flat = (h1[:, :, None] * h1[:, None, :]).reshape(n, 9)
        f2_flat = (h2[:, :, None] * h2[:, None, :]).reshape(m, 9)

        # HIGHEST: bf16-truncated operands here bias the 9x9 normal matrix.
        wf2 = jnp.matmul(w, f2_flat,
                         precision=jax.lax.Precision.HIGHEST)  # (N, 9) GEMM
        m_flat = jnp.matmul(f1_flat.T, wf2,
                            precision=jax.lax.Precision.HIGHEST)  # (9, 9)
        m_mat = m_flat.reshape(3, 3, 3, 3).transpose(0, 2, 1, 3).reshape(9, 9)

        if method == "power":
            e_raw = min_eigvec9(m_mat, n_iter, method="power").reshape(3, 3)
            e_denorm = _mm(_mm(t2.T, e_raw), t1)
            return project_onto_essential_manifold(e_denorm, n_iter_manifold,
                                                   method="power")
        # e_raw satisfies x1_hn^T e_raw x2_hn = 0 (design rows are
        # f1 (x) f2), so the standard-convention (x2^T E x1 = 0)
        # denormalization is (T1^T e_raw T2)^T.
        e_raw = min_eigvec9(m_mat, n_iter, method=method).reshape(3, 3)
        e_denorm = _mm(_mm(t1.T, e_raw), t2).T
        return project_onto_essential_manifold(
            e_denorm, method="exact3" if method == "fast" else "svd")

    e = solve(weights)
    if irls_iters:
        if method == "power":
            raise ValueError("irls_iters requires method 'eigh' or 'fast' "
                             "(method='power' is the reference-parity mode)")

        def body(_, e_cur):
            s = sampson_error_matrix(e_cur, pts1_n, pts2_n)
            if irls_tau is not None:
                tau = jnp.asarray(irls_tau, jnp.float32)
            else:
                # Scale-free fallback: weighted mean Sampson error. Weak
                # against gross outliers (they inflate the scale); prefer an
                # explicit camera-aware tau = (px_tol / f)^2.
                tau = (0.25 * (weights * s).sum()
                       / (weights.sum() + jnp.float32(1e-12)))
            infl = 1.0 / (1.0 + s / (tau + jnp.float32(1e-18)))
            return solve(weights * infl)

        e = jax.lax.fori_loop(0, irls_iters, body, e)
    return e


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
    # max(n, m) compares the two dims against each other, which is undecidable
    # for unrelated symbolic dims (shape-polymorphic export); check each side.
    if isinstance(n, int) and h * w < n:
        raise ValueError(f"grid {image_shape} too small for N={n}")
    if isinstance(m, int) and h * w < m:
        raise ValueError(f"grid {image_shape} too small for M={m}")

    p_core = p[:n, :m].astype(jnp.float32)
    weights = bidirectional_topk_weights(p_core, top_k, prob_threshold)

    idx = jnp.arange(h * w, dtype=jnp.float32)
    px = idx % w
    py = idx // w
    coords_h = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)     # (H*W, 3)
    coords_n = _mm(coords_h, k_inv.astype(jnp.float32).T)[:, :2]
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
    irls_iters: int = 0,
    irls_px: float = 2.0,
    ransac_hypotheses: int = 0,
    ransac_px: float = 0.75,
) -> jax.Array:
    """E from actual (y, x) keypoints and their Sinkhorn matrix (batch-free).

    Invalid (padded (-1, -1)) keypoints get zero weight via the validity masks
    before the bidirectional top-k, exactly as the fused reference pipelines do
    (`shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix.py:212-218,349-357`).

    Args:
        p: (K+1, K+1); keypoints*: (K, 2) in (y, x); valid*: (K,) bool.
        ransac_hypotheses: > 0 switches the solve to in-graph vectorized
            RANSAC (:func:`essential_ransac_from_candidates`) over the
            mutual-best-match candidates of P, with ``irls_iters`` Cauchy
            polish steps after the inlier refit. 0 (default) keeps the
            reference's soft-weighted LS solve (+ optional IRLS).
        ransac_px: RANSAC inlier threshold in pixels (camera-aware:
            tau = (px / fx)^2 in normalized squared Sampson error). The 0.75
            default is the measured accuracy optimum of a px in {0.5, 0.75,
            1, 2} x hypotheses in {128, 256} sweep on both 60-frame VO
            scenes (round 5, cached-match harness): at px0.75 the in-graph
            RANSAC beats the host cv2 stack on EVERY metric of the clean
            deep scene (ATE 0.188 vs 0.279, rot 0.303 vs 0.413, t-dir 9.6
            vs 9.9 deg at 256 hypotheses) where px2.0 trailed t-dir 14.3
            vs 9.9; px0.5 over-tightens (deep ATE 0.244). The MSAC gate is
            scale-floored in the polish, so a tight tau cannot collapse the
            inlier set (see essential_ransac_from_candidates).

    Returns:
        (3, 3) essential matrix.
    """
    n = keypoints1.shape[0]
    m = keypoints2.shape[0]
    p_core = p[:n, :m].astype(jnp.float32)
    p_core = p_core * valid1.astype(p_core.dtype)[:, None]
    p_core = p_core * valid2.astype(p_core.dtype)[None, :]

    k_inv = k_inv.astype(jnp.float32)

    def normalize(kpts):
        xy1 = jnp.stack([kpts[:, 1], kpts[:, 0], jnp.ones_like(kpts[:, 0])],
                        axis=-1)  # (K, 3) homogeneous (x, y, 1)
        return _mm(xy1, k_inv.T)[:, :2]

    if ransac_hypotheses:
        # Candidate list = mutual best matches of P (the same mutual-NN rule
        # the host extraction uses, `ops/match_extraction.py`), weighted by
        # their probability. One candidate per image-1 keypoint keeps the
        # shape static.
        j_best = jnp.argmax(p_core, axis=1)                    # (N,)
        i_best = jnp.argmax(p_core, axis=0)                    # (M,)
        mutual = i_best[j_best] == jnp.arange(n)
        w = p_core[jnp.arange(n), j_best] * mutual.astype(jnp.float32)
        w = w * (w > 0.01)  # reference's absolute probability floor
        pts1_n = normalize(keypoints1)
        pts2_n = normalize(keypoints2)[j_best]
        tau = (ransac_px * k_inv[0, 0]) ** 2
        return essential_ransac_from_candidates(
            w, pts1_n, pts2_n, tau,
            hypotheses=ransac_hypotheses, polish_iters=irls_iters)

    weights = bidirectional_topk_weights(p_core, top_k)
    # Camera-aware IRLS scale: a px_tol-pixel reprojection tolerance in
    # K^-1-normalized coordinates is (px_tol / f)^2 of squared Sampson error
    # (k_inv[0, 0] = 1/fx); computed from the RUNTIME intrinsics so one
    # compiled graph serves any camera.
    tau = (irls_px * k_inv[0, 0]) ** 2 if irls_iters else None
    return essential_from_weighted_points(weights, normalize(keypoints1),
                                          normalize(keypoints2),
                                          n_iter, n_iter_manifold, method,
                                          irls_iters=irls_iters,
                                          irls_tau=tau)

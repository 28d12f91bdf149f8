"""Log-domain Sinkhorn optimal-transport matching with dustbin (SuperGlue-style).

Functional re-design of `pytorch_model/matching/sinkhorn.py`. The cost matrix is an
MXU matmul; the row/column normalizations run as a ``lax.fori_loop`` (traced once —
the reference unrolls 20 iterations for ONNX, `sinkhorn.py:138-142`; under XLA a
rolled loop compiles smaller with identical numerics). All logsumexp accumulation is
kept in float32 — the reference pins fp32 on TensorRT because fp16 Sinkhorn NaNs
(`sample/provider_utils.py:40`), and the same guidance applies to bf16 on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..kernels import use_pallas_default


def _cost_matrix(desc1: jax.Array, desc2: jax.Array, distance_type: str) -> jax.Array:
    """Pairwise cost: squared-L2 via norms + matmul, or L1 (`sinkhorn.py:79-110`)."""
    if distance_type == "l2":
        n1 = jnp.sum(desc1 * desc1, axis=-1, keepdims=True)              # (B, N, 1)
        n2 = jnp.sum(desc2 * desc2, axis=-1, keepdims=True)              # (B, M, 1)
        # HIGHEST: XLA's default TPU matmul truncates f32 operands to bf16
        # (~0.4% relative), which perturbs P near the filter thresholds; the
        # cost matmul is tiny (~0.1 GFLOP at K=512).
        dots = jnp.einsum("bnd,bmd->bnm", desc1, desc2,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.maximum(n1 + jnp.swapaxes(n2, -2, -1) - 2.0 * dots, 0.0)
    if distance_type == "l1":
        return _l1_cost(desc1, desc2)
    raise ValueError(f"distance_type must be 'l1' or 'l2', got {distance_type}")


# Stream the L1 cost when the (B, N, M, D) difference tensor would exceed this
# many elements (~64 MB f32); at K=1024, D=512 the direct form is ~2 GB.
_L1_DIRECT_ELEMS = 1 << 24


def _l1_cost(desc1: jax.Array, desc2: jax.Array) -> jax.Array:
    """Pairwise L1 cost without materializing (B, N, M, D).

    L1 has no low-rank (matmul) decomposition, so the reference materializes
    the full 4-D difference tensor (`sinkhorn.py:106-110`) — ~2 GB f32 at
    K=1024, D=512. Here desc2 is streamed in column chunks under ``lax.scan``:
    peak memory is one (B, N, chunk, D) slab (~64 MB), compute is identical.
    """
    b, n, d = desc1.shape
    m = desc2.shape[1]
    # Symbolic dims (shape-polymorphic export) can't be compared with the
    # element budget at trace time; the chunking below also needs concrete
    # sizes, so polymorphic traces take the direct form.
    if (not all(isinstance(s, int) for s in (b, n, m, d))
            or b * n * m * d <= _L1_DIRECT_ELEMS):
        diff = desc1[:, :, None, :] - desc2[:, None, :, :]
        return jnp.sum(jnp.abs(diff), axis=-1)

    chunk = max(1, min(m, _L1_DIRECT_ELEMS // max(1, b * n * d)))
    mp = -(-m // chunk) * chunk
    d2 = jnp.pad(desc2, ((0, 0), (0, mp - m), (0, 0)))
    chunks = jnp.moveaxis(d2.reshape(b, mp // chunk, chunk, d), 1, 0)

    def body(_, d2_chunk):  # (B, chunk, D)
        c = jnp.sum(jnp.abs(desc1[:, :, None, :] - d2_chunk[:, None, :, :]),
                    axis=-1)
        return 0, c  # (B, N, chunk)

    _, out = jax.lax.scan(body, 0, chunks)
    out = jnp.moveaxis(out, 0, 2).reshape(b, n, mp)
    return out[:, :, :m]


def sinkhorn_match(
    desc1: jax.Array,
    desc2: jax.Array,
    iterations: int = 20,
    epsilon: float = 1.0,
    unused_score: float = 1.0,
    distance_type: str = "l2",
    use_pallas: bool | None = None,
) -> jax.Array:
    """Soft assignment between two descriptor sets.

    Args:
        desc1: (B, N, D) descriptors.
        desc2: (B, M, D) descriptors.
        iterations: fixed Sinkhorn iteration count.
        epsilon: entropy regularization (score temperature).
        unused_score: dustbin cost; dustbin log-score is ``-unused_score/epsilon``.
        distance_type: 'l2' (squared) or 'l1'.
        use_pallas: run the sweep loop as the VMEM-resident kernel
            (`kernels/sinkhorn_kernel.py` — measured bit-exact and 2.3x
            faster at K=512 on v5e, where the XLA loop re-reads the score
            matrix from HBM 2x per iteration). None picks by the default
            device platform (TPU -> kernel); symbolic or VMEM-exceeding
            shapes fall back to the fori_loop either way.

    Returns:
        (B, N+1, M+1) probability matrix P = exp(log_P); last row/column is the
        dustbin. Marginals: rows sum to 1 (dustbin row to M), columns to 1
        (dustbin column to N). Parity: `sinkhorn.py:149-208`.
    """
    if iterations <= 0:
        raise ValueError(f"iterations must be positive, got {iterations}")
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    desc1 = desc1.astype(jnp.float32)
    desc2 = desc2.astype(jnp.float32)
    b, n, _ = desc1.shape
    m = desc2.shape[1]

    cost = _cost_matrix(desc1, desc2, distance_type.lower())
    log_scores = jnp.pad(-cost / epsilon, ((0, 0), (0, 1), (0, 1)),
                         constant_values=-unused_score / epsilon)  # (B, N+1, M+1)

    # jnp.asarray (not float()) so N/M may be symbolic dims under a
    # shape-polymorphic jax.export trace (reference dynamic-axes parity).
    log_m = jnp.log(jnp.asarray(m, jnp.float32))
    log_n = jnp.log(jnp.asarray(n, jnp.float32))
    log_mu = jnp.concatenate(
        [jnp.zeros((b, n), jnp.float32),
         jnp.full((b, 1), 1.0, jnp.float32) * log_m], axis=1)
    log_nu = jnp.concatenate(
        [jnp.zeros((b, m), jnp.float32),
         jnp.full((b, 1), 1.0, jnp.float32) * log_n], axis=1)

    from ..kernels import sinkhorn_kernel
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas and sinkhorn_kernel.supports(n + 1, m + 1):
        return sinkhorn_kernel.sinkhorn_core(log_scores, log_mu, log_nu,
                                             iters=iterations)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(log_scores + v[:, None, :], axis=-1)
        v = log_nu - jax.nn.logsumexp(log_scores + u[:, :, None], axis=-2)
        return u, v

    # The zero inits ride on a varying anchor (the dustbin corner is
    # -unused_score/epsilon by construction — always finite — times 0.0 is
    # exactly 0.0): under shard_map's varying-manual-axes analysis,
    # constant-initialized carries would type as unvarying while the body
    # outputs vary, failing check_vma; deriving the inits from the (varying)
    # cost matrix makes the carry types match with bit-identical numerics,
    # so shard_batch runs with the soundness check ON.
    anchor = log_scores[:, -1, -1] * 0.0
    u0 = jnp.zeros_like(log_mu) + anchor[:, None]
    v0 = jnp.zeros_like(log_nu) + anchor[:, None]
    # unroll=4: identical op sequence (bit-exact), 4x fewer while-loop trips
    # — the loop bookkeeping was costing ~25% of the matcher's Sinkhorn time
    # in batched graphs (while.44 in the round-4 trace).
    u, v = jax.lax.fori_loop(0, iterations, body, (u0, v0), unroll=4)

    log_p = log_scores + u[:, :, None] + v[:, None, :]
    return jnp.exp(log_p)


def sinkhorn_match_with_scores(desc1, desc2, **kwargs):
    """As :func:`sinkhorn_match`, plus per-point best-match confidences.

    Returns:
        (P, scores0 (B, N), scores1 (B, M)) — max core probability per row/column.
        Parity: `sinkhorn.py:211-259`.
    """
    n, m = desc1.shape[1], desc2.shape[1]
    p = sinkhorn_match(desc1, desc2, **kwargs)
    core = p[:, :n, :m]
    return p, jnp.max(core, axis=-1), jnp.max(core, axis=-2)


def probability_ratio_mask(p_core: jax.Array, threshold: float) -> jax.Array:
    """Best/second-best ratio test per row. Parity: `sinkhorn.py:317-353`."""
    m = p_core.shape[-1]
    if m >= 2:
        top2 = jax.lax.top_k(p_core, 2)[0]
        best, second = top2[..., 0], top2[..., 1]
    else:
        best = p_core[..., 0]
        second = jnp.zeros_like(best)
    return (best / (second + 1e-8)) >= threshold


def dustbin_margin_mask(p: jax.Array, margin: float) -> jax.Array:
    """best-match minus dustbin probability margin test. Parity: `sinkhorn.py:355-389`."""
    n = p.shape[1] - 1
    m = p.shape[2] - 1
    core = p[:, :n, :m]
    dustbin = p[:, :n, m]
    return (jnp.max(core, axis=-1) - dustbin) >= margin


def sinkhorn_match_with_filters(
    desc1: jax.Array,
    desc2: jax.Array,
    iterations: int = 20,
    epsilon: float = 1.0,
    unused_score: float = 1.0,
    distance_type: str = "l2",
    ratio_threshold: float | None = None,
    dustbin_margin: float | None = None,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Sinkhorn matching with in-graph outlier filters.

    Filters follow the reference's enable semantics (`sinkhorn.py:303-433`):
    ratio filter active iff ``ratio_threshold > 0``; dustbin filter active iff
    ``dustbin_margin >= 0`` (None disables either). Filtered rows have their core
    probabilities zeroed and dustbin forced to 1.0 (`sinkhorn.py:436-463`).

    Returns:
        (P_filtered (B, N+1, M+1), valid_mask (B, N) bool).
    """
    ratio_threshold = -1.0 if ratio_threshold is None else ratio_threshold
    dustbin_margin = -1.0 if dustbin_margin is None else dustbin_margin

    n, m = desc1.shape[1], desc2.shape[1]
    p = sinkhorn_match(desc1, desc2, iterations=iterations, epsilon=epsilon,
                       unused_score=unused_score, distance_type=distance_type,
                       use_pallas=use_pallas)
    b = p.shape[0]
    valid = jnp.ones((b, n), dtype=bool)
    core = p[:, :n, :m]
    if ratio_threshold > 0:
        valid = valid & probability_ratio_mask(core, ratio_threshold)
    if dustbin_margin >= 0:
        valid = valid & dustbin_margin_mask(p, dustbin_margin)

    vf = valid.astype(p.dtype)[..., None]                  # (B, N, 1)
    core_f = core * vf
    dust_col = (1.0 - vf) + vf * p[:, :n, m:m + 1]          # (B, N, 1)
    rows = jnp.concatenate([core_f, dust_col], axis=-1)     # (B, N, M+1)
    p_f = jnp.concatenate([rows, p[:, n:n + 1, :]], axis=1)  # (B, N+1, M+1)
    return p_f, valid

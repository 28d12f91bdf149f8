"""Pallas TPU kernel: VMEM-resident log-domain Sinkhorn iterations.

The Sinkhorn sweep loop is a data-residency problem, not a compute problem:
each of the 20 iterations reads the full (N+1, M+1) score matrix twice (row
LSE then column LSE — `ops/sinkhorn.py:119-138`), so the XLA path moves
~40 × 1.05 MB = 42 MB of HBM traffic per K=512 matrix, which is exactly its
measured 57 µs at 810 GB/s. This kernel DMAs the matrix into VMEM once, runs
all iterations on the resident copy, and writes P once:

    measured (v5e):  57.1 -> 24.5 us @512 (2.3x),  128.8 -> 84.7 us @1024

Numerics are the same max-subtracted logsumexp recurrence in f32 (the
reference pins fp32 because fp16 Sinkhorn NaNs, `sample/provider_utils.py:40`);
measured outputs are **bit-exact** against the jnp `fori_loop` path at every
tested config (K∈{64,512,1024}, ε∈{0.05,1.0}) — pinned with zero tolerance in
the hardware tier and at 1e-6 in interpret mode.

Layout: scores padded to (8k rows, 128k lanes); u lives as a (R, 1) column,
v as a (1, C) row, so the row LSE is a lane reduction and the column LSE a
sublane reduction. Padding is masked to a finite -1e30 sentinel (not -inf:
inf arithmetic NaNs) **and u/v are re-masked every sweep** — an unmasked
padded row would otherwise receive u ≈ +1e30 from its all-sentinel LSE and
cancel the sentinel in the next column sweep, leaking exp(0)=1 weights into
real columns.

Parity: `pytorch_model/matching/sinkhorn.py:134-147` (fixed-count u/v
updates), `:164-200` (dustbin/marginal construction stays in
`ops/sinkhorn.py` — this kernel takes the assembled log_scores/log_mu/log_nu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Finite "minus infinity": pads must never NaN (inf - inf) and must survive
# one round of sentinel arithmetic (-1e30 + -1e30 is representable in f32).
_NEG = -1e30

# Three f32 buffers of the padded matrix (in block, out block, one live temp)
# must fit VMEM with pipelining headroom; K=1024 (4.75 MB each) is measured
# fine, K=2048 would be ~19 MB each — reject and fall back to the XLA path.
_VMEM_BUDGET_BYTES = 16 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports(n1, m1) -> bool:
    """True when the padded matrix fits the kernel's VMEM budget (static
    shapes only — symbolic dims from shape-polymorphic exports take the
    jnp path, whose shape arithmetic stays symbolic-safe)."""
    if not (isinstance(n1, int) and isinstance(m1, int)):
        return False
    r, c = _round_up(n1, 8), _round_up(m1, 128)
    return 3 * r * c * 4 <= _VMEM_BUDGET_BYTES


def _kernel(ls_ref, lmu_ref, lnu_ref, out_ref, *, iters: int, n1: int,
            m1: int):
    s = ls_ref[0]                                      # (R, C) f32, resident
    r, c = s.shape
    rowmask = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) < n1
    colmask = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) < m1
    s = jnp.where(rowmask & colmask, s, _NEG)
    lmu = lmu_ref[0]                                   # (R, 1)
    lnu = lnu_ref[0]                                   # (1, C)

    def body(_, uv):
        u, v = uv
        x = s + v                                      # (R, C)
        mx = jnp.max(x, axis=1, keepdims=True)
        u = lmu - (mx + jnp.log(jnp.sum(jnp.exp(x - mx), axis=1,
                                        keepdims=True)))
        u = jnp.where(rowmask, u, _NEG)
        y = s + u
        my = jnp.max(y, axis=0, keepdims=True)
        v = lnu - (my + jnp.log(jnp.sum(jnp.exp(y - my), axis=0,
                                        keepdims=True)))
        v = jnp.where(colmask, v, _NEG)
        return u, v

    u0 = jnp.zeros((r, 1), jnp.float32)
    v0 = jnp.where(colmask, 0.0, _NEG).astype(jnp.float32)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    out_ref[0] = jnp.exp(s + u + v)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def sinkhorn_core(log_scores: jax.Array, log_mu: jax.Array, log_nu: jax.Array,
                  iters: int = 20, interpret: bool = False) -> jax.Array:
    """Run ``iters`` Sinkhorn sweeps on (B, N1, M1) log-scores; returns P.

    Drop-in for the `ops/sinkhorn.py` fori_loop given the same assembled
    inputs (dustbin row/column already appended, marginals built).
    """
    b, n1, m1 = log_scores.shape
    r, c = _round_up(n1, 8), _round_up(m1, 128)
    ls = jnp.pad(log_scores, ((0, 0), (0, r - n1), (0, c - m1)))
    # Marginals ride as (B, R, 1) / (B, 1, C) so every block's trailing two
    # dims are tile-legal for ANY batch (a (1, R) block on a (B, R) array
    # violates Mosaic's sublane rule as soon as B > 1), and the kernel gets
    # them pre-shaped for its row/column broadcasts with no relayout.
    lmu = jnp.pad(log_mu, ((0, 0), (0, r - n1)))[:, :, None]
    lnu = jnp.pad(log_nu, ((0, 0), (0, c - m1)))[:, None, :]
    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters, n1=n1, m1=m1),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, r, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ls, lmu, lnu)
    return out[:, :n1, :m1]

"""Latency-hiding stream executor: overlap host I/O with device execution.

JAX dispatch is asynchronous — calling a jitted function enqueues work and
returns futures immediately; only materializing a result blocks. A naive
serving loop (``for x in stream: y = device_get(f(x))``) therefore serializes
host time (decode / preprocess / fetch) with device time. This runner keeps a
bounded window of in-flight steps so the device computes batch k while the
host is still producing batch k+1 and consuming batch k-1 — the streaming
analogue of the reference's per-frame ``session.run`` loop
(`sample/visual_odometry.py:520-550`), restructured for a device with an
async queue.

Ordering and results are identical to the sequential loop (pure functions,
no cross-step state); only wall-clock changes. Note the VO CLI cannot use
this for its pose loop — its reference-frame gating makes step k+1's input
depend on step k's host-side decision — but stateless workloads (batch
matching, dataset extraction, multi-camera streams) pipeline freely.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator

import jax


def vmap_pairs(fn: Callable, chunk: int | None = None) -> Callable:
    """Multi-pair single-chip throughput composition: vmap ``fn`` (a
    single-pair matcher of (1, 1, H, W) images) over a leading pair axis.

    Why this exists (measured, v5e, flagship 480x640/512, see BASELINE.md
    batch-scaling table): feeding a multi-pair batch through the pipeline's
    native stacked-(2B) layout triggers an XLA layout pathology — the NMS
    ``reduce_window_max`` inflates from 36 us (B=1) to ~756 us inside the
    fused B=2 graph, while the same op scales linearly standalone
    (benchmarks/batch_scaling.py --trace names it). vmapping B single-pair
    pipelines instead keeps every stage's B=1-native layout: 0.48-0.56
    ms/pair at B in {2..7} vs 0.60-0.97 stacked, best at B=6 — 0.478
    ms/pair, 2,091 pairs/s, +15% over the best single-pair rate. At B >= 8
    the vmapped graph hits the same reduce_window cliff (traced) — for
    deeper batching run one pair per device over the mesh (`shard_batch`)
    instead.

    Args:
        fn: callable (img1 (1,1,H,W), img2 (1,1,H,W)) -> pytree.
        chunk: optional sub-batch width. When B > chunk the vmap runs inside
            a sequential ``lax.map`` over B//chunk sub-batches, with any
            remainder (B % chunk pairs) executed as one final smaller vmap —
            so arbitrarily deep batches execute the chunk-sized graph at its
            measured flat rate instead of one giant vmapped graph — beyond
            B~8 the detect-stage stencil fusions lose ~5-10%/pair efficiency
            in the monolithic graph (round-4 trace; the round-3 reduce_window
            cliff itself is gone, killed by kernels/select_frontend.py).
            Compile cost note: the remainder executes a SECOND vmapped
            sub-graph at width B % chunk, so each distinct remainder width
            adds that sub-graph's compile time to its executable (each
            distinct B already specializes the whole jitted wrapper under
            XLA's static-shape rule). Serving loops with varying batch sizes
            should bucket B to a few fixed sizes — or pad to a multiple of
            ``chunk`` and drop the padded outputs — to bound compiles.

    Returns:
        callable (img1 (B,1,H,W), img2 (B,1,H,W)) -> pytree with a leading
        B axis on every leaf.
    """
    vm = jax.vmap(lambda a, b: fn(a[None], b[None]))

    def batched(img1, img2):
        out = vm(img1, img2)
        # fn's leaves carry their own leading batch-1 axis; squeeze it so the
        # result looks exactly like the stacked-batch call: (B, ...) leaves.
        return jax.tree_util.tree_map(lambda x: x[:, 0], out)

    # One implementation of the split/remainder/concat discipline:
    # chunk_batch below (identical results, tests/test_parallel.py).
    return batched if chunk is None else chunk_batch(batched, chunk)


def chunk_batch(fn: Callable, chunk: int = 8) -> Callable:
    """Run a batch-parallel ``fn`` over (B, ...) pytrees as sequential
    ``chunk``-sized sub-batches under ``lax.map`` — the batched-streaming
    analogue of ``vmap_pairs(chunk=...)``.

    Why (measured, v5e, flagship streaming 480x640/512 — BASELINE.md
    batched-streaming table, round 5): batched streaming is flat ~0.24-0.26
    ms/pair at B in {1, 2, 8, 16} but XLA's detect-stage stencil fusions
    degrade at other batch sizes (B=4 0.289, B=12 0.301 ms/pair — the
    op-level trace attributes the whole +56 us/pair at B=12 to the
    Gaussian-moment multiply_add fusions and added layout copies, while the
    Pallas stages stay flat to the microsecond). Chunking at 8 executes the
    B=8 graph at its measured sweet-spot rate for any depth; a remainder
    (B % chunk) runs as one final smaller sub-batch.

    Every leaf of ``fn``'s arguments and outputs must carry the same leading
    batch axis (true of ``build_streaming``'s extract/match and any
    batch-parallel pipeline — NOT of the essential matchers' unbatched
    ``k_inv`` argument; close over such extras instead). Results are
    bit-identical to the unchunked call on CPU (tests/test_parallel.py);
    on TPU a remainder sub-batch compiles a different-width graph, whose
    XLA fusions may re-tile and move f32 outputs at ulp scale — the same
    measured class as the streaming split's P band (BASELINE.md). Don't
    compose with bit-equality checks across chunk boundaries on TPU.
    Compile cost: as with ``vmap_pairs``, each
    distinct remainder width compiles its own sub-graph — bucket B or pad to
    a multiple of ``chunk`` in serving loops with varying batch sizes.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")

    def chunked(*args):
        import jax.numpy as jnp

        b = jax.tree_util.tree_leaves(args)[0].shape[0]
        if b <= chunk:
            return fn(*args)
        nc, rem = divmod(b, chunk)
        bf = nc * chunk
        head = jax.tree_util.tree_map(
            lambda x: x[:bf].reshape((nc, chunk) + x.shape[1:]), args)
        out = jax.lax.map(lambda a: fn(*a), head)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((bf,) + x.shape[2:]), out)
        if rem:
            tail = fn(*jax.tree_util.tree_map(lambda x: x[bf:], args))
            out = jax.tree_util.tree_map(
                lambda x, y: jnp.concatenate([x, y], axis=0), out, tail)
        return out

    return chunked


def stream_map_chunked(fn_batched: Callable, pairs: Iterable, chunk: int,
                       depth: int = 2) -> Iterator:
    """Serve (img1, img2) pairs through a BATCHED matcher, ``chunk`` pairs per
    device round trip.

    On a remote/tunneled device every dispatch costs ~3 serialized round
    trips (two uploads + one fetch); per-pair streaming is therefore
    RTT-bound regardless of pipeline depth (measured: ~9 pairs/s on this
    rig's ~40 ms tunnel vs the chip's ~1,800 pairs/s). Chunking amortizes:
    one upload of (chunk, 1, H, W) per side, one batched execution
    (`models.build_batched` / `vmap_pairs` — see BASELINE.md batch scaling;
    chunk ≈ 4–6 is the measured per-pair optimum on v5e), one fetch — the
    per-pair tunnel cost falls ~chunk×, bounded below by transfer bandwidth
    and the chip.

    Args:
        fn_batched: callable over ((C,1,H,W), (C,1,H,W)) batches — e.g.
            ``models.build_batched(name, ...)``.
        pairs: iterable of (img1 (1,1,H,W)-like, img2) host arrays.
        chunk: pairs per device round trip. The final short chunk is padded
            to ``chunk`` by repeating its last pair (results are sliced back,
            so callers see exactly one result per input pair).
        depth: chunks in flight (as in ``stream_map``).

    Yields:
        Per-pair result pytrees (leaves have their leading chunk axis
        sliced), in input order.
    """
    import jax.numpy as jnp
    import numpy as np

    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")

    def chunks():
        buf = []
        for pair in pairs:
            buf.append(pair)
            if len(buf) == chunk:
                yield buf, chunk
                buf = []
        if buf:
            n = len(buf)
            buf = buf + [buf[-1]] * (chunk - n)  # pad; slice back below
            yield buf, n

    def run(item):
        buf, n = item
        # Stack on the HOST so each side is ONE device transfer per chunk —
        # device-side concatenate of per-pair jnp.asarray uploads would pay
        # the per-transfer round trip chunk times over (measured: chunk=8
        # that way was SLOWER than unchunked on the tunneled rig).
        a = jnp.asarray(np.concatenate([np.asarray(p[0]) for p in buf], 0))
        b = jnp.asarray(np.concatenate([np.asarray(p[1]) for p in buf], 0))
        return fn_batched(a, b), n

    pending: deque = deque()
    for item in chunks():
        if len(pending) >= depth:
            out, n = pending.popleft()
            out = jax.device_get(out)
            for i in range(n):
                yield jax.tree_util.tree_map(lambda x: x[i], out)
        pending.append(run(item))
    while pending:
        out, n = pending.popleft()
        out = jax.device_get(out)
        for i in range(n):
            yield jax.tree_util.tree_map(lambda x: x[i], out)


def stream_map(fn: Callable, inputs: Iterable, depth: int = 2) -> Iterator:
    """Map ``fn`` over ``inputs`` with up to ``depth`` steps in flight.

    Args:
        fn: a (jitted) function of one step's inputs; called as ``fn(*x)`` for
            tuple elements, ``fn(x)`` otherwise.
        inputs: iterable of per-step inputs (consumed lazily — pair this with
            a generator that does the host-side decode/preprocess).
        depth: maximum in-flight steps. 1 reproduces the sequential loop;
            2 overlaps one step of host work with device execution.

    Yields:
        Fully materialized (host) results per step, in order.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    pending: deque = deque()
    for x in inputs:
        # Drain BEFORE dispatching so at most `depth` steps are ever in
        # flight (dispatch-then-drain would hold depth+1, breaking the
        # documented memory bound and making depth=1 overlap a step).
        if len(pending) >= depth:
            yield jax.device_get(pending.popleft())
        out = fn(*x) if isinstance(x, tuple) else fn(x)
        pending.append(out)
    while pending:
        yield jax.device_get(pending.popleft())

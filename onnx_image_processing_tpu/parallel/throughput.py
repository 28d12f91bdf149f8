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


def vmap_pairs(fn: Callable) -> Callable:
    """Multi-pair single-chip throughput composition: vmap ``fn`` (a
    single-pair matcher of (1, 1, H, W) images) over a leading pair axis.

    Why this exists (measured, v5e, flagship 480x640/512, see BASELINE.md
    batch-scaling table): feeding a multi-pair batch through the pipeline's
    native stacked-(2B) layout triggers an XLA layout pathology — the NMS
    ``reduce_window_max`` inflates from 36 us (B=1) to ~756 us inside the
    fused B=2 graph, while the same op scales linearly standalone
    (benchmarks/batch_scaling.py --trace names it; /tmp probe ruled out the
    op itself). vmapping B single-pair pipelines instead keeps every stage's
    native layout: 0.52-0.56 ms/pair at B in {2, 4} vs 0.75-0.96 stacked,
    and B=4 (1,930 pairs/s) beats even B=1 (1,810). At B >= 8 the vmapped
    graph regresses (VMEM pressure) — for deeper batching run one pair per
    device over the mesh (`shard_batch`) instead.

    Args:
        fn: callable (img1 (1,1,H,W), img2 (1,1,H,W)) -> pytree.

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

    return batched


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

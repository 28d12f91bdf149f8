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

"""Shared device-timing protocol for a tunneled TPU.

Host-synchronized per-call timing on this rig measures the host<->device
tunnel (~40 ms round trip), not the chip. Two honest protocols, both based on
chaining N iterations on-device in a ``lax.scan`` with an inter-iteration data
dependency and syncing once:

* **Differential chain lengths** (primary): time chains of length n and 3n;
  ms/frame = (T(3n) - T(n)) / (2n). The tunnel round trip, host dispatch, and
  any fixed overhead cancel exactly — no separately-measured RTT floor to
  trust (round-1 subtracted a tiny-op RTT estimate, which was self-certified).
* **On-device trace** (cross-check): run one chain under ``jax.profiler.trace``
  and sum the XLA-module durations recorded by the device itself; ms/frame =
  device_time / n. Needs no host-timing assumptions at all.

Both are exposed here; ``chain_time`` returns the differential measurement and
``device_trace_time`` the profiler one.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
import time

import numpy as np

# TPU v5e peaks, shared by every MFU/HBM-utilization report.
PEAK_BF16_FLOPS = 1.97e14
PEAK_HBM_BYTES = 8.1e11


def setup_cache():
    """Enable the persistent XLA compilation cache (shared by every benchmark
    entry point; the CLIs have their own copy in cli/common.select_platform,
    which package code must not import from benchmarks)."""
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/oip_tpu_xla"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _once(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # force D2H sync
    return time.perf_counter() - t0


def _build_chain(step_fn, n):
    """jit(scan) of ``step_fn(*carry) -> (scalar, new_carry)`` chained n times."""
    import jax

    @jax.jit
    def run(*a):
        def body(carry, _):
            out_scalar, new_carry = step_fn(*carry)
            return new_carry, out_scalar

        _, outs = jax.lax.scan(body, a, None, length=n)
        return outs.sum()

    return run


def chain_time(step_fn, args, n=50, reps=4):
    """Differential-chain ms/iteration of ``step_fn`` (see module docstring)."""
    short = _build_chain(step_fn, n)
    long = _build_chain(step_fn, 3 * n)
    float(short(*args))  # compile + warm both lengths
    float(long(*args))
    t_short = min(_once(short, args) for _ in range(reps))
    t_long = min(_once(long, args) for _ in range(reps))
    return max(t_long - t_short, 1e-9) * 1e3 / (2 * n)


def device_trace_time(step_fn, args, n=50):
    """On-device ms/iteration from a jax.profiler trace (None if unavailable).

    Sums the 'XLA Modules' stream durations on the device process — the
    device's own account of execution time, independent of host clocks and
    tunnel latency.
    """
    import jax

    run = _build_chain(step_fn, n)
    float(run(*args))  # compile + warm outside the trace
    with tempfile.TemporaryDirectory() as d:
        try:
            with jax.profiler.trace(d):
                float(run(*args))
        except Exception:
            return None
        total_us = _sum_device_module_us(d)
    return None if total_us is None else total_us * 1e-3 / n


def _sum_device_module_us(trace_dir):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))}
    module_tids = {
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in device_pids
        and e.get("args", {}).get("name") == "XLA Modules"}
    if not module_tids:
        return None
    return sum(e.get("dur", 0.0) for e in events
               if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in module_tids)

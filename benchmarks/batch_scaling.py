"""Multi-pair batch scaling of the flagship matcher + trace-level diagnosis.

Round-2 BASELINE recorded a fused-graph anomaly: B=2 pairs/step measured
2.0 ms while the per-stage sum predicts 0.98 ms, so deployment fell back to
one pair per device. This tool (a) reproduces the B-sweep with the
differential-chain protocol, (b) captures a device trace per B and aggregates
the XLA-Ops stream by op, so the overhead shows up as named ops rather than a
"scheduling/VMEM pressure" guess, and (c) optionally benchmarks alternative
batching strategies (vmap over pairs; donated buffers) side by side.

Usage:
    python benchmarks/batch_scaling.py [--bs 1 2 4 8] [--trace] [--alt]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import chain_time, setup_cache  # noqa: E402


def _images(b, h=480, w=640, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    i1 = np.stack([np.clip(np.roll(base, i, 0) + rng.normal(0, 3, (h, w)), 0, 255)
                   for i in range(b)]).astype(np.float32)[:, None]
    i2 = np.stack([np.clip(np.roll(base, 7 + i, 1) + rng.normal(0, 3, (h, w)), 0, 255)
                   for i in range(b)]).astype(np.float32)[:, None]
    return jnp.asarray(i1), jnp.asarray(i2)


def _flagship_cfg():
    from onnx_image_processing_tpu import models

    return models.get("shi_tomasi_angle_sparse_bad_sinkhorn").defaults.with_(
        max_keypoints=512, num_pairs=512)


def _step_stacked(cfg):
    """The shipped path: (img1, img2) each (B,1,H,W) -> stacked (2B) batch."""
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match)

    def step(a, b):
        _, _, p = shi_tomasi_angle_sparse_bad_sinkhorn_match(a, b, cfg)
        # Depend on EVERY pair's full output — a single-element dependency
        # (p[0,0,0]) lets XLA dead-code-eliminate other pairs' compute in
        # batched graphs (observed: a 0.15 ms/pair mirage at B=7 vmapped).
        tot = p.sum()
        eps = tot * 1e-12
        return tot, (a + eps, b + eps)

    return step


def _step_vmapped(cfg):
    """Alternative: vmap the B=1 pipeline over a leading pair axis."""
    import jax

    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match)

    def one(a, b):
        return shi_tomasi_angle_sparse_bad_sinkhorn_match(a[None], b[None], cfg)

    vm = jax.vmap(one)

    def step(a, b):  # a, b: (B, 1, H, W) -> vmap over B of (1,1,H,W) pipelines
        _, _, p = vm(a, b)
        tot = p.sum()  # all pairs: see _step_stacked on DCE
        eps = tot * 1e-12
        return tot, (a + eps, b + eps)

    return step


def _step_split(cfg):
    """Alternative: B independent single-pair pipelines in one jit step (no
    stacked batch at all) — isolates whether the (2B)-batch layout itself
    causes the fused-graph overhead, and models 'several pairs in flight'
    serving without stream_map."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match)

    def step(a, b):  # a, b: (B, 1, H, W)
        outs = []
        for i in range(a.shape[0]):
            _, _, p = shi_tomasi_angle_sparse_bad_sinkhorn_match(
                a[i:i + 1], b[i:i + 1], cfg)
            outs.append(p.sum())  # full-output dependency, identical to
            # _step_stacked/_step_vmapped — a single-element dependency would
            # let XLA DCE most of each pair's compute (see those variants).
        tot = jnp.stack(outs).sum()
        eps = tot * 1e-12
        return tot, (a + eps, b + eps)

    return step


def sweep(bs, variant="stacked", n=30):
    cfg = _flagship_cfg()
    make = {"stacked": _step_stacked, "vmapped": _step_vmapped,
            "split": _step_split}[variant]
    out = []
    for b in bs:
        i1, i2 = _images(b)
        ms = chain_time(make(cfg), (i1, i2), n=n)
        rec = {"variant": variant, "B": b, "ms_per_step": round(ms, 3),
               "ms_per_pair": round(ms / b, 3),
               "pairs_per_s": round(b * 1e3 / ms, 1)}
        print(json.dumps(rec))
        out.append(rec)
    return out


# ---------------------------------------------------------------------------
# Trace aggregation: name every microsecond of the fused multi-pair graph.
# ---------------------------------------------------------------------------

def _aggregate_ops(trace_dir):
    """Per-op total duration from the device 'XLA Ops' stream (us)."""
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
    op_tids = {
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in device_pids
        and "XLA Ops" in str(e.get("args", {}).get("name", ""))}
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            a = agg[e.get("name", "?")]
            a[0] += e.get("dur", 0.0)
            a[1] += 1
    return agg


def trace_b(b, n=30, top=25, variant="stacked"):
    import tempfile

    import jax

    cfg = _flagship_cfg()
    step = {"stacked": _step_stacked, "vmapped": _step_vmapped,
            "split": _step_split}[variant](cfg)
    i1, i2 = _images(b)

    from benchmarks.timing import _build_chain

    run = _build_chain(step, n)
    float(run(i1, i2))  # compile + warm
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            float(run(i1, i2))
        agg = _aggregate_ops(d)
    if agg is None:
        print(json.dumps({"B": b, "error": "no trace"}))
        return
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for v in agg.values())
    print(json.dumps({"B": b, "variant": variant,
                      "total_us_per_step": round(total / n, 1),
                      "ops": [
                          {"op": k[:90], "us_per_step": round(v[0] / n, 1),
                           "count": v[1] // n}
                          for k, v in rows[:top]]}, indent=1))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--bs", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--variant",
                    choices=["stacked", "vmapped", "split", "both"],
                    default="stacked")
    ap.add_argument("--trace", action="store_true",
                    help="aggregate a device trace per B instead of timing")
    args = ap.parse_args()
    setup_cache()
    if args.trace:
        for b in args.bs:
            for v in (["stacked", "vmapped", "split"]
                      if args.variant == "both" else [args.variant]):
                trace_b(b, variant=v)
        return 0
    variants = (["stacked", "vmapped", "split"] if args.variant == "both"
                else [args.variant])
    for v in variants:
        sweep(args.bs, v)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Batch compile CLI — the export-registry analogue.

Counterpart of `onnx_export/export.py:21-178`: where the reference exports its
8 registry configs to .onnx as a CI entry point, this AOT-compiles every
registered pipeline at the deployment shape and reports compile success +
cost analysis. A compiled executable is the deployable artifact here.
"""

from __future__ import annotations

import argparse
import time

from .. import models
from .common import add_platform_arg, select_platform


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Compile-check all registry pipelines")
    p.add_argument("--models", nargs="*", default=None,
                   help="pipeline names (default: all)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--max-keypoints", type=int, default=None)
    add_platform_arg(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    select_platform(args.platform)

    names = args.models or models.names()
    failures = []
    for name in names:
        overrides = {}
        if args.max_keypoints is not None:
            overrides["max_keypoints"] = args.max_keypoints
        t0 = time.perf_counter()
        try:
            compiled = models.compile_model(name, args.height, args.width,
                                            **overrides)
            dt = time.perf_counter() - t0
            cost = compiled.cost_analysis()
            flops = (cost or {}).get("flops", float("nan"))
            print(f"[OK]   {name}: compiled in {dt:.1f}s, {flops:.3g} flops")
        except Exception as err:  # report every failure, keep going
            failures.append(name)
            print(f"[FAIL] {name}: {err}")
    if failures:
        print(f"\n{len(failures)} pipeline(s) failed: {failures}")
        return 1
    print(f"\nAll {len(names)} pipelines compiled.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Batch compile / export CLI — the export-registry analogue.

Counterpart of `onnx_export/export.py:21-178`: where the reference exports its
8 registry configs to .onnx as a CI entry point, this AOT-compiles every
registered pipeline at the deployment shape and reports compile success + cost
analysis; with ``--output-dir`` it additionally serializes each pipeline to a
StableHLO ``jax.export`` artifact (the deployable file the reference attaches
to releases, `.github/workflows/release.yml:55-64`) and verifies a
load-and-call round trip.
"""

from __future__ import annotations

import argparse
import os
import time

from .. import models
from .common import add_platform_arg, select_platform


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Compile-check / serialize all registry pipelines")
    p.add_argument("--models", nargs="*", default=None,
                   help="pipeline names (default: all)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--max-keypoints", type=int, default=None)
    p.add_argument("--output-dir", "-o", default=None,
                   help="write <name>.<platform>.jaxexport artifacts here")
    p.add_argument("--dynamic", action="store_true",
                   help="shape-polymorphic artifacts (reference --dynamic-axes"
                        " parity); only pipelines with symbolic-dim support, "
                        "default model set narrows accordingly")
    p.add_argument("--streaming", action="store_true",
                   help="export the streaming split instead: TWO artifacts "
                        "per matcher (<name>.extract / <name>.match) for "
                        "feature-cached sequential serving "
                        "(models/streaming.py); default model set narrows to "
                        "the supported sparse matchers")
    p.add_argument("--no-verify", action="store_true",
                   help="skip the artifact load-and-call round trip")
    add_platform_arg(p)
    return p.parse_args(argv)


def _poly_test_args(name, overrides, height, width, scale=1):
    """Concrete inputs for verifying a polymorphic artifact at one shape."""
    import jax.numpy as jnp
    import numpy as np

    from ..models.registry import resolve_config

    spec = models.get(name)
    resolved = resolve_config(spec, **overrides)
    rng = np.random.default_rng(scale)
    if name == "sinkhorn":
        n, m, d = 64 * scale, 48 * scale, 128
        return (jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(1, m, d)).astype(np.float32)))
    if name == "essential_matrix_estimator":
        from ..models.registry import _essential_grid_side

        g = _essential_grid_side(resolved) ** 2
        n, m = min(60 * scale, g), min(80 * scale, g)
        k_inv = np.linalg.inv(np.array(
            [[500., 0, width / 2], [0, 500., height / 2], [0, 0, 1]],
            np.float32)).astype(np.float32)
        return (jnp.asarray(rng.uniform(0, 1, (n + 1, m + 1)).astype(np.float32)),
                jnp.asarray(k_inv))
    if name == "voxel_downsampling":
        return (jnp.asarray(rng.uniform(0, 2, (1000 * scale, 3)).astype(np.float32)),
                jnp.asarray(np.float32(0.05)))
    if spec.n_images == 2 or spec.selects_keypoints:
        # Composite matchers + sparse single-image heads: the symbolic
        # scope requires enough NMS blocks for max_keypoints
        # (ceil(H/bs)*ceil(W/bs) >= K); 192x256 holds the registry default
        # K=1024 at bs=6.
        h, w = 144 + 48 * scale, 208 + 48 * scale
        img = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
        if spec.n_images == 1:
            return (img,)
        img2 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
        if spec.takes_k_inv:
            k_inv = jnp.asarray(np.linalg.inv(np.array(
                [[500., 0, w / 2], [0, 500., h / 2], [0, 0, 1]],
                np.float32)))
            return (img, img2, k_inv)
        return (img, img2)
    # image heads: vary the resolution itself
    h, w = 48 * scale + 32, 64 * scale + 32
    return (jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32)),)


def _verify_poly_roundtrip(path, name, height, width, overrides):
    """Reload a polymorphic artifact and check it matches the live pipeline at
    TWO different concrete shapes (the point of the symbolic trace)."""
    import numpy as np

    live = models.build(name, **overrides)
    loaded = models.load_exported(path)
    for scale in (1, 3):
        args = _poly_test_args(name, overrides, height, width, scale)
        a_out = live(*args)
        b_out = loaded(*args)
        a_out = a_out if isinstance(a_out, tuple) else (a_out,)
        b_out = b_out if isinstance(b_out, (tuple, list)) else (b_out,)
        for a, b in zip(a_out, b_out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _verify_streaming_roundtrip(path_ex, path_ma, name, height, width,
                                overrides):
    """Reload the streaming artifact pair and check the composition equals
    the live TWO-IMAGE pipeline on a real input (the streaming contract)."""
    import jax.numpy as jnp
    import numpy as np

    spec = models.get(name)
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 1, height, width))
                       .astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 1, height, width))
                       .astype(np.float32))
    extra = ()
    if spec.takes_k_inv:
        extra = (jnp.asarray(np.linalg.inv(np.array(
            [[500., 0, width / 2], [0, 500., height / 2], [0, 0, 1]],
            np.float32))),)
    extract = models.load_exported(path_ex)
    match = models.load_exported(path_ma)
    got = match(extract(img1), extract(img2), *extra)
    want = models.build(name, **overrides)(img1, img2, *extra)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def _verify_roundtrip(path, name, height, width, overrides):
    """Reload the artifact and check it reproduces the live pipeline bit-exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.registry import arg_specs, resolve_config

    spec = models.get(name)
    resolved = resolve_config(spec, **overrides)
    rng = np.random.default_rng(0)
    args = []
    for s in arg_specs(spec, resolved, height, width):
        if s.shape == (3, 3):  # camera K^-1 inputs: a plausible intrinsics
            args.append(jnp.asarray(np.linalg.inv(np.array(
                [[500., 0, width / 2], [0, 500., height / 2], [0, 0, 1]],
                np.float32))))
        elif s.shape == ():    # scalar inputs (e.g. voxel leaf size)
            args.append(jnp.asarray(np.float32(0.05)))
        else:
            args.append(jnp.asarray(
                rng.uniform(0, 255, s.shape).astype(s.dtype)))
    live = models.build(name, **overrides)(*args)
    loaded = models.load_exported(path)(*args)
    live = live if isinstance(live, tuple) else (live,)
    loaded = loaded if isinstance(loaded, (tuple, list)) else (loaded,)
    for a, b in zip(live, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def main(argv=None):
    args = parse_args(argv)
    select_platform(args.platform)
    import jax

    platform = (args.platform if args.platform != "auto"
                else jax.default_backend())
    if args.dynamic and args.streaming:
        print("error: --dynamic and --streaming are mutually exclusive")
        return 2
    if args.dynamic:
        names = args.models or sorted(models.POLYMORPHIC_EXPORTS)
        if not args.output_dir:
            # The static path without -o is a pure compile check; dynamic
            # export must serialize to verify, so require an explicit
            # destination rather than silently littering the cwd.
            print("error: --dynamic requires --output-dir "
                  "(artifacts must be written somewhere to be verified)")
            return 2
    elif args.streaming:
        names = args.models or models.streaming_names()
        if not args.output_dir:
            print("error: --streaming requires --output-dir "
                  "(artifacts must be written somewhere to be verified)")
            return 2
    else:
        names = args.models or models.names()
    failures = []
    for name in names:
        overrides = {}
        if args.max_keypoints is not None:
            overrides["max_keypoints"] = args.max_keypoints
        t0 = time.perf_counter()
        try:
            if args.dynamic:
                exported = models.export_model_polymorphic(
                    name, platform=platform, **overrides)
                path = models.save_exported(
                    exported, models.artifact_path(args.output_dir, name,
                                                   platform,
                                                   polymorphic=True))
                if not args.no_verify:
                    _verify_poly_roundtrip(path, name, args.height, args.width,
                                           overrides)
                dt = time.perf_counter() - t0
                line = (f"[OK]   {name}: dynamic export in {dt:.1f}s -> "
                        f"{os.path.basename(path)} "
                        f"({os.path.getsize(path) / 1e6:.2f} MB"
                        f"{', verified @2 shapes' if not args.no_verify else ''})")
            elif args.streaming:
                ex, ma = models.export_streaming(
                    name, args.height, args.width, platform=platform,
                    **overrides)
                path_ex = models.save_exported(ex, models.artifact_path(
                    args.output_dir, name + ".extract", platform))
                path_ma = models.save_exported(ma, models.artifact_path(
                    args.output_dir, name + ".match", platform))
                if not args.no_verify:
                    _verify_streaming_roundtrip(path_ex, path_ma, name,
                                                args.height, args.width,
                                                overrides)
                dt = time.perf_counter() - t0
                line = (f"[OK]   {name}: streaming export in {dt:.1f}s -> "
                        f"{os.path.basename(path_ex)} + "
                        f"{os.path.basename(path_ma)}"
                        f"{', verified' if not args.no_verify else ''}")
            elif args.output_dir:
                # The export IS the compile check (it traces and lowers the
                # same graph); don't also build a throwaway AOT executable.
                exported = models.export_model(
                    name, args.height, args.width, platform=platform,
                    **overrides)
                path = models.save_exported(
                    exported,
                    models.artifact_path(args.output_dir, name, platform))
                if not args.no_verify:
                    _verify_roundtrip(path, name, args.height, args.width,
                                      overrides)
                dt = time.perf_counter() - t0
                line = (f"[OK]   {name}: exported in {dt:.1f}s -> "
                        f"{os.path.basename(path)} "
                        f"({os.path.getsize(path) / 1e6:.2f} MB"
                        f"{', verified' if not args.no_verify else ''})")
            else:
                compiled = models.compile_model(name, args.height, args.width,
                                                **overrides)
                dt = time.perf_counter() - t0
                cost = compiled.cost_analysis()
                flops = (cost or {}).get("flops", float("nan"))
                line = f"[OK]   {name}: compiled in {dt:.1f}s, {flops:.3g} flops"
            print(line)
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

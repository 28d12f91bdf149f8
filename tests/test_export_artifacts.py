"""Serialized-artifact tests: jax.export round trips for registry pipelines.

The deployable-artifact analogue of the reference CI's export + onnx.checker +
ORT smoke test (`.github/workflows/onnx-export.yml:35-97`): serialize to
StableHLO, reload, and require bit-exact agreement with the live pipeline.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_image_processing_tpu import models


@pytest.mark.parametrize("name", [
    "shi_tomasi",
    "shi_tomasi_angle_sparse_bad_sinkhorn",
    "shi_tomasi_angle_sparse_bad_sinkhorn_extraction",
])
def test_export_roundtrip_bit_exact(name, tmp_path):
    h, w = 64, 80
    overrides = dict(max_keypoints=32, max_matches=16)
    exported = models.export_model(name, h, w, platform="cpu", **overrides)
    path = models.save_exported(
        exported, models.artifact_path(str(tmp_path), name, "cpu"))
    assert os.path.getsize(path) > 0

    rng = np.random.default_rng(1)
    spec = models.get(name)
    args = [jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
            for _ in range(spec.n_images)]
    live = models.build(name, **overrides)(*args)
    loaded = models.load_exported(path)(*args)
    live = live if isinstance(live, tuple) else (live,)
    loaded = loaded if isinstance(loaded, (tuple, list)) else (loaded,)
    assert len(live) == len(loaded)
    for a, b in zip(live, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_essential_pipeline_roundtrip(tmp_path):
    name = "akaze_sparse_bad_sinkhorn_essential_matrix"
    h, w = 64, 80
    exported = models.export_model(name, h, w, platform="cpu",
                                   max_keypoints=32)
    path = models.save_exported(
        exported, models.artifact_path(str(tmp_path), name, "cpu"))

    rng = np.random.default_rng(2)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    k_inv = jnp.asarray(np.linalg.inv(
        np.array([[100., 0, 40], [0, 100., 32], [0, 0, 1]], np.float32)))
    live = models.build(name, max_keypoints=32)(img1, img2, k_inv)
    loaded = models.load_exported(path)(img1, img2, k_inv)
    for a, b in zip(live, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_essential_ransac_roundtrip(tmp_path):
    """The in-graph RANSAC solve must export: its Gumbel hypothesis table is
    a trace-time constant, so the artifact is deterministic and bit-exact."""
    name = "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix"
    h, w = 64, 80
    exported = models.export_model(name, h, w, platform="cpu",
                                   max_keypoints=32,
                                   essential_ransac_hypotheses=32,
                                   essential_irls_iters=2)
    path = models.save_exported(
        exported, models.artifact_path(str(tmp_path), name + "_ransac", "cpu"))

    rng = np.random.default_rng(3)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    k_inv = jnp.asarray(np.linalg.inv(
        np.array([[100., 0, 40], [0, 100., 32], [0, 0, 1]], np.float32)))
    live = models.build(name, max_keypoints=32,
                        essential_ransac_hypotheses=32,
                        essential_irls_iters=2)(img1, img2, k_inv)
    loaded = models.load_exported(path)(img1, img2, k_inv)
    for a, b in zip(live, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli_writes_and_verifies(tmp_path, capsys):
    from onnx_image_processing_tpu.cli import export as export_cli

    rc = export_cli.main([
        "--models", "shi_tomasi", "fast",
        "--height", "64", "--width", "80",
        "--output-dir", str(tmp_path), "--platform", "cpu"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "verified" in out
    files = sorted(os.listdir(tmp_path))
    assert files == ["fast.cpu.jaxexport", "shi_tomasi.cpu.jaxexport"]


def _poly_args(name, cfg, scale, rng):
    """Concrete inputs at one of several shapes for a polymorphic artifact."""
    if name == "sinkhorn":
        n, m, d = 16 * scale, 12 * scale, 64
        return (jnp.asarray(rng.normal(size=(2, n, d)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(2, m, d)).astype(np.float32)))
    if name == "essential_matrix_estimator":
        from onnx_image_processing_tpu.models.registry import (
            _essential_grid_side)

        g = _essential_grid_side(cfg) ** 2
        n, m = min(20 * scale, g), min(30 * scale, g - 5)
        k_inv = np.linalg.inv(np.array(
            [[100., 0, 4], [0, 100., 4], [0, 0, 1]], np.float32))
        return (jnp.asarray(rng.uniform(0, 1, (n + 1, m + 1)).astype(np.float32)),
                jnp.asarray(k_inv.astype(np.float32)))
    if name == "voxel_downsampling":
        return (jnp.asarray(rng.uniform(0, 2, (100 * scale, 3)).astype(np.float32)),
                jnp.asarray(np.float32(0.1)))
    if (models.get(name).n_images == 2
            or models.get(name).selects_keypoints):
        # sparse/matcher pipelines: shapes must satisfy the top-k block-grid
        # constraint ceil(H/bs)*ceil(W/bs) >= K (=64 here, bs <= 6)
        h, w = 48 + 16 * scale, 56 + 24 * scale
        i1 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
        if models.get(name).n_images == 1:
            return (i1,)
        i2 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
        if models.get(name).takes_k_inv:
            k_inv = np.linalg.inv(np.array(
                [[100., 0, w / 2], [0, 100., h / 2], [0, 0, 1]], np.float32))
            return (i1, i2, jnp.asarray(k_inv.astype(np.float32)))
        return (i1, i2)
    # image heads
    h, w = 32 + 16 * scale, 32 + 24 * scale
    return (jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32)),)


def test_polymorphic_exports_cover_every_registry_name():
    """Full reference --dynamic-axes parity: EVERY registry pipeline has a
    shape-polymorphic export recipe (every reference export script takes the
    flag, e.g. `onnx_export/export_akaze_sparse_bad_sinkhorn.py:203,268-280`,
    `export_shi_tomasi_bad_sinkhorn.py:162-164`)."""
    assert set(models.POLYMORPHIC_EXPORTS) == set(models.names())


@pytest.mark.parametrize("name", sorted(models.POLYMORPHIC_EXPORTS))
def test_polymorphic_export_serves_multiple_shapes(name, tmp_path):
    """One shape-polymorphic artifact must serve several concrete shapes
    bit-exactly (reference dynamic-axes parity: the E estimator's dynamic N/M
    `export_essential_matrix_estimator.py:132-179`, voxel downsampling's
    dynamic N `export_voxel_downsampling.py:51-76`)."""
    cfg = models.get(name).defaults.with_(max_keypoints=64, num_pairs=256)
    exported = models.export_model_polymorphic(name, cfg=cfg, platform="cpu")
    path = models.save_exported(
        exported,
        models.artifact_path(str(tmp_path), name, "cpu", polymorphic=True))
    assert path.endswith(".poly.cpu.jaxexport") and os.path.getsize(path) > 0

    loaded = models.load_exported(path)
    live = models.build(name, cfg)
    rng = np.random.default_rng(7)
    for scale in (1, 5):
        args = _poly_args(name, cfg, scale, rng)
        a_out = live(*args)
        b_out = loaded(*args)
        a_out = a_out if isinstance(a_out, tuple) else (a_out,)
        b_out = b_out if isinstance(b_out, (tuple, list)) else (b_out,)
        assert len(a_out) == len(b_out)
        for a, b in zip(a_out, b_out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_polymorphic_export_unsupported_name_raises():
    with pytest.raises(ValueError, match="no shape-polymorphic export"):
        models.export_model_polymorphic("not_a_registered_pipeline")


@pytest.mark.parametrize("name", ["sinkhorn", "essential_matrix_estimator",
                                  "voxel_downsampling", "bad"])
def test_standalone_export_roundtrip(name, tmp_path):
    """The reference's four standalone exports (export_{bad,sinkhorn,
    essential_matrix_estimator,voxel_downsampling}.py) must serialize and
    reload bit-exactly through the generalized registry input specs."""
    from onnx_image_processing_tpu.models.registry import arg_specs

    spec = models.get(name)
    cfg = spec.defaults.with_(max_keypoints=64, num_pairs=256)
    exported = models.export_model(name, 64, 80, cfg=cfg, platform="cpu")
    path = models.save_exported(
        exported, models.artifact_path(str(tmp_path), name, "cpu"))

    rng = np.random.default_rng(3)
    args = []
    for s in arg_specs(spec, cfg, 64, 80):
        if s.shape == (3, 3):
            args.append(jnp.asarray(np.linalg.inv(np.array(
                [[100., 0, 40], [0, 100., 32], [0, 0, 1]], np.float32))))
        elif s.shape == ():
            args.append(jnp.asarray(np.float32(0.05)))
        else:
            args.append(jnp.asarray(
                rng.uniform(0, 1, s.shape).astype(s.dtype)))
    live = models.build(name, cfg)(*args)
    loaded = models.load_exported(path)(*args)
    live = live if isinstance(live, tuple) else (live,)
    loaded = loaded if isinstance(loaded, (tuple, list)) else (loaded,)
    for a, b in zip(live, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_streaming_roundtrip(tmp_path):
    """The streaming split serializes as TWO artifacts whose composition is
    bit-exact (CPU) against the live two-image pipeline — the deployable
    form of the VO CLI's feature-cached serving mode."""
    name = "shi_tomasi_angle_sparse_bad_sinkhorn"
    h, w = 64, 80
    ex, ma = models.export_streaming(name, h, w, platform="cpu",
                                     max_keypoints=32, use_pallas=False)
    p_ex = models.save_exported(
        ex, models.artifact_path(str(tmp_path), name + ".extract", "cpu"))
    p_ma = models.save_exported(
        ma, models.artifact_path(str(tmp_path), name + ".match", "cpu"))

    rng = np.random.default_rng(7)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
    extract = models.load_exported(p_ex)
    match = models.load_exported(p_ma)
    got = match(extract(img1), extract(img2))
    want = models.build(name, max_keypoints=32, use_pallas=False)(img1, img2)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

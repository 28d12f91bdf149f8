"""Differential tests: threshold / depth / pointcloud ops vs the reference."""

import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from onnx_image_processing_tpu.ops import (
    otsu_threshold,
    multi_otsu_threshold,
    depth_to_pointcloud,
    depth_to_pointcloud_with_normal,
    depth_alignment,
    voxel_downsampling,
)


@pytest.fixture(scope="module")
def int_image():
    rng = np.random.default_rng(11)
    # Bimodal image so Otsu has a meaningful threshold.
    a = rng.normal(60, 15, (60, 80))
    b = rng.normal(180, 20, (60, 80))
    pick = rng.uniform(size=(60, 80)) < 0.45
    return np.clip(np.where(pick, a, b), 0, 255).astype(np.int32)


@requires_reference
def test_otsu_matches_reference(int_image):
    import torch
    from pytorch_model.threshold.otsu import OtsuThreshold

    ref = OtsuThreshold(min_val=0, max_val=255)
    with torch.no_grad():
        t_e, b_e = ref(torch.from_numpy(int_image.astype(np.int64)))

    t, b = otsu_threshold(jnp.asarray(int_image), 0, 255)
    assert int(t) == int(t_e)
    np.testing.assert_array_equal(np.asarray(b), b_e.numpy().astype(np.int32))


@requires_reference
def test_multi_otsu_matches_reference(int_image):
    import torch
    from pytorch_model.threshold.multi_otsu import MultiOtsuThreshold

    ref = MultiOtsuThreshold(min_val=0, max_val=256, n_class=3, calc_hist=True)
    with torch.no_grad():
        th_e = ref(torch.from_numpy(int_image.astype(np.int64)))

    th = multi_otsu_threshold(jnp.asarray(int_image), 0, 256, n_class=3)
    assert [int(x) for x in th] == [int(x) for x in th_e]


def test_multi_otsu_separates_trimodal():
    rng = np.random.default_rng(5)
    img = np.concatenate([
        rng.normal(40, 8, 2000), rng.normal(128, 8, 2000),
        rng.normal(210, 8, 2000)]).clip(0, 255).astype(np.int32).reshape(60, 100)
    t1, t2 = multi_otsu_threshold(jnp.asarray(img), 0, 256, n_class=3)
    assert 55 < int(t1) < 110
    assert 150 < int(t2) < 195


def _import_depth_module(name):
    """The reference's depth package uses non-relative imports
    (`depth/__init__.py:1-2`, SURVEY.md §2.8) — import with its dir on sys.path."""
    import importlib
    import sys

    sys.path.insert(0, "/root/reference/pytorch_model/depth")
    try:
        return importlib.import_module(name)
    finally:
        sys.path.pop(0)


@requires_reference
def test_depth_to_pointcloud_matches_reference():
    import torch

    DepthToPointCloud = _import_depth_module("depth2pointcloud").DepthToPointCloud

    rng = np.random.default_rng(2)
    depth = rng.uniform(0.5, 5.0, (48, 64, 1)).astype(np.float32)
    ref = DepthToPointCloud(scale=0.001, width=64, height=48,
                            cx=32.0, cy=24.0, fx=50.0, fy=52.0)
    with torch.no_grad():
        exp = ref(torch.from_numpy(depth)).numpy()
    got = np.asarray(depth_to_pointcloud(jnp.asarray(depth), cx=32.0, cy=24.0,
                                         fx=50.0, fy=52.0, scale=0.001))
    np.testing.assert_allclose(got, exp, atol=1e-6)


@requires_reference
def test_depth_to_pointcloud_with_normal_matches_reference():
    import torch

    DepthToPointCloudWithNormal = _import_depth_module(
        "depth2pointcloud_with_normal").DepthToPointCloudWithNormal

    rng = np.random.default_rng(3)
    depth = rng.uniform(0.5, 5.0, (32, 40, 1)).astype(np.float32)
    ref = DepthToPointCloudWithNormal(scale=1.0, width=40, height=32,
                                      cx=20.0, cy=16.0, fx=30.0, fy=30.0)
    with torch.no_grad():
        pcd_e, n_e = ref(torch.from_numpy(depth))
    pcd, n = depth_to_pointcloud_with_normal(jnp.asarray(depth), cx=20.0,
                                             cy=16.0, fx=30.0, fy=30.0)
    np.testing.assert_allclose(np.asarray(pcd), pcd_e.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(n), n_e.numpy(), atol=1e-4)


@requires_reference
def test_depth_alignment_matches_reference():
    import torch

    DepthAlignment = _import_depth_module("depth_align").DepthAlignment

    rng = np.random.default_rng(4)
    h, w = 40, 56
    depth = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
    rot = np.eye(3, dtype=np.float32)
    trans = np.array([-0.05, -0.04, 0.0], np.float32)
    # NOTE: the reference crashes whenever an aligned coordinate lands in
    # [width-0.5, width) — its OOB mask checks `p_x < width` but then indexes
    # p_x1 = int(p_x + 0.5) == width (`depth_align.py:89-111`). Shrinking RGB
    # intrinsics keep every projection interior so the oracle can run; our
    # scatter-min handles the border case by dropping OOB updates.
    args = dict(scale=1.0, width=w, height=h,
                depth_cx=w / 2, depth_cy=h / 2, depth_fx=40.0, depth_fy=40.0,
                rgb_cx=w / 2 - 2.0, rgb_cy=h / 2 - 1.0, rgb_fx=36.0, rgb_fy=36.0)
    ref = DepthAlignment(rotation=torch.from_numpy(rot),
                         translation=torch.from_numpy(trans), **args)
    with torch.no_grad():
        # Reference broadcasting requires a trailing singleton channel.
        exp = ref(torch.from_numpy(depth[..., None])).numpy()[..., 0]

    got = np.asarray(depth_alignment(
        jnp.asarray(depth), jnp.asarray(rot), jnp.asarray(trans),
        width=w, height=h, depth_cx=args["depth_cx"], depth_cy=args["depth_cy"],
        depth_fx=args["depth_fx"], depth_fy=args["depth_fy"],
        rgb_cx=args["rgb_cx"], rgb_cy=args["rgb_cy"],
        rgb_fx=args["rgb_fx"], rgb_fy=args["rgb_fy"]))

    # The reference splats via last-write-wins index assignment; ours is a
    # deterministic scatter-min. They agree except where multiple source
    # pixels collide; allow a small disagreement budget there.
    agree = np.isclose(got, exp, atol=1e-5)
    assert agree.mean() > 0.97
    # Ours must be <= reference wherever both wrote (min is the tighter splat).
    both = (got > 0) & (exp > 0)
    assert (got[both] <= exp[both] + 1e-5).all()


@requires_reference
def test_voxel_downsampling_matches_reference():
    import torch
    from pytorch_model.pointcloud.voxel_downsampling import VoxelDownsampling

    rng = np.random.default_rng(6)
    pts = rng.uniform(-2.0, 2.0, (500, 3)).astype(np.float32)
    ref = VoxelDownsampling()
    with torch.no_grad():
        out_e, mask_e = ref(torch.from_numpy(pts), torch.tensor(0.5))

    out, mask = voxel_downsampling(jnp.asarray(pts), jnp.asarray(0.5))
    np.testing.assert_array_equal(np.asarray(mask), mask_e.numpy())
    np.testing.assert_allclose(np.asarray(out), out_e.numpy(), atol=1e-4)


def test_voxel_downsampling_properties():
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    out, mask = voxel_downsampling(jnp.asarray(pts), jnp.asarray(10.0))
    # One giant voxel -> single centroid = mean of all points.
    assert int(np.asarray(mask).sum()) == 1
    np.testing.assert_allclose(np.asarray(out)[0], pts.mean(0), atol=1e-5)
    out2, mask2 = voxel_downsampling(jnp.asarray(pts), jnp.asarray(1e-4))
    # Tiny voxels -> every point its own centroid.
    assert int(np.asarray(mask2).sum()) == 200


def _voxel_f64_oracle(pts: np.ndarray, leaf: float):
    """Centroids per voxel in sorted-key order, float64."""
    vox = np.floor(pts.astype(np.float64) / leaf).astype(np.int64)
    vox -= vox.min(0)
    vmax = vox.max(0)
    key = vox[:, 0]
    for a in range(1, pts.shape[1]):
        key = key * (vmax[a] + 1) + vox[:, a]
    order = np.argsort(key, kind="stable")
    sk, sp = key[order], pts.astype(np.float64)[order]
    _, start = np.unique(sk, return_index=True)
    ends = np.append(start[1:], len(sk))
    return np.stack([sp[s:e].mean(0) for s, e in zip(start, ends)])


def test_voxel_downsampling_precision_at_scale():
    """The residual prefix sum stays within 2e-4 of a float64 oracle at the
    config-3 benchmark scale (N=38.4k) — a raw-coordinate prefix sum (the
    reference's formulation, `voxel_downsampling.py:60-75`) is ~3e-3 here."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-3, 3, (38400, 3)).astype(np.float32)
    out, mask = voxel_downsampling(jnp.asarray(pts), jnp.asarray(np.float32(0.05)))
    oracle = _voxel_f64_oracle(pts, 0.05)
    m = int(np.asarray(mask).sum())
    assert m == len(oracle)
    err = np.abs(np.asarray(out)[:m] - oracle).max()
    assert err < 2e-4, err


def test_voxel_downsampling_edge_cases():
    # Single point.
    out, mask = voxel_downsampling(jnp.asarray([[0.3, 0.4, 0.5]], np.float32),
                                   jnp.asarray(np.float32(1.0)))
    assert np.asarray(mask).tolist() == [True]
    np.testing.assert_allclose(np.asarray(out)[0], [0.3, 0.4, 0.5], atol=1e-6)
    # Exact duplicates collapse to one centroid equal to the point.
    dup = np.tile(np.array([[1.25, -0.5, 2.0]], np.float32), (17, 1))
    out, mask = voxel_downsampling(jnp.asarray(dup), jnp.asarray(np.float32(0.1)))
    assert int(np.asarray(mask).sum()) == 1
    np.testing.assert_allclose(np.asarray(out)[0], dup[0], atol=1e-5)
    # Already-sorted and reverse-sorted inputs agree with the oracle.
    grid = np.stack(np.meshgrid(*[np.linspace(-1, 1, 9)] * 3),
                    -1).reshape(-1, 3).astype(np.float32)
    for pts in (grid, grid[::-1].copy()):
        out, mask = voxel_downsampling(jnp.asarray(pts),
                                       jnp.asarray(np.float32(0.37)))
        oracle = _voxel_f64_oracle(pts, 0.37)
        m = int(np.asarray(mask).sum())
        assert m == len(oracle)
        np.testing.assert_allclose(np.asarray(out)[:m], oracle, atol=1e-5)


@requires_reference
def test_multi_otsu_two_class_matches_reference(int_image):
    import torch
    from pytorch_model.threshold.multi_otsu import MultiOtsuThreshold

    ref = MultiOtsuThreshold(min_val=0, max_val=256, n_class=2, calc_hist=True)
    with torch.no_grad():
        th_e = ref(torch.from_numpy(int_image.astype(np.int64)))
    th = multi_otsu_threshold(jnp.asarray(int_image), 0, 256, n_class=2)
    assert [int(x) for x in th] == [int(x) for x in th_e]


@requires_reference
def test_point_transform_and_projection_match_reference():
    import torch

    mod = _import_depth_module("depth_align")
    from onnx_image_processing_tpu.ops import points_to_pixels, transform_points

    rng = np.random.default_rng(8)
    pts = rng.uniform(-1, 3, (20, 30, 3)).astype(np.float32)
    rot = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    trans = rng.normal(size=3).astype(np.float32)

    with torch.no_grad():
        p2p = mod.Point2Point(torch.from_numpy(rot), torch.from_numpy(trans))
        moved_e = p2p(torch.from_numpy(pts)).numpy()
        p2px = mod.Point2Pixel(scale=1.0, width=30, height=20, cx=15.0, cy=10.0,
                               fx=25.0, fy=26.0)
        x_e, y_e = p2px(torch.from_numpy(moved_e))

    moved = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(rot),
                                        jnp.asarray(trans)))
    np.testing.assert_allclose(moved, moved_e, atol=1e-5)
    px, py = points_to_pixels(jnp.asarray(moved), cx=15.0, cy=10.0, fx=25.0, fy=26.0)
    np.testing.assert_allclose(np.asarray(px), x_e.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(py), y_e.numpy(), atol=1e-3)

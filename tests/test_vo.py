"""Tests for the host-side VO layer: pose recovery, trajectory, camera HAL."""

import os

import numpy as np
import pytest

from onnx_image_processing_tpu.vo import (
    CameraIntrinsics,
    estimate_pose_ransac,
    recover_pose,
    triangulate_points,
    compose_transformation,
    transformation_to_matrix,
    matrix_to_transformation,
    Trajectory,
    OpenCVCamera,
    create_camera,
)


def _synthetic_correspondences(n=120, seed=0, noise=0.0):
    """Project random 3-D points into two cameras with a known relative pose."""
    rng = np.random.default_rng(seed)
    intr = CameraIntrinsics(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                            width=320, height=240)
    x3d = np.concatenate([rng.uniform(-1.5, 1.5, (n, 2)),
                          rng.uniform(4.0, 9.0, (n, 1))], axis=1)
    ang = 0.06
    r = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([0.4, 0.05, 0.1])

    def project(pts):
        uv = (intr.K @ pts.T).T
        uv = uv[:, :2] / uv[:, 2:3]
        return uv

    uv1 = project(x3d)
    uv2 = project((r @ x3d.T).T + t)
    if noise:
        uv1 += rng.normal(0, noise, uv1.shape)
        uv2 += rng.normal(0, noise, uv2.shape)
    # (y, x) keypoint convention.
    k1 = uv1[:, ::-1].copy()
    k2 = uv2[:, ::-1].copy()
    return k1, k2, r, t, intr


def test_estimate_pose_ransac_recovers_motion():
    k1, k2, r_true, t_true, intr = _synthetic_correspondences(noise=0.3)
    r, t, inliers = estimate_pose_ransac(k1, k2, intr)
    assert r is not None
    assert inliers.mean() > 0.8
    # Rotation within ~2 degrees at 0.3 px pixel noise.
    err = np.degrees(np.arccos(np.clip((np.trace(r_true.T @ r) - 1) / 2, -1, 1)))
    assert err < 2.0
    # Translation direction (scale is unobservable).
    cos = abs(np.dot(t.ravel(), t_true) /
              (np.linalg.norm(t) * np.linalg.norm(t_true)))
    assert cos > 0.995


def test_estimate_pose_ransac_too_few_points():
    intr = CameraIntrinsics(300, 300, 160, 120, 320, 240)
    r, t, mask = estimate_pose_ransac(np.zeros((3, 2)), np.zeros((3, 2)), intr)
    assert r is None and t is None and mask.shape == (3,) and not mask.any()


def test_recover_pose_from_known_essential():
    k1, k2, r_true, t_true, intr = _synthetic_correspondences()
    tx = np.array([[0, -t_true[2], t_true[1]], [t_true[2], 0, -t_true[0]],
                   [-t_true[1], t_true[0], 0]])
    e = tx @ r_true
    r, t, mask = recover_pose(e, k1, k2, intr)
    assert r is not None and mask.all()
    err = np.degrees(np.arccos(np.clip((np.trace(r_true.T @ r) - 1) / 2, -1, 1)))
    assert err < 0.1


def test_recover_pose_far_scene_with_outliers():
    """The two robustness divergences in recover_pose (Sampson-masked voting,
    explicit distanceThresh) must resolve the true decomposition on a scene
    with depth/baseline > 50 and 40% outlier matches — the measured regime
    where cv2's bare 4-arg recoverPose picks the twisted pair (BASELINE.md
    round 4: a 179.9 deg rotation on the sprite scene)."""
    rng = np.random.default_rng(7)
    n = 120
    intr = CameraIntrinsics(300, 300, 160, 120, 320, 240)
    # Depth 40..120 with a 0.5-unit baseline: depth/baseline 80..240, far
    # beyond the 50-unit cap the bare overload hard-codes.
    x3d = np.concatenate([rng.uniform(-20, 20, (n, 2)),
                          rng.uniform(40, 120, (n, 1))], axis=1)
    ang = 0.05
    r_true = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
    t_true = np.array([0.45, 0.05, 0.2])

    def project(pts):
        uv = (intr.K @ pts.T).T
        return uv[:, :2] / uv[:, 2:3]

    uv1 = project(x3d) + rng.normal(0, 0.2, (n, 2))
    uv2 = project((r_true @ x3d.T).T + t_true) + rng.normal(0, 0.2, (n, 2))
    nout = int(0.4 * n)
    idx = rng.choice(n, nout, replace=False)
    uv2[idx] = uv2[idx][rng.permutation(nout)]

    tx = np.array([[0, -t_true[2], t_true[1]], [t_true[2], 0, -t_true[0]],
                   [-t_true[1], t_true[0], 0]])
    e = tx @ r_true
    r, t, mask = recover_pose(e, uv1[:, ::-1].copy(), uv2[:, ::-1].copy(), intr)
    assert r is not None
    err = np.degrees(np.arccos(np.clip((np.trace(r_true.T @ r) - 1) / 2, -1, 1)))
    assert err < 0.5
    cos = np.dot(t.ravel(), t_true) / (np.linalg.norm(t) * np.linalg.norm(t_true))
    assert cos > 0.99  # sign-correct translation (no chirality flip)
    # Votes were restricted to Sampson inliers: outlier rows can't be inliers.
    assert mask[idx].sum() <= 2


def test_triangulation_roundtrip():
    k1, k2, r_true, t_true, intr = _synthetic_correspondences(n=40)
    x = triangulate_points(k1, k2, np.eye(3), np.zeros(3), r_true, t_true, intr)
    # Reproject into camera 1: must hit the original pixels.
    uv = (intr.K @ x.T).T
    uv = uv[:, :2] / uv[:, 2:3]
    np.testing.assert_allclose(uv[:, ::-1], k1, atol=1e-3)


def test_se3_helpers_roundtrip():
    rng = np.random.default_rng(1)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    import cv2

    r = cv2.Rodrigues(axis * 0.3)[0]
    t = rng.normal(size=3)
    m = transformation_to_matrix(r, t)
    r2, t2 = matrix_to_transformation(m)
    np.testing.assert_allclose(r, r2)
    np.testing.assert_allclose(t, t2)
    rc, tc = compose_transformation(r, t, r.T, -(r.T @ t))
    np.testing.assert_allclose(rc, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(tc.ravel(), 0.0, atol=1e-12)


def test_trajectory_accumulation_and_io(tmp_path):
    traj = Trajectory()
    r = np.eye(3)
    step = np.array([0.0, 0.0, 1.0])
    for _ in range(5):
        traj.add_relative_pose(r, step)
    assert len(traj) == 6
    np.testing.assert_allclose(traj.get_current_position(), [0, 0, 5])
    assert traj.get_trajectory_length() == pytest.approx(5.0)

    path = os.path.join(tmp_path, "traj.npz")
    traj.save_to_file(path)
    loaded = Trajectory.load_from_file(path)
    assert len(loaded) == 6
    np.testing.assert_allclose(loaded.get_current_position(), [0, 0, 5])


def test_trajectory_plots(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    traj = Trajectory()
    for i in range(10):
        traj.add_relative_pose(np.eye(3), np.array([0.1, 0.0, 0.2]))
    ax2 = traj.plot_2d(show_orientation=True)
    ax3 = traj.plot_3d(show_orientation=True)
    assert ax2 is not None and ax3 is not None


def test_opencv_camera_on_video(tmp_path):
    """Drive the OpenCV backend against a real video file."""
    import cv2

    video = os.path.join(tmp_path, "t.mp4")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(8):
        wr.write(np.full((48, 64, 3), i * 30, np.uint8))
    wr.release()

    cam = create_camera("opencv", device_id=video)
    assert cam.open()
    assert cam.is_opened()
    assert cam.get_resolution() == (64, 48)
    ok, frame = cam.read()
    assert ok and frame.shape == (48, 64, 3)
    ok, color, depth = cam.read_rgbd()
    assert ok and depth is None
    cam.release()
    assert not cam.is_opened()


def test_create_camera_unknown_type():
    with pytest.raises(ValueError):
        create_camera("kinect")


def test_optional_backends_raise_cleanly():
    for name in ("realsense", "orbbec", "oak"):
        with pytest.raises(ImportError):
            create_camera(name)


def test_intrinsics_rescale():
    intr = CameraIntrinsics(600, 600, 320, 240, 640, 480)
    small = intr.rescaled(320, 240)
    assert small.fx == 300 and small.cx == 160 and small.width == 320


def test_draw_vo_overlay_headless():
    """The full OSD (status panel + colored keypoints + trajectory mini-map)
    must render headlessly on a plain ndarray frame."""
    import numpy as np

    from onnx_image_processing_tpu.utils import draw_vo_overlay
    from onnx_image_processing_tpu.vo import Trajectory

    traj = Trajectory()
    for i in range(5):
        traj.add_relative_pose(np.eye(3), np.array([[0.2], [0.0], [0.1]]))
    frame = np.zeros((480, 640, 3), np.uint8)
    kpts = np.array([[100.0, 200.0], [150.0, 300.0], [50.0, 90.0]])
    mask = np.array([True, False, True])

    out = draw_vo_overlay(frame, traj, 7, 3, 2, kpts, mask, True,
                          None, 640, 480)
    assert out.shape == frame.shape and out.dtype == frame.dtype
    assert (out != frame).any()          # panel + keypoints drawn
    assert (frame == 0).all()            # input untouched

    # No-pose variant (yellow keypoints, status line) and empty trajectory.
    out2 = draw_vo_overlay(frame, Trajectory(), 1, 3, 0, kpts, None, False,
                           "POSE ESTIMATION FAILED", 640, 480)
    assert (out2 != frame).any()

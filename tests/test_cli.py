"""End-to-end CLI tests (small shapes, CPU platform for hermeticity).

Counterpart of the reference's sample-script layer (`sample/`, SURVEY.md §2.11):
each CLI is driven through its real argv interface.
"""

import os

import numpy as np
import pytest
from PIL import Image

from onnx_image_processing_tpu.cli import (
    feature_detection,
    image_matching,
    image_matching_extraction,
    visual_odometry,
)
from onnx_image_processing_tpu.cli import export as export_cli


@pytest.fixture(scope="module")
def photo(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    img = np.clip(127 + 90 * np.sin(xx / 11) * np.cos(yy / 9)
                  + rng.normal(0, 4, (120, 160)), 0, 255).astype(np.uint8)
    p1 = os.path.join(d, "a.png")
    p2 = os.path.join(d, "b.png")
    Image.fromarray(img).save(p1)
    Image.fromarray(np.roll(img, 6, axis=1)).save(p2)
    return p1, p2


def test_feature_detection_cli(photo, tmp_path):
    out = os.path.join(tmp_path, "kpts.png")
    rc = feature_detection.main([
        "-i", photo[0], "-o", out, "--height", "120", "--width", "160",
        "--max-keypoints", "100", "--platform", "cpu"])
    assert rc == 0 and os.path.exists(out)


def test_image_matching_cli(photo, tmp_path, capsys):
    out = os.path.join(tmp_path, "m.png")
    rc = image_matching.main([
        "-i1", photo[0], "-i2", photo[1], "-o", out, "--height", "120",
        "--width", "160", "--max-keypoints", "64", "--no-benchmark",
        "--platform", "cpu"])
    assert rc == 0 and os.path.exists(out)
    printed = capsys.readouterr().out
    assert "Matches:" in printed


def test_image_matching_extraction_cli(photo, tmp_path):
    out = os.path.join(tmp_path, "me.png")
    rc = image_matching_extraction.main([
        "-i1", photo[0], "-i2", photo[1], "-o", out, "--height", "120",
        "--width", "160", "--max-matches", "32", "--no-benchmark",
        "--platform", "cpu"])
    assert rc == 0 and os.path.exists(out)


def test_visual_odometry_cli_on_image_dir(tmp_path, capsys):
    # Panning camera over a textured board, frames as an image directory.
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:200, 0:400].astype(np.float32)
    big = np.clip(127 + 90 * np.sin(xx / 12) * np.cos(yy / 10)
                  + rng.normal(0, 4, (200, 400)), 0, 255).astype(np.uint8)
    frames = os.path.join(tmp_path, "frames")
    os.makedirs(frames)
    for i in range(6):
        Image.fromarray(big[40:160, i * 10:i * 10 + 160]).save(
            os.path.join(frames, f"f{i:03d}.png"))

    traj = os.path.join(tmp_path, "traj.npz")
    plot = os.path.join(tmp_path, "traj.png")
    rc = visual_odometry.main([
        "-i", frames, "--height", "120", "--width", "160", "--fx", "120",
        "--skip-frames", "0", "--min-matches", "8", "--max-matches", "64",
        "-o", traj, "--plot", plot, "--quiet", "--platform", "cpu"])
    assert rc == 0 and os.path.exists(traj) and os.path.exists(plot)

    from onnx_image_processing_tpu.vo import Trajectory

    t = Trajectory.load_from_file(traj)
    assert len(t) >= 2  # at least one pose accepted on a clean pan


def test_export_cli_reports_compiles(capsys):
    rc = export_cli.main(["--models", "shi_tomasi", "--height", "64",
                          "--width", "80", "--platform", "cpu"])
    assert rc == 0
    assert "[OK]   shi_tomasi" in capsys.readouterr().out


def test_visual_odometry_cli_essential_model(tmp_path):
    """VO with the in-graph essential-matrix pipeline (4+1 outputs wrapped)."""
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:200, 0:400].astype(np.float32)
    big = np.clip(127 + 90 * np.sin(xx / 12) * np.cos(yy / 10)
                  + rng.normal(0, 4, (200, 400)), 0, 255).astype(np.uint8)
    frames = os.path.join(tmp_path, "frames")
    os.makedirs(frames)
    for i in range(4):
        Image.fromarray(big[40:160, i * 12:i * 12 + 160]).save(
            os.path.join(frames, f"f{i:03d}.png"))

    traj = os.path.join(tmp_path, "traj.npz")
    plot = os.path.join(tmp_path, "traj.png")
    rc = visual_odometry.main([
        "-i", frames, "--height", "120", "--width", "160", "--fx", "120",
        "--model", "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix",
        "--skip-frames", "0", "--min-matches", "8", "--max-matches", "64",
        "-o", traj, "--plot", plot, "--quiet", "--platform", "cpu"])
    assert rc == 0 and os.path.exists(traj)
    assert os.path.exists(plot) and os.path.getsize(plot) > 0


def test_visual_odometry_recovers_pan_direction(tmp_path):
    """End-to-end accuracy: a pure horizontal pan must produce a trajectory
    whose dominant translation axis is x, monotonic in one direction."""
    rng = np.random.default_rng(6)
    yy, xx = np.mgrid[0:240, 0:600].astype(np.float32)
    big = np.clip(127 + 90 * np.sin(xx / 12) * np.cos(yy / 10)
                  + 30 * np.sin(xx / 37 + yy / 23)
                  + rng.normal(0, 4, (240, 600)), 0, 255).astype(np.uint8)
    frames = os.path.join(tmp_path, "frames")
    os.makedirs(frames)
    for i in range(8):
        Image.fromarray(big[60:180, i * 14:i * 14 + 160]).save(
            os.path.join(frames, f"f{i:03d}.png"))

    traj_path = os.path.join(tmp_path, "traj.npz")
    rc = visual_odometry.main([
        "-i", frames, "--height", "120", "--width", "160", "--fx", "120",
        "--skip-frames", "0", "--min-matches", "8", "--max-matches", "64",
        "--min-inlier-ratio", "0.3", "-o", traj_path, "--quiet",
        "--platform", "cpu"])
    assert rc == 0

    from onnx_image_processing_tpu.vo import Trajectory

    t = Trajectory.load_from_file(traj_path)
    assert len(t) >= 3
    pos = t.get_positions_array()
    steps = np.diff(pos, axis=0)
    # Dominant motion axis is x for the majority of steps (a planar scene
    # under pure translation is a degenerate configuration for the essential
    # matrix, so individual steps can flip toward z), with a consistent sign
    # among the x-dominant ones.
    x_dom = (np.abs(steps[:, 0]) > np.abs(steps[:, 1])) & \
        (np.abs(steps[:, 0]) > np.abs(steps[:, 2]))
    assert x_dom.mean() >= 0.5
    signs = np.sign(steps[x_dom, 0])
    assert np.all(signs == signs[0])


def test_feature_detection_cli_detector_flags(photo, tmp_path, capsys):
    """FAST intensity threshold must thread CLI -> config -> op: a lower
    threshold fires at strictly more pixels (reference --threshold flag,
    `export_fast.py:44-48`)."""
    # FAST needs hard corners: a block pattern, not the smooth sine photo.
    rng = np.random.default_rng(5)
    blocks = rng.integers(0, 256, (6, 8)).astype(np.uint8)
    img = np.kron(blocks, np.ones((20, 20), np.uint8))
    corner_path = os.path.join(tmp_path, "blocks.png")
    Image.fromarray(img).save(corner_path)

    counts = {}
    for thr in (10.0, 60.0):
        out = os.path.join(tmp_path, f"fast_{int(thr)}.png")
        rc = feature_detection.main([
            "-i", corner_path, "-o", out, "--height", "120", "--width", "160",
            "--model", "fast", "--fast-threshold", str(thr),
            "--threshold", "0.5", "--max-keypoints", "500",
            "--platform", "cpu"])
        assert rc == 0
        line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("Detected")][0]
        counts[thr] = int(line.split()[1])
    assert counts[10.0] > counts[60.0] > 0


def test_vo_cli_reference_flag_aliases(tmp_path):
    """Reference README flag surface: --image-dir/-d source selection,
    --save-trajectory/--save-plot aliases, --plot-3d."""
    rng = np.random.default_rng(8)
    yy, xx = np.mgrid[0:160, 0:320].astype(np.float32)
    big = np.clip(127 + 90 * np.sin(xx / 12) * np.cos(yy / 10)
                  + rng.normal(0, 4, (160, 320)), 0, 255).astype(np.uint8)
    frames = os.path.join(tmp_path, "frames")
    os.makedirs(frames)
    for i in range(4):
        Image.fromarray(big[20:140, i * 12:i * 12 + 160]).save(
            os.path.join(frames, f"f{i:03d}.png"))

    traj = os.path.join(tmp_path, "t.npz")
    plot = os.path.join(tmp_path, "t3d.png")
    rc = visual_odometry.main([
        "--image-dir", frames, "--height", "120", "--width", "160",
        "--fx", "120", "--skip-frames", "0", "--min-matches", "8",
        "--max-matches", "64", "--save-trajectory", traj,
        "--save-plot", plot, "--plot-3d", "-q", "--platform", "cpu"])
    assert rc == 0 and os.path.exists(traj)
    assert os.path.exists(plot) and os.path.getsize(plot) > 0


def test_feature_detection_cli_colorize(photo, tmp_path):
    out1 = os.path.join(tmp_path, "plain.png")
    out2 = os.path.join(tmp_path, "colored.png")
    for out, extra in ((out1, []), (out2, ["--colorize", "--circle-radius", "5"])):
        rc = feature_detection.main([
            "-i", photo[0], "-o", out, "--height", "120", "--width", "160",
            "--max-keypoints", "50", "--platform", "cpu"] + extra)
        assert rc == 0 and os.path.exists(out)
    a = np.asarray(Image.open(out1))
    b = np.asarray(Image.open(out2))
    assert a.shape == b.shape and (a != b).any()

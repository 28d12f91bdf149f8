"""App-level VO accuracy pinned vs the reference (VERDICT r2 item 4).

Runs the FULL visual-odometry loop — flagship matcher, host mutual-NN
extraction, RANSAC essential + recoverPose — for both this framework and the
reference PyTorch stack on IDENTICAL synthetic frames with exact ground
truth, and asserts the trajectory/relative-pose error metrics agree. This is
the end-to-end number component parity only implies; the reference analogue
is `sample/visual_odometry.py:424-693` driven frame-by-frame.

Calibration (benchmarks/vo_accuracy.py at this exact config, 2026-08-17):
ours ATE 0.2568 vs reference 0.2549 (ratio 1.007), RPE rotation mean
0.401 deg vs 0.415 deg, identical p95 and pose-failure counts (14).
"""

import os

import pytest

from benchmarks.vo_accuracy import (evaluate, make_sequence, run_comparison,
                                    run_vo_akaze, run_vo_ours)

REFERENCE_AVAILABLE = os.path.isdir(
    os.path.join(os.environ.get("REFERENCE_PATH", "/root/reference"),
                 "pytorch_model"))


@pytest.mark.skipif(not REFERENCE_AVAILABLE, reason="reference not mounted")
def test_vo_accuracy_matches_reference():
    ours, ref = run_comparison(n_frames=32, h=192, w=256, max_keypoints=384)
    assert ref is not None

    # Trajectory error (Sim(3)-aligned ATE): same ballpark as the reference —
    # RANSAC is seeded differently per stack, so allow headroom around the
    # calibrated 1.007 ratio, and catch any systematic app-level regression.
    assert ours["ate_rmse"] <= 1.5 * ref["ate_rmse"] + 0.05, (ours, ref)

    # Per-step rotation accuracy: sub-degree for both, within 0.3 deg of the
    # reference (calibrated gap: 0.014 deg).
    assert ours["rpe_rot_deg_mean"] is not None
    assert abs(ours["rpe_rot_deg_mean"] - ref["rpe_rot_deg_mean"]) < 0.3, (
        ours, ref)

    # Robustness: neither stack should fail pose recovery dramatically more
    # often than the other on identical frames (calibrated: equal at 14).
    assert abs(ours["pose_failures"] - ref["pose_failures"]) <= 6, (ours, ref)

@pytest.mark.skipif(not REFERENCE_AVAILABLE, reason="reference not mounted")
def test_vo_accuracy_matches_reference_deep_scene():
    """The DISCRIMINATIVE scene (VERDICT r3 item 5): a textured ray-cast
    corridor where pose recovery fully succeeds for both stacks (0 failures),
    so 'ours >= reference' is meaningful, unlike the sprite scene's ~40%
    failure regime.

    Calibration (benchmarks/vo_accuracy.py at this exact config, 2026-08-18):
    ours ATE 0.1633 vs reference 0.1626 (ratio 1.004), RPE rotation mean
    0.595 vs 0.607 deg, both 0/23 pose failures, t-dir mean ~14.4/14.6 deg.
    """
    ours, ref = run_comparison(n_frames=24, h=192, w=256, max_keypoints=384,
                               scene="deep")
    assert ref is not None

    # Both stacks must fully succeed on this scene — that is its point.
    assert ours["pose_failures"] <= 2, ours
    assert ref["pose_failures"] <= 2, ref

    # Trajectory error: calibrated ratio 1.004; allow RANSAC-seed headroom.
    assert ours["ate_rmse"] <= 1.5 * ref["ate_rmse"] + 0.03, (ours, ref)

    # Sub-degree rotation for both, within 0.3 deg of each other.
    assert ours["rpe_rot_deg_mean"] < 1.5, ours
    assert abs(ours["rpe_rot_deg_mean"] - ref["rpe_rot_deg_mean"]) < 0.3, (
        ours, ref)


@pytest.mark.skipif(not REFERENCE_AVAILABLE, reason="reference not mounted")
def test_vo_accuracy_matches_reference_photo_scene():
    """REAL-texture scene (round 5): the deep corridor painted with the
    reference's own sample photograph (`sample_data/axis141105267575_TP_V4
    .jpg`) — real texture statistics (1/f spectrum, hard edges, flat
    regions) instead of value noise, same exact 3-D ground truth. Both
    stacks must fully succeed, and ours must stay at-or-above reference
    accuracy on real texture, not just on the synthetic field.

    Calibration (benchmarks/vo_accuracy.py at this exact config,
    2026-08-20): ours ATE 0.2071 vs reference 0.2322 (ratio 0.89), RPE
    rotation mean 0.526 vs 0.556 deg, t-dir 13.9 vs 14.9 deg, both 0/23
    pose failures."""
    ours, ref = run_comparison(n_frames=24, h=192, w=256, max_keypoints=384,
                               scene="photo")
    assert ref is not None

    assert ours["pose_failures"] <= 2, ours
    assert ref["pose_failures"] <= 2, ref

    # Calibrated ratio 0.89 (ours better); allow RANSAC-seed headroom.
    assert ours["ate_rmse"] <= 1.3 * ref["ate_rmse"] + 0.03, (ours, ref)

    # Sub-degree rotation for both, within 0.3 deg of each other.
    assert ours["rpe_rot_deg_mean"] < 1.0, ours
    assert abs(ours["rpe_rot_deg_mean"] - ref["rpe_rot_deg_mean"]) < 0.3, (
        ours, ref)


def test_rotation_invariance_vo_roll_scene():
    """Application-level rotation invariance (round 5, BASELINE.md roll
    scene): under a 15 deg/frame camera roll the oriented flagship must keep
    recovering poses accurately, and must beat the unoriented ablation on
    per-step rotation. Calibrated at this config (2026-08-19): flagship ATE
    0.0839 / rot 0.506; unoriented ATE 0.094 / rot 0.690."""
    frames, poses, k = make_sequence(24, 192, 256, scene="roll")
    flag = evaluate(run_vo_ours(frames, k, max_keypoints=384), poses,
                    "roll_flagship")
    unori = evaluate(run_vo_ours(frames, k, max_keypoints=384,
                                 model="shi_tomasi_sparse_bad_sinkhorn"),
                     poses, "roll_unoriented")

    # The oriented stack survives sustained roll outright. The rot bound is
    # pinned BELOW the unoriented ablation's calibrated 0.690 so a silently
    # disabled angle path (flagship degenerating to the ablation) fails here,
    # not just the relative check below.
    assert flag["pose_failures"] <= 2, flag
    assert flag["ate_rmse"] < 0.2, flag
    assert flag["rpe_rot_deg_mean"] < 0.62, flag
    # ...and orientation must strictly BUY rotation accuracy vs the ablation
    # (calibrated gap 0.18 deg; 0.06 keeps ~0.12 slack for cv2-RANSAC
    # seeding while still failing on flag == unori).
    assert (flag["rpe_rot_deg_mean"]
            <= unori["rpe_rot_deg_mean"] - 0.06), (flag, unori)


def test_akaze_vo_accuracy_disposition_deep_scene():
    """AKAZE VO accuracy disposition (VERDICT r4 item 5): the 512-kpt AKAZE
    family's deep-scene gap (ATE 0.479 vs flagship 0.279 at the export
    default nms_radius=3) is keypoint CLUSTERING, not the detector — at
    nms_radius=5 (one CLI flag) AKAZE matches or beats the flagship on this
    scene. Pins the disposition at the test scale, where the round-5 sweep
    calibrated (2026-08-19): flagship ATE 0.1633 / rot 0.595 / t-dir 14.4;
    AKAZE r5 ATE 0.1456 / rot 0.506 / t-dir 12.1 (r3: 0.245/0.709/27.8).
    Full 60-frame table: BASELINE.md 'AKAZE VO accuracy disposition'."""
    frames, poses, k = make_sequence(24, 192, 256, scene="deep")
    flag = evaluate(run_vo_ours(frames, k, max_keypoints=384), poses,
                    "flagship_384")
    akaze = evaluate(run_vo_akaze(frames, k, max_keypoints=384, nms_radius=5),
                     poses, "akaze_384_nms5")

    assert akaze["pose_failures"] <= 2, akaze
    # Calibrated ratio 0.89 — the verdict's bar is <= ~1.3x flagship.
    assert akaze["ate_rmse"] <= 1.3 * flag["ate_rmse"] + 0.03, (akaze, flag)
    assert akaze["rpe_rot_deg_mean"] <= flag["rpe_rot_deg_mean"] + 0.3, (
        akaze, flag)
    assert akaze["rpe_tdir_deg_mean"] <= 1.3 * flag["rpe_tdir_deg_mean"] + 2, (
        akaze, flag)

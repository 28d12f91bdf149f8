"""App-level VO accuracy: ATE/RPE vs ground truth, ours vs the reference.

VERDICT round-2 item 4: component parity doesn't prove application-level
parity. This benchmark renders a synthetic camera flight through a 3-D
point-sprite scene with known per-frame (R, t), runs

* **ours** — the flagship JAX matcher (+ in-graph mutual-NN extraction) with
  the production pose path (`vo.estimate_pose_ransac`, cv2 RANSAC), and
* **reference** — the reference PyTorch matcher
  (`pytorch_model/feature_detection/shi_tomasi_angle_sparse_bad_sinkhorn.py`)
  with the reference pose path (`pytorch_model/vo/pose_estimation.py`),

both through the same host mutual-NN extraction (ours; differential-tested
against `sample/image_matching.py:49-118`), on IDENTICAL frames, and reports:

* **ATE** — RMSE of camera positions after Sim(3) (Umeyama) alignment
  (monocular scale is unobservable),
* **RPE** — per-step rotation error (deg) and translation-direction error
  (deg) vs ground truth.

Usage: python benchmarks/vo_accuracy.py [--frames 60] [--size 240 320]
       [--skip-reference] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PATH = os.environ.get("REFERENCE_PATH", "/root/reference")


def _cpu_scope():
    """Context manager pinning the CPU backend for the enclosed VO run only.

    Accuracy needs no device speed, and pinning CPU lets this benchmark run
    beside a TPU job (the axon tunnel serializes TPU processes — see
    docs/TESTING.md). Scoped rather than a process-global
    ``jax.config.update``: tests import these runners into the same pytest
    process as the TPU hardware tier, and a global pin would silently move
    later hardware tests onto CPU (where e.g. ``approx_max_k`` falls back to
    exact and recall pins pass vacuously)."""
    import jax

    return jax.default_device(jax.devices("cpu")[0])


# ---------------------------------------------------------------------------
# Synthetic scene with exact ground truth
# ---------------------------------------------------------------------------

def make_scene(n_clusters=2200, seed=0):
    """Random 3-D sprite CLUSTERS in a slab in front of the trajectory.

    Non-planar by construction (depth spread 4..14) so the essential-matrix
    geometry is well-posed for RANSAC (a plane would be a degenerate config).
    Each cluster is 3 nearby sprites with random offsets/intensities: isolated
    Gaussian dots are locally identical (BAD cannot tell them apart — an
    early single-sprite scene produced geometrically-perfect but only ~10
    confident matches/frame), whereas a random constellation inside the
    descriptor's 32x32 patch gives every neighborhood a unique signature.
    """
    rng = np.random.default_rng(seed)
    centers = np.stack([
        rng.uniform(-14.0, 14.0, n_clusters),
        rng.uniform(-9.0, 9.0, n_clusters),
        rng.uniform(4.0, 14.0, n_clusters),
    ], axis=1)
    offsets = rng.normal(0, 0.12, (n_clusters, 3, 3))
    offsets[:, :, 2] *= 0.3  # keep members at similar depth
    pts = (centers[:, None, :] + offsets).reshape(-1, 3)
    intensity = rng.uniform(90.0, 255.0, len(pts))
    size = rng.uniform(0.8, 2.2, len(pts))
    return pts, intensity, size


def gt_poses(n_frames, step=0.08):
    """World-frame camera poses: forward dolly + lateral sine + gentle yaw.

    Returns list of (R_wc (3,3), C (3,)) — camera rotation (world->cam) and
    camera center — with constant-norm translation steps (so monocular
    unit-scale poses accumulate a comparable path before alignment).
    """
    poses = []
    for i in range(n_frames):
        s = i * step
        c = np.array([1.2 * np.sin(s * 0.9), 0.35 * np.sin(s * 1.7), s])
        yaw = 0.10 * np.sin(s * 1.3)
        pitch = 0.04 * np.sin(s * 0.7)
        ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                       [-np.sin(yaw), 0, np.cos(yaw)]])
        rx = np.array([[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)],
                       [0, np.sin(pitch), np.cos(pitch)]])
        poses.append((ry @ rx, c))
    return poses


def render_frame(pts, intensity, size, r_wc, c, k, h, w):
    """Splat each visible point as a Gaussian blob; returns float32 (H, W)."""
    xc = (r_wc @ (pts - c).T).T
    vis = xc[:, 2] > 0.5
    xc = xc[vis]
    inten = intensity[vis]
    sz = size[vis] / xc[:, 2] * k[0, 0] / 300.0 + 0.7
    uv = (k @ xc.T).T
    uv = uv[:, :2] / uv[:, 2:3]
    img = np.zeros((h, w), np.float32)
    rad = 3
    inb = ((uv[:, 0] > -rad) & (uv[:, 0] < w + rad)
           & (uv[:, 1] > -rad) & (uv[:, 1] < h + rad))
    uv, inten, sz = uv[inb], inten[inb], sz[inb]
    dy, dx = np.mgrid[-rad:rad + 1, -rad:rad + 1].astype(np.float32)
    for (u, v), a, s in zip(uv, inten, sz):
        iu, iv = int(np.floor(u)), int(np.floor(v))
        fu, fv = u - iu, v - iv
        patch = a * np.exp(-((dx - fu) ** 2 + (dy - fv) ** 2) / (2 * s * s))
        y0, y1 = iv - rad, iv + rad + 1
        x0, x1 = iu - rad, iu + rad + 1
        sy0, sx0 = max(0, -y0), max(0, -x0)
        sy1 = patch.shape[0] - max(0, y1 - h)
        sx1 = patch.shape[1] - max(0, x1 - w)
        if sy1 <= sy0 or sx1 <= sx0:
            continue
        img[max(0, y0):min(h, y1), max(0, x0):min(w, x1)] += \
            patch[sy0:sy1, sx0:sx1]
    return np.clip(img, 0, 255)


def _hash2(ix, iy):
    """Deterministic lattice hash -> [0, 1) (value-noise base)."""
    h = (ix.astype(np.int64) * 374761393 + iy.astype(np.int64) * 668265263) \
        & 0x7fffffff
    h = (h ^ (h >> 13)) * 1274126177 & 0x7fffffff
    return ((h ^ (h >> 16)) & 0xffff) / 65535.0


def _vnoise(u, v):
    iu, iv = np.floor(u), np.floor(v)
    fu, fv = u - iu, v - iv
    fu = fu * fu * (3 - 2 * fu)
    fv = fv * fv * (3 - 2 * fv)
    a = _hash2(iu, iv)
    b = _hash2(iu + 1, iv)
    c = _hash2(iu, iv + 1)
    d = _hash2(iu + 1, iv + 1)
    return a + (b - a) * fu + (c - a) * fv + (a - b - c + d) * fu * fv


def _tex(u, v):
    """4-octave non-periodic value noise: smooth, locally distinctive."""
    t = (_vnoise(u * 0.8, v * 0.8) * 0.5
         + _vnoise(u * 2.1 + 7.3, v * 2.1 + 3.1) * 0.3
         + _vnoise(u * 5.7 + 13.7, v * 5.7 + 29.4) * 0.15
         + _vnoise(u * 13.1 + 31.1, v * 13.1 + 57.2) * 0.05)
    return 20.0 + 215.0 * t


_PHOTO = None


def _photo_tex(u, v):
    """Bilinear sample of a real PHOTOGRAPH, mirror-tiled — real texture
    statistics (1/f spectrum, strong edges, genuinely flat regions) instead
    of the value noise's uniform band-limited field. Uses the reference's
    own sample photo (`sample_data/axis141105267575_TP_V4.jpg`), so the
    "photo" scene measures VO accuracy on the texture class the reference
    demos on, with the corridor's exact 3-D ground truth."""
    global _PHOTO
    if _PHOTO is None:
        from PIL import Image
        _PHOTO = np.asarray(Image.open(os.path.join(
            REFERENCE_PATH, "sample_data",
            "axis141105267575_TP_V4.jpg")).convert("L"), np.float32)
    ph, pw = _PHOTO.shape
    # ~35 photo px per (already x1.3-scaled) world unit: the 5-unit wall
    # height maps to ~230 photo px — about 1:1 with the rendered frame at
    # working depth — and the mirror period (2*799/45.5 ~ 35 world units on
    # the short axis) exceeds the 60-frame flight, so no repeated texture.
    # Offsets keep every visible coordinate away from the |.| reflection
    # axis (a mirror at an on-screen 0-crossing would paint symmetric
    # feature twins about the image center — ambiguous matches).
    x, y = u * 35.0 + 1000.3, v * 35.0 + 750.7

    def mirror(a, n):
        a = np.abs(a) % (2 * n - 2)
        return np.where(a > n - 1, 2 * n - 2 - a, a)

    x, y = mirror(x, pw), mirror(y, ph)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, pw - 2)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, ph - 2)
    fx, fy = x - x0, y - y0
    t00 = _PHOTO[y0, x0]
    t01 = _PHOTO[y0, x0 + 1]
    t10 = _PHOTO[y0 + 1, x0]
    t11 = _PHOTO[y0 + 1, x0 + 1]
    return (t00 * (1 - fx) * (1 - fy) + t01 * fx * (1 - fy)
            + t10 * (1 - fx) * fy + t11 * fx * fy)


def render_corridor(r_wc, c, k, h, w, tex=_tex):
    """Ray-cast a textured corridor: floor/ceiling/side walls (all OBLIQUE to
    the camera — no dominant frontal plane, which is what made the naive
    room scene degenerate: matches concentrated on the back wall and
    findEssentialMat's planar ambiguity broke recoverPose chirality) plus a
    distant far cap. ``tex(u, v)`` paints the planes: the 4-octave value
    noise by default, or ``_photo_tex`` for real photograph statistics."""
    kinv = np.linalg.inv(k)
    ys, xs = np.mgrid[0:h, 0:w]
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)],
                   -1).reshape(-1, 3).astype(np.float64)
    rays_w = (pix @ kinv.T) @ r_wc
    img = np.full(h * w, 30.0, np.float32)
    depth = np.full(h * w, np.inf, np.float64)
    planes = [
        (1, 2.5, lambda p: (p[:, 0], p[:, 2])),           # floor y=2.5
        (1, -2.5, lambda p: (p[:, 0] + 71.0, p[:, 2])),   # ceiling y=-2.5
        (0, -4.0, lambda p: (p[:, 2], p[:, 1])),          # left wall x=-4
        (0, 7.0, lambda p: (p[:, 2] + 37.0, p[:, 1])),    # right wall x=7
        (2, 40.0, lambda p: (p[:, 0] + 113.0, p[:, 1])),  # far cap z=40
    ]
    for axis, val, pick in planes:
        d = rays_w[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            tval = (val - c[axis]) / d
        ok = (tval > 0.2) & np.isfinite(tval) & (tval < depth)
        pts = c[None, :] + tval[:, None] * rays_w
        u, v = pick(pts[ok])
        img[ok] = tex(u * 1.3, v * 1.3)
        depth[ok] = tval[ok]
    return np.clip(img.reshape(h, w), 0, 255).astype(np.float32)


def gt_poses_deep(n_frames, step=0.60):
    """Lateral-dominant flight down the corridor: large per-frame baseline
    (~10-18 px of flow at 320x240), constant-sign lateral velocity (the
    translation direction never passes through zero, where t-dir RPE is
    undefined), gentle yaw/pitch."""
    poses = []
    for i in range(n_frames):
        s = i * step
        # Bounded lateral weave (stays inside the x in [-4, 7] corridor for
        # any sequence length) + steady forward motion; lateral velocity
        # dominates most frames, so the translation direction is observable.
        c = np.array([1.8 * np.sin(s * 0.25),
                      0.3 * np.sin(s * 0.4), 0.30 * s])
        yaw = 0.04 * np.sin(s * 0.3)
        pitch = 0.02 * np.sin(s * 0.5)
        ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                       [-np.sin(yaw), 0, np.cos(yaw)]])
        rx = np.array([[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)],
                       [0, np.sin(pitch), np.cos(pitch)]])
        poses.append((ry @ rx, c))
    return poses


def gt_poses_roll(n_frames, step=0.45, roll_rate_deg=15.0):
    """Rotation-dominant corridor flight: constant camera ROLL about the
    optical axis (15 deg/frame by default — large enough that unoriented
    descriptors must degrade frame-to-frame) on top of gentle
    lateral+forward motion. Exercises the
    oriented-descriptor path at the application level: frame-to-frame
    matching must survive in-plane rotation, the reference's headline
    rotation-invariance feature (`README.md` of the reference;
    `shi_tomasi_angle_sparse_bad_sinkhorn.py`)."""
    poses = []
    for i in range(n_frames):
        s = i * step
        roll = np.radians(roll_rate_deg) * i
        c = np.array([1.4 * np.sin(s * 0.25),
                      0.25 * np.sin(s * 0.4), 0.30 * s])
        yaw = 0.03 * np.sin(s * 0.3)
        rz = np.array([[np.cos(roll), -np.sin(roll), 0],
                       [np.sin(roll), np.cos(roll), 0], [0, 0, 1]])
        ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                       [-np.sin(yaw), 0, np.cos(yaw)]])
        poses.append((rz @ ry, c))
    return poses


def make_sequence(n_frames, h, w, seed=0, scene="sprite"):
    """scene="sprite": the original 3-D point-sprite flight (ambiguous:
    both stacks fail pose recovery on ~40% of frames — low discriminative
    power, kept for continuity with round-3 numbers). scene="deep": the
    textured corridor with large baseline — the RANSAC stack succeeds on
    100% of frames there, so accuracy differences are meaningful
    (VERDICT r3 item 5). scene="roll": the corridor under a constant
    15 deg/frame camera roll — the rotation-invariance scene (round 5).
    scene="photo": the deep corridor painted with a REAL photograph
    (round 5) — real texture statistics, same exact ground truth."""
    fx = 0.9 * w
    k = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float64)
    if scene in ("deep", "roll", "photo"):
        poses = (gt_poses_roll(n_frames) if scene == "roll"
                 else gt_poses_deep(n_frames))
        tex = _photo_tex if scene == "photo" else _tex
        frames = [render_corridor(r, c, k, h, w, tex=tex) for r, c in poses]
        return frames, poses, k
    pts, inten, size = make_scene(seed=seed)
    poses = gt_poses(n_frames)
    frames = [render_frame(pts, inten, size, r, c, k, h, w)
              for r, c in poses]
    return frames, poses, k


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def umeyama_align(est, gt):
    """Sim(3) alignment est -> gt (monocular scale unobservable); returns
    aligned estimate."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    xe, xg = est - mu_e, gt - mu_g
    cov = xg.T @ xe / len(est)
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u @ vt) < 0:
        s[2, 2] = -1
    r = u @ s @ vt
    var_e = (xe ** 2).sum() / len(est)
    scale = np.trace(np.diag(d) @ s) / var_e if var_e > 1e-12 else 1.0
    return (scale * (r @ est.T)).T + (mu_g - scale * (r @ mu_e))


def ate_rmse(est_positions, gt_positions):
    aligned = umeyama_align(np.asarray(est_positions, float),
                            np.asarray(gt_positions, float))
    return float(np.sqrt(((aligned - gt_positions) ** 2).sum(1).mean()))


def relative_gt(poses, i, j):
    """GT relative pose i->j in recoverPose convention (x_j = R x_i + t)."""
    r_i, c_i = poses[i]
    r_j, c_j = poses[j]
    r_rel = r_j @ r_i.T
    t_rel = r_j @ (c_i - c_j)
    return r_rel, t_rel


def rot_deg(r_a, r_b):
    cosang = (np.trace(r_a.T @ r_b) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(cosang, -1, 1))))


def dir_deg(t_a, t_b):
    """Angle between translation directions, SIGN-SENSITIVE (0..180 deg).

    recoverPose resolves the chirality, so both stacks' t vectors carry a
    meaningful sign — taking |cos| here would score a systematically
    sign-inverted translation as perfect and hide that failure class."""
    na, nb = np.linalg.norm(t_a), np.linalg.norm(t_b)
    if na < 1e-12 or nb < 1e-12:
        return 0.0
    cosang = float(np.dot(np.ravel(t_a), np.ravel(t_b)) / (na * nb))
    return float(np.degrees(np.arccos(np.clip(cosang, -1, 1))))


# ---------------------------------------------------------------------------
# The two VO stacks
# ---------------------------------------------------------------------------

def run_vo_ours(frames, k, max_keypoints=512, match_threshold=0.1,
                max_matches=256,
                model="shi_tomasi_angle_sparse_bad_sinkhorn"):
    """Flagship JAX matcher + host extraction + cv2 RANSAC pose, frame i->i+1.

    ``model`` selects the registry pipeline — the roll scene runs the
    UNORIENTED `shi_tomasi_sparse_bad_sinkhorn` through here as its ablation
    row (orientation off is the only difference from the flagship)."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.utils.host_postprocess import (
        extract_matches)
    from onnx_image_processing_tpu.vo import (CameraIntrinsics,
                                              estimate_pose_ransac)

    h, w = frames[0].shape
    intr = CameraIntrinsics(k[0, 0], k[1, 1], k[0, 2], k[1, 2], w, h)

    rel = []
    with _cpu_scope():
        fn = models.build(model, max_keypoints=max_keypoints)
        for i in range(len(frames) - 1):
            a = jnp.asarray(frames[i][None, None])
            b = jnp.asarray(frames[i + 1][None, None])
            k1, k2, p = (np.asarray(o) for o in fn(a, b))
            mk1, mk2, _ = extract_matches(p, k1, k2, threshold=match_threshold,
                                          max_matches=max_matches)
            r, t, _ = estimate_pose_ransac(mk1, mk2, intr)
            rel.append((r, t))
    return rel


def run_vo_ours_ingraph_e(frames, k, max_keypoints=512, match_threshold=0.1,
                          max_matches=256, irls_iters=0, ransac_hypotheses=0,
                          gate_inlier_ratio=None):
    """In-graph essential-matrix pipeline (+ host recoverPose chirality) —
    app-level accuracy for the essential family (no HOST RANSAC in the loop;
    reference analogue: `sample/visual_odometry.py:95-143`).
    ``ransac_hypotheses`` > 0 switches the solve to the in-graph vectorized
    RANSAC (essential_ransac_from_candidates) with ``irls_iters`` polish.
    ``gate_inlier_ratio`` applies the production VO loop's inlier-ratio
    rejection (`cli/visual_odometry.py`, default 0.5 there) to recoverPose's
    chirality-consistent count — the same frame gate the host-RANSAC stack
    gets implicitly from findEssentialMat+recoverPose."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.utils.host_postprocess import (
        extract_matches)
    from onnx_image_processing_tpu.vo import CameraIntrinsics, recover_pose

    h, w = frames[0].shape
    intr = CameraIntrinsics(k[0, 0], k[1, 1], k[0, 2], k[1, 2], w, h)

    rel = []
    with _cpu_scope():
        fn = models.build(
            "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix",
            max_keypoints=max_keypoints, essential_irls_iters=irls_iters,
            essential_ransac_hypotheses=ransac_hypotheses)
        k_inv = jnp.asarray(np.linalg.inv(k).astype(np.float32))
        for i in range(len(frames) - 1):
            a = jnp.asarray(frames[i][None, None])
            b = jnp.asarray(frames[i + 1][None, None])
            k1, k2, p, e = (np.asarray(o) for o in fn(a, b, k_inv))
            mk1, mk2, _ = extract_matches(p, k1, k2, threshold=match_threshold,
                                          max_matches=max_matches)
            r, t, inl = recover_pose(e, mk1, mk2, intr)
            if (gate_inlier_ratio is not None and r is not None
                    and inl.sum() < gate_inlier_ratio * max(len(mk1), 1)):
                r, t = None, None
            rel.append((r, t))
    return rel


def run_vo_reference(frames, k, max_keypoints=512, match_threshold=0.1,
                     max_matches=256):
    """Reference torch matcher + (same) host extraction + reference pose path."""
    import cv2
    import torch

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from pytorch_model.feature_detection.shi_tomasi_angle_sparse_bad_sinkhorn import (  # noqa: E501
        ShiTomasiAngleSparseBADSinkhornMatcher)
    from pytorch_model.vo import CameraIntrinsics as RefIntrinsics
    from pytorch_model.vo import estimate_pose_ransac as ref_pose

    from onnx_image_processing_tpu.utils.host_postprocess import (
        extract_matches)

    h, w = frames[0].shape
    intr = RefIntrinsics(k[0, 0], k[1, 1], k[0, 2], k[1, 2], w, h)
    # Match our registry defaults (the reference export config): hard
    # binarize, eps 0.05, nms radius 5.
    matcher = ShiTomasiAngleSparseBADSinkhornMatcher(
        max_keypoints=max_keypoints, num_pairs=512,
        binarize=True, soft_binarize=False,
        epsilon=0.05, nms_radius=5)
    matcher.eval()

    rel = []
    with torch.no_grad():
        for i in range(len(frames) - 1):
            a = torch.from_numpy(frames[i][None, None].copy())
            b = torch.from_numpy(frames[i + 1][None, None].copy())
            k1, k2, p = (o.numpy() for o in matcher(a, b))
            mk1, mk2, _ = extract_matches(p, k1, k2,
                                          threshold=match_threshold,
                                          max_matches=max_matches)
            # The reference's pose path crashes on OpenCV 5 when
            # findEssentialMat returns stacked (3k, 3) candidate solutions
            # (`vo/pose_estimation.py:102` passes E through unchecked); ours
            # scores candidates by chirality-consistent inliers
            # (vo/pose.py). Count the crash as that frame's pose failure.
            # Only that documented cv2.error is a "reference pose failure" —
            # anything else (import/shape/API bugs) is a broken harness and
            # must propagate, not skew the pinned comparison.
            try:
                r, t, _ = ref_pose(mk1, mk2, intr)
            except cv2.error:
                r, t = None, None
            rel.append((r, t))
    return rel


def evaluate(rel_poses, gt, label):
    """Accumulate relative poses into a trajectory + compute ATE/RPE against
    the ``gt`` pose list (the sequence the poses were estimated on)."""
    from onnx_image_processing_tpu.vo import Trajectory

    gt_positions = np.array([c for _, c in gt])
    traj = Trajectory()
    rot_errs, dir_errs, fails = [], [], 0
    for i, (r, t) in enumerate(rel_poses):
        if r is None:
            fails += 1
            traj.add_relative_pose(np.eye(3), np.zeros(3))
            continue
        r_gt, t_gt = relative_gt(gt, i, i + 1)
        rot_errs.append(rot_deg(r, r_gt))
        dir_errs.append(dir_deg(t, t_gt))
        # recoverPose returns camera2<-camera1 (x2 = R x1 + t); the camera
        # CENTER motion in the previous camera frame is -R^T t, and the
        # orientation update is R^T — accumulate in world frame.
        traj.add_relative_pose(np.asarray(r).T,
                               -np.asarray(r).T @ np.reshape(t, (3, 1)))
    est_pos = traj.get_positions_array()
    ate = ate_rmse(est_pos, gt_positions[:len(est_pos)])
    rec = {
        "vo": label,
        "frames": len(rel_poses) + 1,
        "pose_failures": fails,
        "ate_rmse": round(ate, 4),
        "rpe_rot_deg_mean": round(float(np.mean(rot_errs)), 4) if rot_errs else None,
        "rpe_rot_deg_p95": round(float(np.percentile(rot_errs, 95)), 4) if rot_errs else None,
        "rpe_tdir_deg_mean": round(float(np.mean(dir_errs)), 4) if dir_errs else None,
        "rpe_tdir_deg_p95": round(float(np.percentile(dir_errs, 95)), 4) if dir_errs else None,
    }
    print(json.dumps(rec))
    return rec


def run_vo_akaze(frames, k, max_keypoints=512, match_threshold=0.1,
                 max_matches=256, **overrides):
    """AKAZE matcher (BASELINE config #5 family) + host extraction + cv2
    RANSAC pose — the VO deployment model's accuracy row. ``overrides`` are
    MatcherConfig fields (the round-5 disposition sweep runs nms_radius
    through here — BASELINE.md AKAZE VO table)."""
    import jax.numpy as jnp

    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.utils.host_postprocess import (
        extract_matches)
    from onnx_image_processing_tpu.vo import (CameraIntrinsics,
                                              estimate_pose_ransac)

    h, w = frames[0].shape
    intr = CameraIntrinsics(k[0, 0], k[1, 1], k[0, 2], k[1, 2], w, h)

    rel = []
    with _cpu_scope():
        fn = models.build("akaze_sparse_bad_sinkhorn",
                          max_keypoints=max_keypoints, **overrides)
        for i in range(len(frames) - 1):
            a = jnp.asarray(frames[i][None, None])
            b = jnp.asarray(frames[i + 1][None, None])
            k1, k2, p = (np.asarray(o) for o in fn(a, b))
            mk1, mk2, _ = extract_matches(p, k1, k2, threshold=match_threshold,
                                          max_matches=max_matches)
            r, t, _ = estimate_pose_ransac(mk1, mk2, intr)
            rel.append((r, t))
    return rel


def run_comparison(n_frames, h, w, max_keypoints, skip_reference=False,
                   scene="sprite", with_akaze=False, with_unoriented=False):
    """Run both VO stacks on one shared synthetic sequence; returns
    (ours_record, reference_record_or_None). Reused by the pinned accuracy
    test (tests/test_vo_accuracy.py). ``with_unoriented`` adds the
    orientation-ablation row (the roll scene's point)."""
    frames, poses, k = make_sequence(n_frames, h, w, scene=scene)

    ours = run_vo_ours(frames, k, max_keypoints)
    rec_ours = evaluate(ours, poses, f"ours_jax_{scene}")
    if with_akaze:
        evaluate(run_vo_akaze(frames, k, max_keypoints), poses,
                 f"ours_akaze_{scene}")
    if with_unoriented:
        evaluate(run_vo_ours(frames, k, max_keypoints,
                             model="shi_tomasi_sparse_bad_sinkhorn"),
                 poses, f"ours_unoriented_{scene}")
    rec_ref = None
    if not skip_reference and os.path.isdir(
            os.path.join(REFERENCE_PATH, "pytorch_model")):
        ref = run_vo_reference(frames, k, max_keypoints)
        rec_ref = evaluate(ref, poses, f"reference_torch_{scene}")
    return rec_ours, rec_ref


def run_comparison_ingraph_e(n_frames, h, w, max_keypoints, irls_iters=0,
                             scene="sprite", ransac_hypotheses=0,
                             gate_inlier_ratio=None):
    """In-graph-E stack vs the host-RANSAC stack on one shared sequence."""
    frames, poses, k = make_sequence(n_frames, h, w, scene=scene)
    rec_ransac = evaluate(run_vo_ours(frames, k, max_keypoints), poses,
                          "ours_ransac")
    label = "ours_ingraph_e"
    if ransac_hypotheses:
        label += f"_ransac{ransac_hypotheses}"
    if irls_iters:
        label += f"_irls{irls_iters}"
    if gate_inlier_ratio:
        label += f"_gate{gate_inlier_ratio}"
    rec_e = evaluate(
        run_vo_ours_ingraph_e(frames, k, max_keypoints,
                              irls_iters=irls_iters,
                              ransac_hypotheses=ransac_hypotheses,
                              gate_inlier_ratio=gate_inlier_ratio),
        poses, label)
    return rec_ransac, rec_e


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=[240, 320],
                    metavar=("H", "W"))
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--scene", choices=["sprite", "deep", "roll", "photo"],
                    default="sprite",
                    help="sprite: round-3 ambiguous scene; deep: textured "
                         "corridor where the RANSAC stack fully succeeds "
                         "(discriminative); roll: corridor under a "
                         "15 deg/frame camera roll (rotation invariance); "
                         "photo: the deep corridor painted with a real "
                         "photograph (real texture statistics)")
    ap.add_argument("--akaze", action="store_true",
                    help="add the AKAZE-family stack row")
    ap.add_argument("--unoriented", action="store_true",
                    help="add the unoriented-descriptor ablation row "
                         "(shi_tomasi_sparse_bad_sinkhorn)")
    ap.add_argument("--irls", type=int, default=0,
                    help="IRLS reweighting iterations for the in-graph "
                         "essential solve (essential_irls_iters)")
    ap.add_argument("--ransac", type=int, default=0,
                    help="in-graph vectorized RANSAC hypothesis count for "
                         "the essential solve (essential_ransac_hypotheses); "
                         "--irls then counts polish iterations")
    ap.add_argument("--gate", type=float, default=None,
                    help="inlier-ratio frame gate for the in-graph-E stack "
                         "(the production VO loop's min_inlier_ratio, "
                         "default 0.5 there)")
    ap.add_argument("--in-graph-e", action="store_true",
                    help="compare the in-graph essential-matrix pipeline "
                         "(+ host recoverPose) against the RANSAC stack "
                         "instead of against the reference")
    args = ap.parse_args(argv)

    h, w = args.size
    if args.in_graph_e:
        run_comparison_ingraph_e(args.frames, h, w, args.max_keypoints,
                                 irls_iters=args.irls, scene=args.scene,
                                 ransac_hypotheses=args.ransac,
                                 gate_inlier_ratio=args.gate)
        return 0
    rec_ours, rec_ref = run_comparison(args.frames, h, w, args.max_keypoints,
                                       args.skip_reference, scene=args.scene,
                                       with_akaze=args.akaze,
                                       with_unoriented=args.unoriented)
    if rec_ref is not None:
        print(json.dumps({
            "vo": "summary",
            "ate_ratio_ours_over_ref":
                round(rec_ours["ate_rmse"] / max(rec_ref["ate_rmse"], 1e-9), 3),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

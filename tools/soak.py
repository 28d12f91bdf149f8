"""Randomized robustness soak: fuzz pipeline configs and shapes vs the oracle.

Runs the flagship matcher (and the unoriented variant) across randomized
configurations — image sizes (including non-multiples of every alignment in
the stack), keypoint budgets, descriptor widths, sampling modes, binarize
modes — comparing the Pallas interpret path against the jnp oracle path on
every draw, plus internal invariants (keypoint validity contract, descriptor
norms, Sinkhorn marginals). Complements the deterministic pytest suite
(which pins seeds) with breadth; run manually or in a cron:

    python tools/soak.py --iters 25 --seed 0

Exit code 0 = all draws passed. Any failure prints the full draw config so
it can be turned into a pinned regression test.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# CPU is pinned lazily in main(): the --device tpu mode must keep the real
# backend so the COMPILED Mosaic path is what gets fuzzed (jax is only
# imported inside the draw runners, after main() has set the environment).

import numpy as np


def _one_draw(rng: np.random.Generator, idx: int) -> dict:
    h = int(rng.integers(70, 300))
    w = int(rng.integers(90, 400))
    return {
        "idx": idx,
        "h": h,
        "w": w,
        "max_keypoints": int(rng.choice([16, 24, 40, 64, 96])),
        "num_pairs": int(rng.choice([256, 512])),
        "sampling_mode": str(rng.choice(["nearest", "bilinear"])),
        "binarize": bool(rng.integers(0, 2)),
        "soft_binarize": bool(rng.integers(0, 2)),
        "with_angle": bool(rng.integers(0, 2)),
        "nms_radius": int(rng.choice([3, 5, 7])),
        "seed": int(rng.integers(0, 2**31)),
    }


def _one_akaze_draw(rng: np.random.Generator, idx: int) -> dict:
    return {
        "idx": idx,
        "h": int(rng.integers(90, 260)),
        "w": int(rng.integers(120, 340)),
        "max_keypoints": int(rng.choice([16, 24, 40, 64])),
        "num_pairs": int(rng.choice([256, 512])),
        "sampling_mode": str(rng.choice(["nearest", "bilinear"])),
        "binarize": bool(rng.integers(0, 2)),
        "soft_binarize": bool(rng.integers(0, 2)),
        "nms_radius": int(rng.choice([3, 5])),
        "num_scales": int(rng.choice([2, 3, 4])),
        "diffusion_iterations": int(rng.choice([2, 3, 5])),
        "kappa": float(rng.choice([0.02, 0.05, 0.1])),
        "akaze_threshold": float(rng.choice([0.0005, 0.001, 0.002])),
        "akaze_nms_size": int(rng.choice([3, 5])),
        "seed": int(rng.integers(0, 2**31)),
    }


def _run_akaze_reference_draw(draw: dict) -> list[str]:
    """Diff a random AKAZE-pipeline config against the reference class —
    covers the diffusion/Hessian/orientation hyperparameter space the
    Shi-Tomasi draws don't touch."""
    ref_path = os.environ.get("REFERENCE_PATH", "/root/reference")
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from pytorch_model.feature_detection.akaze_sparse_bad_sinkhorn import (
        AKAZESparseBADSinkhornMatcher)
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.models.akaze_family import (
        akaze_sparse_bad_sinkhorn_match)

    errors: list[str] = []
    rng = np.random.default_rng(draw["seed"])
    epsilon = float(rng.choice([0.05, 1.0]))
    img1 = rng.uniform(0, 255, (1, 1, draw["h"], draw["w"])).astype(np.float32)
    img2 = np.roll(img1, 4, axis=3)

    shared = dict(
        max_keypoints=draw["max_keypoints"], num_pairs=draw["num_pairs"],
        sampling_mode=draw["sampling_mode"], binarize=draw["binarize"],
        soft_binarize=draw["soft_binarize"], nms_radius=draw["nms_radius"],
        epsilon=epsilon)
    ref = AKAZESparseBADSinkhornMatcher(
        num_scales=draw["num_scales"],
        diffusion_iterations=draw["diffusion_iterations"],
        kappa=draw["kappa"], threshold=draw["akaze_threshold"],
        akaze_nms_size=draw["akaze_nms_size"], **shared)
    with torch.no_grad():
        k1_e, k2_e, p_e = (t.numpy() for t in ref(
            torch.from_numpy(img1), torch.from_numpy(img2)))

    cfg = models.get("akaze_sparse_bad_sinkhorn").defaults.with_(
        topk_mode="sort",
        akaze_num_scales=draw["num_scales"],
        akaze_diffusion_iterations=draw["diffusion_iterations"],
        akaze_kappa=draw["kappa"], akaze_threshold=draw["akaze_threshold"],
        akaze_nms_size=draw["akaze_nms_size"], **shared)
    k1, k2, p = (np.asarray(v) for v in akaze_sparse_bad_sinkhorn_match(
        jnp.asarray(img1), jnp.asarray(img2), cfg))

    s_o1 = {tuple(v) for v in k1[0].tolist()}
    s_e1 = {tuple(v) for v in k1_e[0].tolist()}
    s_o2 = {tuple(v) for v in k2[0].tolist()}
    s_e2 = {tuple(v) for v in k2_e[0].tolist()}
    # AKAZE scores pass through amax over scales + a threshold mask; allow a
    # couple of rank-boundary/threshold-edge swaps from float noise.
    if len(s_o1 ^ s_e1) > 4 or len(s_o2 ^ s_e2) > 4:
        errors.append(f"keypoint sets differ ({len(s_o1 ^ s_e1)}, "
                      f"{len(s_o2 ^ s_e2)} symmetric difference)")
    return errors


def _run_draw(draw: dict) -> list[str]:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    import onnx_image_processing_tpu.kernels.sparse_sampler as ss
    from onnx_image_processing_tpu.core.config import MatcherConfig
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match,
        shi_tomasi_sparse_bad_sinkhorn_match)

    errors: list[str] = []
    rng = np.random.default_rng(draw["seed"])
    img1 = jnp.asarray(
        rng.uniform(0, 255, (1, 1, draw["h"], draw["w"])).astype(np.float32))
    img2 = jnp.asarray(np.roll(np.asarray(img1), 5, axis=3))

    cfg = MatcherConfig(
        max_keypoints=draw["max_keypoints"], num_pairs=draw["num_pairs"],
        sampling_mode=draw["sampling_mode"], binarize=draw["binarize"],
        soft_binarize=draw["soft_binarize"], nms_radius=draw["nms_radius"])
    match = (shi_tomasi_angle_sparse_bad_sinkhorn_match if draw["with_angle"]
             else shi_tomasi_sparse_bad_sinkhorn_match)

    # Oracle path (jnp sampler) vs Pallas interpret path.
    k1_o, k2_o, p_o = match(img1, img2, cfg.with_(use_pallas=False))

    orig = ss.sparse_box_sample

    def interpreted(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    ss.sparse_box_sample = interpreted
    try:
        k1_p, k2_p, p_p = match(img1, img2, cfg.with_(use_pallas=True))
    finally:
        ss.sparse_box_sample = orig

    k1_o, k2_o, p_o, k1_p, k2_p, p_p = (
        np.asarray(v) for v in (k1_o, k2_o, p_o, k1_p, k2_p, p_p))

    if not np.array_equal(k1_o, k1_p) or not np.array_equal(k2_o, k2_p):
        errors.append("keypoints differ between oracle and Pallas paths")
    tol = 5e-3 if not draw["binarize"] else (
        5e-3 if draw["soft_binarize"] else 0.5)  # hard bits: allow rare flips
    bad = np.abs(p_o - p_p) > tol
    frac = bad.mean()
    if frac > (0.0 if not draw["binarize"] or draw["soft_binarize"] else 1e-3):
        if not (draw["binarize"] and not draw["soft_binarize"] and frac < 5e-3):
            errors.append(f"P mismatch frac={frac:.2e} (tol {tol})")

    # Invariants on the oracle output.
    k = cfg.max_keypoints
    for nm, kk in (("k1", k1_o), ("k2", k2_o)):
        invalid = kk[0, :, 0] < 0
        if not np.array_equal(kk[0, invalid], np.full((invalid.sum(), 2), -1.0)):
            errors.append(f"{nm}: invalid slots not (-1,-1)")
        valid = kk[0, ~invalid]
        if valid.size and ((valid[:, 0] > draw["h"] - 1).any()
                           or (valid[:, 1] > draw["w"] - 1).any()):
            errors.append(f"{nm}: keypoints out of bounds")
    rows = p_o[0].sum(axis=1)
    if not np.all(np.isfinite(p_o)):
        errors.append("P contains non-finite values")
    # Sinkhorn rows (excluding dustbin row) sum to ~1 after 20 iterations.
    if np.abs(rows[:-1] - 1.0).max() > 0.15:
        errors.append(f"Sinkhorn row marginals off: {np.abs(rows[:-1]-1).max():.3f}")
    return errors


def _one_ties_draw(rng: np.random.Generator, idx: int) -> dict:
    # Tiled textures create EXACT score ties at the tile period. Block-vs-sort
    # divergence needs ties WITHIN one (r+1)^2 block, i.e. tie distance <=
    # nms_radius (NMS already forces same-window survivors to tie) — so half
    # the draws use MICRO tiles with period <= nms_radius, the adversarial
    # case; the rest use macro tiles + quantization (cross-block ties, which
    # both modes must keep identically).
    nms_radius = int(rng.choice([3, 5]))
    micro = bool(rng.integers(0, 2))
    lo, hi = (2, nms_radius + 2) if micro else (24, 60)
    return {
        "idx": idx,
        "tile_h": int(rng.integers(lo, hi)),
        "tile_w": int(rng.integers(lo, hi)),
        "reps_y": int(rng.integers(2, 5)) * (12 if micro else 1),
        "reps_x": int(rng.integers(2, 6)) * (12 if micro else 1),
        "quant_levels": int(rng.choice([4, 8, 16, 256])),
        "max_keypoints": int(rng.choice([32, 64, 128])),
        "nms_radius": nms_radius,
        "seed": int(rng.integers(0, 2**31)),
    }


def _run_ties_draw(draw: dict) -> list[str]:
    """Characterize the block-topk tie divergence (VERDICT r2 item 8).

    The shipping default ``topk_mode="block"`` keeps ONE representative of a
    same-block score tie where the reference's flat sort keeps every tied
    copy (`ops/keypoints.py:51-67`). This mode drives adversarial tied inputs
    (tiled + quantized images) through BOTH modes of the full flagship
    matcher and (a) asserts the divergence is CONFINED to exact score ties —
    every differing keypoint's score equals a score present on both sides —
    and (b) measures the downstream mutual-NN match-set divergence, printing
    it per draw so the default path's deviation is a bounded number, not an
    assumption.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from onnx_image_processing_tpu.core.config import MatcherConfig
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match)
    from onnx_image_processing_tpu.utils.host_postprocess import (
        extract_matches)

    errors: list[str] = []
    rng = np.random.default_rng(draw["seed"])
    tile = rng.uniform(0, 255, (draw["tile_h"], draw["tile_w"]))
    img = np.tile(tile, (draw["reps_y"], draw["reps_x"]))
    q = 256 // draw["quant_levels"]
    img = (img // q * q).astype(np.float32)
    img1 = jnp.asarray(img[None, None])
    img2 = jnp.asarray(np.roll(img, 3, axis=1)[None, None].astype(np.float32))

    # Export-config defaults (hard binarize, eps 0.05) so P is peaked and the
    # downstream match comparison is meaningful (soft eps=1.0 dilutes P to
    # ~1/K and extracts nothing).
    base = MatcherConfig(max_keypoints=draw["max_keypoints"],
                         num_pairs=256, nms_radius=draw["nms_radius"],
                         binarize=True, soft_binarize=False, epsilon=0.05,
                         use_pallas=False)
    out = {}
    for mode in ("block", "sort"):
        k1, k2, p = shi_tomasi_angle_sparse_bad_sinkhorn_match(
            img1, img2, base.with_(topk_mode=mode))
        out[mode] = tuple(np.asarray(v) for v in (k1, k2, p))

    stats = {}
    for side in (0, 1):
        kb, ks_ = out["block"][side][0], out["sort"][side][0]
        set_b = {tuple(v) for v in kb.tolist()}
        set_s = {tuple(v) for v in ks_.tolist()}
        diff = set_b ^ set_s
        stats[f"kpt_diff_{side + 1}"] = len(diff)
        if diff:
            # Every divergent keypoint must sit on an exact score tie:
            # its score (from the raw map) appears among BOTH modes' kept
            # scores — i.e. block mode dropped/kept a tied COPY, never a
            # uniquely-scored keypoint.
            from onnx_image_processing_tpu.ops import shi_tomasi_score

            smap = np.asarray(shi_tomasi_score(
                img1 if side == 0 else img2, block_size=base.block_size))[0, 0]
            scores_b = {round(float(smap[int(y), int(x)]), 10)
                        for (y, x) in set_b if y >= 0}
            scores_s = {round(float(smap[int(y), int(x)]), 10)
                        for (y, x) in set_s if y >= 0}
            for (y, x) in diff:
                if y < 0:
                    continue
                sc = round(float(smap[int(y), int(x)]), 10)
                if sc not in scores_b or sc not in scores_s:
                    errors.append(
                        f"side {side + 1}: divergent keypoint ({y},{x}) "
                        f"score {sc} is NOT a shared tie — block mode "
                        f"changed a uniquely-ranked selection")
                    break

    # Downstream divergence: extracted mutual-NN match pair sets.
    pairs = {}
    for mode in ("block", "sort"):
        k1, k2, p = out[mode]
        mk1, mk2, _ = extract_matches(p, k1, k2, threshold=0.1,
                                      max_matches=draw["max_keypoints"])
        pairs[mode] = {(tuple(a), tuple(b))
                       for a, b in zip(mk1.tolist(), mk2.tolist())}
    inter = len(pairs["block"] & pairs["sort"])
    union = len(pairs["block"] | pairs["sort"]) or 1
    stats["match_jaccard"] = round(inter / union, 3)
    stats["matches_block"] = len(pairs["block"])
    stats["matches_sort"] = len(pairs["sort"])
    print(f"       ties stats: {stats}")
    return errors


def _run_reference_draw(draw: dict) -> list[str]:
    """Diff a random-config draw against the reference PyTorch pipeline
    (the strongest oracle): exact keypoint-SET equality (flat top-k mode
    matches torch.topk's set semantics) and the Sinkhorn matrix compared
    through the per-side keypoint index mapping, permutation-invariantly."""
    ref_path = os.environ.get("REFERENCE_PATH", "/root/reference")
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from pytorch_model.feature_detection.shi_tomasi_angle_sparse_bad_sinkhorn import (  # noqa: E501
        ShiTomasiAngleSparseBADSinkhornMatcher)
    from pytorch_model.feature_detection.shi_tomasi_sparse_bad_sinkhorn import (
        ShiTomasiSparseBADSinkhornMatcher)
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match,
        shi_tomasi_sparse_bad_sinkhorn_match)

    errors: list[str] = []
    rng = np.random.default_rng(draw["seed"])
    epsilon = float(rng.choice([0.05, 1.0]))
    distance = str(rng.choice(["l2", "l1"]))
    img1 = rng.uniform(0, 255, (1, 1, draw["h"], draw["w"])).astype(np.float32)
    img2 = np.roll(img1, 5, axis=3)

    kwargs = dict(
        max_keypoints=draw["max_keypoints"], num_pairs=draw["num_pairs"],
        sampling_mode=draw["sampling_mode"], binarize=draw["binarize"],
        soft_binarize=draw["soft_binarize"], nms_radius=draw["nms_radius"],
        epsilon=epsilon, distance_type=distance)
    ref_cls = (ShiTomasiAngleSparseBADSinkhornMatcher if draw["with_angle"]
               else ShiTomasiSparseBADSinkhornMatcher)
    ref = ref_cls(**kwargs)
    with torch.no_grad():
        k1_e, k2_e, p_e = (t.numpy() for t in ref(
            torch.from_numpy(img1), torch.from_numpy(img2)))

    # Base on the REGISTRY defaults for the pipeline (they encode the
    # reference class defaults, e.g. the flagship's block_size=5 vs the
    # unoriented matcher's 3), then pin the drawn fields on both sides.
    reg_name = ("shi_tomasi_angle_sparse_bad_sinkhorn" if draw["with_angle"]
                else "shi_tomasi_sparse_bad_sinkhorn")
    cfg = models.get(reg_name).defaults.with_(topk_mode="sort", **kwargs)
    match = (shi_tomasi_angle_sparse_bad_sinkhorn_match if draw["with_angle"]
             else shi_tomasi_sparse_bad_sinkhorn_match)
    k1, k2, p = (np.asarray(v) for v in match(
        jnp.asarray(img1), jnp.asarray(img2), cfg))

    def mapping(ours, theirs, nm):
        s_o = {tuple(v) for v in ours[0].tolist()}
        s_e = {tuple(v) for v in theirs[0].tolist()}
        if s_o != s_e:
            errors.append(f"{nm}: keypoint sets differ "
                          f"({len(s_o ^ s_e)} symmetric difference)")
            return None
        inv_e = {tuple(v): i for i, v in enumerate(theirs[0].tolist())}
        return [inv_e[tuple(v)] for v in ours[0].tolist()]

    m1 = mapping(k1, k1_e, "k1")
    m2 = mapping(k2, k2_e, "k2")
    if m1 is not None and m2 is not None:
        kk = draw["max_keypoints"]
        idx1 = np.array(m1 + [kk])   # dustbin maps to itself
        idx2 = np.array(m2 + [kk])
        p_e_perm = p_e[0][np.ix_(idx1, idx2)]
        diff = np.abs(p[0] - p_e_perm)
        # P entries scale ~1/(K+1) (doubly-stochastic rows), so the absolute
        # tolerance must scale with entry magnitude: a fixed 2e-2 is 3x
        # tighter relatively at K=16 (entries ~0.06) than at K=64 — a
        # seed-42 draw failed by ONE entry at 0.022 exactly this way.
        kk = draw["max_keypoints"]
        tol = max(5e-2 if draw["binarize"] and not draw["soft_binarize"]
                  else 2e-2, 0.5 / kk)
        frac_bad = (diff > tol).mean()
        # Sharp-epsilon amplification: at epsilon <= 0.05 a ~2e-3
        # cross-implementation descriptor difference (bilinear float order,
        # the reference's align-corners 1e-8 slack) moves Sinkhorn logits by
        # ~cost/eps, so near-tied assignments legitimately rebalance by
        # O(0.1) at a handful of entries. Keypoint sets are still exact.
        max_frac = 5e-3 if epsilon <= 0.05 else 2e-3
        if frac_bad > max_frac:
            errors.append(
                f"P mismatch: max={diff.max():.3f} frac>{tol}={frac_bad:.2e}")
    return errors


def _one_essential_draw(rng: np.random.Generator, idx: int) -> dict:
    return {
        "idx": idx,
        "n": int(rng.integers(24, 400)),
        "m": int(rng.integers(24, 400)),
        "fx": float(rng.uniform(8, 600)),
        "cx": float(rng.uniform(8, 320)),
        "seed": int(rng.integers(0, 2**31)),
    }


def _run_essential_reference_draw(draw: dict) -> list[str]:
    """Diff the grid essential-matrix estimator against the reference's
    power-iteration solver on random probability matrices of random (even
    rectangular/dynamic) shapes and random intrinsics."""
    ref_path = os.environ.get("REFERENCE_PATH", "/root/reference")
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from pytorch_model.geometry.essential_matrix_estimator import (
        EssentialMatrixEstimator)
    from onnx_image_processing_tpu.geometry import estimate_essential_matrix

    errors: list[str] = []
    rng = np.random.default_rng(draw["seed"])
    n, m = draw["n"], draw["m"]
    k = np.array([[draw["fx"], 0, draw["cx"]],
                  [0, draw["fx"], draw["cx"]], [0, 0, 1]], np.float32)
    p = rng.random((n, m)).astype(np.float32)

    ref = EssentialMatrixEstimator(torch.from_numpy(k), image_shape=(32, 32))
    with torch.no_grad():
        e_ref = ref(torch.from_numpy(p)).numpy()
    k_inv = jnp.asarray(np.linalg.inv(k).astype(np.float32))
    e = np.asarray(estimate_essential_matrix(
        jnp.asarray(p), k_inv, image_shape=(32, 32), method="power"))

    def sign_diff(a, b):
        # E is only defined up to sign (the epipolar constraint is
        # sign-invariant); power iteration's sign flips at near-ties.
        return min(np.abs(a - b).max(), np.abs(a + b).max())

    # 30 power iterations accumulate f32 order differences; ~1e-2 is the
    # reproduction accuracy across implementations (the pinned tests hold
    # 1e-3 on their fixtures; adversarial random P can be worse).
    d = sign_diff(e, e_ref)
    if d > 2e-2:
        # Arbiter: the exact eigh minimizer. If the reference's power result
        # differs this much from the EXACT solution too, its 30 iterations
        # simply did not converge on this draw (a documented reference
        # limitation, geometry/essential_matrix.py) — not a parity gap.
        e_exact = np.asarray(estimate_essential_matrix(
            jnp.asarray(p), k_inv, image_shape=(32, 32)))
        if sign_diff(e_exact, e_ref) <= 2e-2:
            errors.append(
                f"E mismatch vs reference {d:.2e} while the reference agrees "
                f"with the exact minimizer — our power path diverges")
    return errors


# Fixed AKAZE hi-res lattice (VERDICT r4 item 6): odd / >720p / 1080p-class
# shapes, EXACT values reused across draws so the FED ladder's minutes-of-
# compile-per-shape cost is paid at most once per (shape, kpts) cell and then
# served by the persistent compile cache — random shape jitter at these sizes
# would make every draw a fresh multi-minute compile.
_AKAZE_HIRES_SHAPES = ((727, 1287), (911, 1607), (1083, 1923))


def _one_tpu_draw(rng: np.random.Generator, idx: int) -> dict:
    # Production-and-above shapes (VERDICT r2 item 5): up to 1080p, with odd
    # jitter so no draw is tile-aligned. Images over the sampler's 4 MB VMEM
    # residency budget engage the windowed-DMA fallback naturally.
    # Families: the flagship dominates the draw budget; AKAZE and the
    # essential-family graph make every compiled production pipeline part of
    # the fuzz space (VERDICT r3 item 6). AKAZE hi-res draws come from the
    # fixed precompiled lattice above with registry-default config (compile
    # budget); low-res AKAZE draws keep full config variety.
    family = str(rng.choice(["flagship", "flagship", "akaze", "essential"]))
    akaze_hires = family == "akaze" and bool(rng.integers(0, 2))
    if akaze_hires:
        h, w = _AKAZE_HIRES_SHAPES[
            int(rng.integers(0, len(_AKAZE_HIRES_SHAPES)))]
    elif family == "akaze":
        h = int(rng.choice([480, 560, 720])) + int(rng.integers(0, 9))
        w = int(rng.choice([640, 960, 1280])) + int(rng.integers(0, 9))
    else:
        h = int(rng.choice([480, 560, 720, 904, 1080])) + int(rng.integers(0, 9))
        w = int(rng.choice([640, 960, 1280, 1609, 1920])) + int(rng.integers(0, 9))
    # ONE base draw dict — family-specific cells override fields below, so a
    # new knob added here reaches every family (round-5 advisor finding).
    draw = {
        "idx": idx,
        "family": family,
        "h": h,
        "w": w,
        "max_keypoints": int(rng.choice([128, 256, 512, 1024])),
        "num_pairs": int(rng.choice([256, 512])),
        "sampling_mode": str(rng.choice(["nearest", "bilinear"])),
        "binarize": bool(rng.integers(0, 2)),
        "soft_binarize": bool(rng.integers(0, 2)),
        "with_angle": bool(rng.integers(0, 2)),
        "nms_radius": int(rng.choice([3, 5])),
        # Exact selection modes only — "approx" is characterized by its own
        # recall-based mode (--approx-e2e), not set equality.
        "topk_mode": str(rng.choice(["block", "block", "sort"])),
        # Essential-family solver mode: plain weighted LS (reference parity)
        # or the in-graph vectorized RANSAC (+2 polish) — both compiled
        # graphs belong in the fuzz space. Non-essential families pin 0.
        "essential_ransac": (int(rng.choice([0, 128]))
                             if family == "essential" else 0),
        # ~1/3 of draws (every family) also run the STREAMING split
        # (models/streaming.py) on the same inputs and check it against the
        # stacked graph — fuzzes the split across shapes/configs on hardware.
        "streaming": bool(rng.integers(0, 3) == 0),
        "seed": int(rng.integers(0, 2**31)),
    }
    if family == "akaze":
        draw["with_angle"] = True
    if akaze_hires:
        # Registry-default config at the fixed lattice shapes, so distinct
        # compiles are bounded to shapes x {512, 1024} kpts; streaming is
        # always on — the lattice bounds its compile cost too.
        draw.update(max_keypoints=int(rng.choice([512, 1024])),
                    num_pairs=512, sampling_mode="nearest", binarize=True,
                    soft_binarize=False, nms_radius=5, topk_mode="block",
                    streaming=True)
    return draw


def _p_common_diff(out_a, out_b, k: int, hard: bool, label: str,
                   errors: list[str], max_swaps: int = 4) -> bool:
    """Permutation-aware P comparison over the COMMON keypoint subset.

    Two compiled graphs may swap a few rank-boundary keypoints (float
    reduction order); those rows/cols (and only those) are excluded from the
    P comparison — a small set difference must never silently skip
    descriptor/Sinkhorn validation for the draw (round-3 advisor finding;
    the round-5 review caught the streaming path skipping it). ``out_*`` are
    (k1, k2, P[, ...]) output lists; appends to ``errors`` and returns True
    iff both keypoint sets were close enough to compare P at all.
    """
    idx = {}
    for nm, a, b in (("k1", out_a[0], out_b[0]), ("k2", out_a[1], out_b[1])):
        s_a = {tuple(v) for v in a[0].tolist()}
        s_b = {tuple(v) for v in b[0].tolist()}
        if len(s_a ^ s_b) > max_swaps:
            errors.append(f"{label} {nm}: keypoint sets differ "
                          f"({len(s_a ^ s_b)} symmetric difference)")
            continue
        inv_a = {tuple(v): i for i, v in enumerate(a[0].tolist())}
        inv_b = {tuple(v): i for i, v in enumerate(b[0].tolist())}
        shared = sorted(s_a & s_b)
        # Dustbin row/col (index k) always compares.
        idx[nm] = (np.array([inv_a[v] for v in shared] + [k]),
                   np.array([inv_b[v] for v in shared] + [k]))
    if len(idx) < 2:
        return False
    ia1, ib1 = idx["k1"]
    ia2, ib2 = idx["k2"]
    n_swapped = 2 * (k + 1) - len(ia1) - len(ia2)
    diff = np.abs(out_a[2][0][np.ix_(ia1, ia2)]
                  - out_b[2][0][np.ix_(ib1, ib2)])
    # Hard-binarized bits may flip at threshold ties -> rare O(1) P moves.
    tol, max_frac = (0.5, 2e-3) if hard else (2e-2, 1e-3)
    # Swapped keypoints change a few cost rows/cols, and Sinkhorn's
    # normalization spreads that over every entry — allow proportionally
    # more outliers when the sets differ (rows themselves are excluded).
    max_frac += 2e-3 * n_swapped
    frac = (diff > tol).mean()
    if frac > max_frac:
        errors.append(f"{label} P mismatch: max={diff.max():.3f} "
                      f"frac>{tol}={frac:.2e} (allowed {max_frac:.2e}, "
                      f"{n_swapped} rank-boundary swaps excluded)")
    return True


def _run_tpu_draw(draw: dict) -> list[str]:
    """COMPILED-path soak (VERDICT r2 item 5): the full matcher with the
    compiled Mosaic sampler on the real TPU vs the jnp oracle path on the
    host CPU backend, at production-and-above shapes (1080p draws exercise
    the windowed-DMA sampler fallback compiled, not just in interpret mode).
    Comparison is permutation-invariant over keypoints with a small
    rank-boundary tie allowance (TPU float order differs from CPU)."""
    import jax
    import jax.numpy as jnp

    from onnx_image_processing_tpu.core.config import MatcherConfig
    from onnx_image_processing_tpu.models.akaze_family import (
        akaze_sparse_bad_sinkhorn_match)
    from onnx_image_processing_tpu.models.essential_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_essential_match)
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match,
        shi_tomasi_sparse_bad_sinkhorn_match)

    if not any(d.platform == "tpu" for d in jax.devices()):
        return ["--device tpu requires a TPU backend"]

    errors: list[str] = []
    rng = np.random.default_rng(draw["seed"])
    h, w = draw["h"], draw["w"]
    family = draw.get("family", "flagship")
    # Textured base + noise: realistic score landscape, measure-zero ties.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    img1 = np.clip(base + rng.normal(0, 3, (h, w)), 0,
                   255).astype(np.float32)[None, None]
    img2 = np.clip(np.roll(base, 7, 1) + rng.normal(0, 3, (h, w)), 0,
                   255).astype(np.float32)[None, None]

    cfg = MatcherConfig(
        max_keypoints=draw["max_keypoints"], num_pairs=draw["num_pairs"],
        sampling_mode=draw["sampling_mode"], binarize=draw["binarize"],
        soft_binarize=draw["soft_binarize"], nms_radius=draw["nms_radius"],
        topk_mode=draw.get("topk_mode", "block"),
        essential_ransac_hypotheses=draw.get("essential_ransac", 0),
        essential_irls_iters=2 if draw.get("essential_ransac", 0) else 0)
    e_t = e_c = None
    if family == "akaze":
        def run(cfg_):
            return akaze_sparse_bad_sinkhorn_match(
                jnp.asarray(img1), jnp.asarray(img2), cfg_)
    elif family == "essential":
        fx = 0.9 * w
        k_inv = jnp.asarray(np.linalg.inv(np.array(
            [[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])).astype(np.float32))

        def run(cfg_):
            k1, k2, p, e = shi_tomasi_angle_sparse_bad_sinkhorn_essential_match(
                jnp.asarray(img1), jnp.asarray(img2), k_inv, cfg_)
            return k1, k2, p, e
    else:
        match = (shi_tomasi_angle_sparse_bad_sinkhorn_match
                 if draw["with_angle"]
                 else shi_tomasi_sparse_bad_sinkhorn_match)

        def run(cfg_):
            return match(jnp.asarray(img1), jnp.asarray(img2), cfg_)

    out_t = [np.asarray(v) for v in run(cfg.with_(use_pallas=True))]
    with jax.default_device(jax.devices("cpu")[0]):
        out_c = [np.asarray(v) for v in run(cfg.with_(use_pallas=False))]

    if draw.get("streaming"):
        # Streaming-split consistency on hardware: frontend bit-exact vs the
        # stacked graph, P within f32 fusion tolerance (the Sinkhorn tail
        # re-tiles in the smaller graph — see models/streaming.py). All
        # three compiled families, including AKAZE (VERDICT r4 item 6).
        from onnx_image_processing_tpu.models import build_streaming

        if family == "essential":
            s_name = "shi_tomasi_angle_sparse_bad_sinkhorn_essential_matrix"
            extra = (k_inv,)
        elif family == "akaze":
            s_name = "akaze_sparse_bad_sinkhorn"
            extra = ()
        else:
            s_name = ("shi_tomasi_angle_sparse_bad_sinkhorn"
                      if draw["with_angle"]
                      else "shi_tomasi_sparse_bad_sinkhorn")
            extra = ()
        ex_fn, ma_fn = build_streaming(s_name, cfg.with_(use_pallas=True))
        out_s = [np.asarray(v) for v in
                 ma_fn(ex_fn(jnp.asarray(img1)), ex_fn(jnp.asarray(img2)),
                       *extra)]
        bit_equal = all((a == b).all() for a, b in
                        ((out_s[0], out_t[0]), (out_s[1], out_t[1])))
        if bit_equal:
            dp = np.abs(out_s[2] - out_t[2]).max()
            if dp > 1e-4:
                errors.append(
                    f"streaming P diverges from stacked: max {dp:.2e}")
        elif family == "akaze":
            # The AKAZE frontend's FED-ladder/orientation fusions re-tile
            # between the B=1 extract and B=2 stacked graphs (measured
            # ulp-scale score drift, pinned in
            # test_akaze_streaming_split_on_hardware) — rank-boundary swaps
            # are expected here, so validate P over the COMMON keypoint
            # subset instead of demanding bit equality. The split's Sinkhorn
            # tail is never left unchecked (round-5 review finding).
            _p_common_diff(out_s, out_t, draw["max_keypoints"],
                           draw["binarize"] and not draw["soft_binarize"],
                           "streaming-vs-stacked", errors)
        else:
            for nm, a, b in (("k1", out_s[0], out_t[0]),
                             ("k2", out_s[1], out_t[1])):
                if not (a == b).all():
                    errors.append(f"streaming {nm} != stacked {nm} (bit)")
    if family == "essential":
        k1_t, k2_t, p_t, e_t = out_t
        k1_c, k2_c, p_c, e_c = out_c
    else:
        k1_t, k2_t, p_t = out_t
        k1_c, k2_c, p_c = out_c

    k = draw["max_keypoints"]
    # TPU vs CPU float order can swap a few rank-boundary neighbors;
    # _p_common_diff excludes exactly those from the P comparison.
    comparable = _p_common_diff(
        (k1_t, k2_t, p_t), (k1_c, k2_c, p_c), k,
        draw["binarize"] and not draw["soft_binarize"], "TPU/CPU", errors)
    if comparable:
        if e_t is not None:
            # E itself is NOT comparable element-wise on these synthetic
            # rolled pairs: pure-translation planar flow makes the weighted
            # LS problem near-degenerate, and TPU/CPU float order picks
            # different members of the near-null space (observed 0.7
            # normalized diff with IDENTICAL keypoints). What must agree is
            # the epipolar GEOMETRY on the actual matches: each backend's E
            # may not fit the matches materially worse than the other's.
            from onnx_image_processing_tpu.utils.host_postprocess import (
                extract_matches)

            fxv = 0.9 * w
            k_cam = np.array([[fxv, 0, w / 2], [0, fxv, h / 2], [0, 0, 1]])
            k_inv_np = np.linalg.inv(k_cam)

            def sampson_mean(e, mk1, mk2):
                x1 = np.concatenate([mk1[:, [1, 0]], np.ones((len(mk1), 1))],
                                    axis=1) @ k_inv_np.T
                x2 = np.concatenate([mk2[:, [1, 0]], np.ones((len(mk2), 1))],
                                    axis=1) @ k_inv_np.T
                l2 = x1 @ e.T
                l1 = x2 @ e
                num = np.einsum("ij,ij->i", x2, l2) ** 2
                den = (l2[:, 0] ** 2 + l2[:, 1] ** 2
                       + l1[:, 0] ** 2 + l1[:, 1] ** 2)
                return float(np.mean(num / (den + 1e-12)))

            mk1, mk2, _ = extract_matches(p_c, k1_c, k2_c, threshold=0.1,
                                          max_matches=256)
            if len(mk1) >= 8:
                s_t = sampson_mean(e_t / max(np.linalg.norm(e_t), 1e-12),
                                   mk1, mk2)
                s_c = sampson_mean(e_c / max(np.linalg.norm(e_c), 1e-12),
                                   mk1, mk2)
                if s_t > 3.0 * s_c + 1e-8:
                    errors.append(
                        f"TPU essential matrix fits the matches worse than "
                        f"CPU's: sampson {s_t:.2e} vs {s_c:.2e}")
    return errors


def _one_approx_draw(rng: np.random.Generator, idx: int) -> dict:
    h = int(rng.choice([720, 1080])) + int(rng.integers(0, 9))
    w = int(rng.choice([1280, 1920])) + int(rng.integers(0, 9))
    return {
        "idx": idx,
        "h": h,
        "w": w,
        "max_keypoints": int(rng.choice([256, 512, 1024])),
        "num_pairs": 512,
        "with_angle": bool(rng.integers(0, 2)),
        "nms_radius": int(rng.choice([3, 5])),
        "seed": int(rng.integers(0, 2**31)),
    }


def _run_approx_draw(draw: dict) -> list[str]:
    """End-to-end bound on ``topk_mode='approx'`` (VERDICT r3 item 3): the
    FULL matcher with approx selection vs exact block selection on the real
    TPU at hi-res serving shapes. Reports (and pins) what the keypoint-level
    recall pin could not: MATCH-level recall (mutual-NN set overlap) and
    aligned-P divergence over the common keypoints. Thresholds: keypoint
    recall >= 0.90 (the documented mode contract), match recall >= 0.85,
    P max-abs over common rows <= 0.30 (a 1-2% keypoint-set swap legitimately moves individual P entries by ~0.1 through Sinkhorn renormalization; measured 0.05-0.15)."""
    import jax
    import jax.numpy as jnp

    from onnx_image_processing_tpu.core.config import MatcherConfig
    from onnx_image_processing_tpu.models.shi_tomasi_family import (
        shi_tomasi_angle_sparse_bad_sinkhorn_match,
        shi_tomasi_sparse_bad_sinkhorn_match)
    from onnx_image_processing_tpu.utils.host_postprocess import (
        extract_matches)

    if not any(d.platform == "tpu" for d in jax.devices()):
        return ["--device tpu requires a TPU backend"]

    errors: list[str] = []
    rng = np.random.default_rng(draw["seed"])
    h, w = draw["h"], draw["w"]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    img1 = np.clip(base + rng.normal(0, 3, (h, w)), 0,
                   255).astype(np.float32)[None, None]
    img2 = np.clip(np.roll(base, 7, 1) + rng.normal(0, 3, (h, w)), 0,
                   255).astype(np.float32)[None, None]

    # Reference EXPORT defaults (hard binarize, eps 0.05) — the module
    # defaults' soft eps=1.0 dilutes P to ~1/K and yields zero confident
    # matches, which would make the match-recall bound vacuous.
    cfg = MatcherConfig(max_keypoints=draw["max_keypoints"],
                        num_pairs=draw["num_pairs"],
                        nms_radius=draw["nms_radius"],
                        binarize=True, soft_binarize=False, epsilon=0.05)
    match = (shi_tomasi_angle_sparse_bad_sinkhorn_match if draw["with_angle"]
             else shi_tomasi_sparse_bad_sinkhorn_match)

    outs = {}
    for mode in ("block", "approx"):
        outs[mode] = [np.asarray(v) for v in match(
            jnp.asarray(img1), jnp.asarray(img2), cfg.with_(topk_mode=mode))]
    (k1_e, k2_e, p_e), (k1_a, k2_a, p_a) = outs["block"], outs["approx"]

    # Keypoint recall per image (the existing hardware pin, re-measured).
    kpt_recalls = []
    for ke, ka in ((k1_e, k1_a), (k2_e, k2_a)):
        se = {tuple(v) for v in ke[0].tolist() if v[0] >= 0}
        sa = {tuple(v) for v in ka[0].tolist() if v[0] >= 0}
        kpt_recalls.append(len(se & sa) / max(len(se), 1))
    kpt_recall = min(kpt_recalls)

    # Match-level recall: mutual-NN match sets (as coordinate pairs) must
    # survive approx selection.
    mk1_e, mk2_e, _ = extract_matches(p_e, k1_e, k2_e, threshold=0.1,
                                      max_matches=512)
    mk1_a, mk2_a, _ = extract_matches(p_a, k1_a, k2_a, threshold=0.1,
                                      max_matches=512)
    me = {(tuple(a), tuple(b)) for a, b in zip(mk1_e.tolist(), mk2_e.tolist())}
    ma = {(tuple(a), tuple(b)) for a, b in zip(mk1_a.tolist(), mk2_a.tolist())}
    match_recall = len(me & ma) / max(len(me), 1)
    if not me:
        return [f"exact mode produced zero matches (draw degenerate?) "
                f"h={h} w={w}"]

    # Aligned-P divergence over the common keypoint rows/cols.
    idx_maps = []
    for ke, ka in ((k1_e, k1_a), (k2_e, k2_a)):
        inv_e = {tuple(v): i for i, v in enumerate(ke[0].tolist())}
        inv_a = {tuple(v): i for i, v in enumerate(ka[0].tolist())}
        shared = sorted(set(inv_e) & set(inv_a) - {(-1.0, -1.0)})
        idx_maps.append((np.array([inv_e[v] for v in shared], np.int64),
                         np.array([inv_a[v] for v in shared], np.int64)))
    (ie1, ia1), (ie2, ia2) = idx_maps
    p_div = float(np.abs(p_e[0][np.ix_(ie1, ie2)]
                         - p_a[0][np.ix_(ia1, ia2)]).max()) \
        if len(ie1) and len(ie2) else 0.0

    print(f"       approx e2e: kpt_recall={kpt_recall:.3f} "
          f"match_recall={match_recall:.3f} n_matches={len(me)} "
          f"P_div={p_div:.4f}", flush=True)
    if kpt_recall < 0.90:
        errors.append(f"approx keypoint recall {kpt_recall:.3f} < 0.90")
    if match_recall < 0.85:
        errors.append(f"approx match recall {match_recall:.3f} < 0.85")
    if p_div > 0.30:
        errors.append(f"approx aligned-P divergence {p_div:.3f} > 0.30")
    return errors


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reference", action="store_true",
                    help="diff each draw against the reference PyTorch "
                         "pipeline instead of the internal oracle")
    ap.add_argument("--akaze", action="store_true",
                    help="fuzz the AKAZE pipeline's detector hyperparameter "
                         "space against the reference (implies --reference)")
    ap.add_argument("--essential", action="store_true",
                    help="fuzz the essential-matrix estimator (random P "
                         "shapes + intrinsics) against the reference solver")
    ap.add_argument("--ties", action="store_true",
                    help="probe the block-topk tie divergence on adversarial "
                         "tiled/quantized inputs (block vs sort through the "
                         "full matcher, downstream match-set Jaccard)")
    ap.add_argument("--approx-e2e", action="store_true",
                    help="bound topk_mode='approx' END-TO-END on hardware: "
                         "full matcher approx vs exact-block at 720p/1080p, "
                         "match-level recall + aligned-P divergence "
                         "(requires --device tpu)")
    ap.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                    help="tpu: fuzz the COMPILED Mosaic path on real "
                         "hardware at production-and-above shapes (>=720p "
                         "draws engage the windowed-DMA sampler) vs the CPU "
                         "oracle; fewer iters recommended (compile per shape)")
    args = ap.parse_args(argv)

    if args.approx_e2e:
        if args.device != "tpu":
            ap.error("--approx-e2e requires --device tpu (approx_max_k is "
                     "exact on CPU, the bound would be vacuous)")
        from benchmarks.timing import setup_cache

        setup_cache()
        run, one = _run_approx_draw, _one_approx_draw
    elif args.device == "tpu":
        # Keep the real backend (the compiled Mosaic path is the thing under
        # test) and enable the persistent cache so repeat runs are cheap.
        from benchmarks.timing import setup_cache

        setup_cache()
        run, one = _run_tpu_draw, _one_tpu_draw
    elif args.ties:
        run, one = _run_ties_draw, _one_ties_draw
    elif args.akaze:
        run, one = _run_akaze_reference_draw, _one_akaze_draw
    elif args.essential:
        run, one = _run_essential_reference_draw, _one_essential_draw
    elif args.reference:
        run, one = _run_reference_draw, _one_draw
    else:
        run, one = _run_draw, _one_draw
    if args.device != "tpu":
        # CPU modes: pin the host backend before jax is first imported (the
        # draw runners import jax lazily, so this is early enough).
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    rng = np.random.default_rng(args.seed)
    failures = 0
    for i in range(args.iters):
        draw = one(rng, i)
        errs = run(draw)
        status = "ok" if not errs else "FAIL"
        print(f"[{status}] draw {i}: {draw}", flush=True)
        for e in errs:
            print(f"       {e}")
        failures += bool(errs)
    print(f"{args.iters - failures}/{args.iters} draws passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""BAD (Box Average Difference) descriptors — dense and sparse, TPU-native.

Functional re-design of `pytorch_model/descriptor/bad.py` using the learned
box-pair constants shipped in ``data/bad_params_{256,512}.npz`` (extracted from
`pytorch_model/descriptor/bad_params.py:4-1568` — learned weights, treated as data).

TPU-first choices vs the reference:

* **Dense unoriented path**: the reference builds an integral image and does four
  linear-index gathers per pair (`bad.py:62-110`). Because the learned offsets are
  integers and border handling is a clamp, each pair's box mean is a *static
  clamped shift* of one channel of the box-average bank — so the dense map is 2P
  edge-padded slices, zero gathers, fully fusable by XLA.
* **Sparse path**: the reference samples all (R+1) radius channels at every
  (keypoint, pair) position and reduces with a one-hot radius matrix
  (`bad.py:538-557`). Here the radius channel is fused into the gather index
  (:func:`..ops.sampling.sample_bank_fused`), cutting gather volume by (R+1)x.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import pad2d, box_average_bank
from .sampling import sample_nearest, sample_bank_fused
from ..kernels import use_pallas_default

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


@dataclass(frozen=True)
class BADParams:
    """Learned BAD constants as host numpy (compile-time constants under jit).

    Offsets are rectified around the 32x32 learned patch center
    (`pytorch_model/descriptor/bad.py:33-37`: raw params minus 16).
    """

    offset_x1: np.ndarray  # (P,)
    offset_x2: np.ndarray
    offset_y1: np.ndarray
    offset_y2: np.ndarray
    radii: np.ndarray      # (P,) int32
    thresholds: np.ndarray  # (P,)
    num_pairs: int
    max_radius: int


@lru_cache(maxsize=4)
def load_bad_params(num_pairs: int = 256) -> BADParams:
    if num_pairs not in (256, 512):
        raise ValueError(
            f"num_pairs must be 256 or 512 to use learned BAD patterns, got {num_pairs}"
        )
    with np.load(os.path.join(_DATA_DIR, f"bad_params_{num_pairs}.npz")) as z:
        box_params = z["box_params"].astype(np.float32)
        thresholds = z["thresholds"].astype(np.float32)
    radii = box_params[:, 4].astype(np.int32)
    return BADParams(
        offset_x1=box_params[:, 0] - 16.0,
        offset_x2=box_params[:, 1] - 16.0,
        offset_y1=box_params[:, 2] - 16.0,
        offset_y2=box_params[:, 3] - 16.0,
        radii=radii,
        thresholds=thresholds,
        num_pairs=num_pairs,
        max_radius=int(radii.max()),
    )


def _finalize(centered: jax.Array, binarize: bool, soft_binarize: bool,
              temperature: float) -> jax.Array:
    """Binarization options; BAD bit is 1 when response <= threshold
    (`pytorch_model/descriptor/bad.py:214-218`)."""
    if not binarize:
        return centered
    if soft_binarize:
        return jax.nn.sigmoid(-centered * temperature)
    return (centered <= 0).astype(centered.dtype)


def _clamped_shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """x[clamp(i+dy), clamp(j+dx)] for static integer (dy, dx) — an edge-padded slice."""
    h, w = x.shape[-2], x.shape[-1]
    ay, ax = abs(dy), abs(dx)
    xp = pad2d(x, ay, ax, mode="edge") if (ay or ax) else x
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, ay + dy, ay + dy + h, axis=-2),
        ax + dx, ax + dx + w, axis=-1)


def dense_bad(
    image: jax.Array,
    params: BADParams,
    orientation: jax.Array | None = None,
    binarize: bool = False,
    soft_binarize: bool = True,
    temperature: float = 10.0,
    oriented_route: str = "auto",
) -> jax.Array:
    """Dense BAD descriptor map.

    Args:
        image: (B, 1, H, W) grayscale image.
        params: learned constants from :func:`load_bad_params`.
        orientation: optional (B, 1, H, W) per-pixel orientation in radians; when
            given, pair offsets are rotated per pixel (rotation-invariant mode,
            `bad.py:112-187`); when None, the fast static-shift path is used.
        oriented_route: how to evaluate the oriented dense map.
            'gather' is the reference-shaped formulation (H*W*2P fused bilinear
            gathers over the box bank) — measured at **5.5 s/frame** at
            480x640/P=256 on v5e (`benchmarks/dense_oriented_bad.py`): gathers
            are the single slowest pattern on TPU. 'tiled' treats every pixel
            as a keypoint and streams row-chunks of the grid through the fused
            sparse sampler (`kernels/sparse_sampler.py`) under ``lax.map`` —
            ~30x faster on TPU, same replicate-border + clamp semantics, box
            means within the kernel's bilinear tolerance (~2e-3). 'auto' picks
            'tiled' when the default device is TPU-like and 'gather' on CPU
            (where the gather formulation is the exact oracle). No reference
            export uses the dense oriented mode; for keypoint workloads use
            :func:`sparse_bad`.

    Returns:
        (B, P, H, W) descriptor map.
    """
    if oriented_route not in ("auto", "gather", "tiled"):
        raise ValueError(f"oriented_route must be auto|gather|tiled, got {oriented_route}")
    x = image.astype(jnp.float32)[:, 0]
    b, h, w = x.shape
    p = params.num_pairs

    if orientation is not None and (
            oriented_route == "tiled"
            or (oriented_route == "auto" and use_pallas_default())):
        return _dense_oriented_tiled(image, params, orientation, binarize,
                                     soft_binarize, temperature)

    bank = box_average_bank(x, params.max_radius)  # (B, R+1, H, W)

    if orientation is None:
        # Static clamped shifts: offsets are integers (learned grid coords - 16).
        s1 = []
        s2 = []
        for i in range(p):
            r = int(params.radii[i])
            ch = bank[:, r]
            s1.append(_clamped_shift(ch, int(params.offset_y1[i]), int(params.offset_x1[i])))
            s2.append(_clamped_shift(ch, int(params.offset_y2[i]), int(params.offset_x2[i])))
        diff = jnp.stack(s1, axis=1) - jnp.stack(s2, axis=1)  # (B, P, H, W)
    else:
        theta = orientation.astype(jnp.float32)[:, 0]  # (B, H, W)
        cos_t = jnp.cos(theta)[:, None]  # (B, 1, H, W)
        sin_t = jnp.sin(theta)[:, None]
        oy1 = jnp.asarray(params.offset_y1)[None, :, None, None]
        ox1 = jnp.asarray(params.offset_x1)[None, :, None, None]
        oy2 = jnp.asarray(params.offset_y2)[None, :, None, None]
        ox2 = jnp.asarray(params.offset_x2)[None, :, None, None]
        base_y = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
        base_x = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
        # Rotation [cos -sin; sin cos] applied to (ox, oy) (`bad.py:152-156`).
        chan = jnp.asarray(params.radii)[None, :, None, None]
        chan = jnp.broadcast_to(chan, (b, p, h, w))

        def rot_sample(ox, oy):
            py = base_y + (ox * sin_t + oy * cos_t)
            px = base_x + (ox * cos_t - oy * sin_t)
            py = jnp.broadcast_to(py, (b, p, h, w))
            px = jnp.broadcast_to(px, (b, p, h, w))
            return sample_bank_fused(bank, chan, py, px, mode="bilinear")

        diff = rot_sample(ox1, oy1) - rot_sample(ox2, oy2)

    centered = diff - jnp.asarray(params.thresholds)[None, :, None, None]
    return _finalize(centered, binarize, soft_binarize, temperature)


def _dense_oriented_tiled(image, params, orientation, binarize, soft_binarize,
                          temperature):
    """Dense oriented map via the fused sparse sampler: every pixel is a
    keypoint, streamed in row-chunks under ``lax.map`` so only one chunk's
    sample buffers are live. ~30x faster than the gather formulation on TPU
    (0.18 s vs 5.5 s at 480x640/P=256); identical replicate-border + clamp
    semantics."""
    b, _, h, w = image.shape
    rows = max(1, 4096 // w)
    while (rows * w) % 8 != 0:  # Pallas tile divisibility (B*K % 8 == 0)
        rows += 1
    n_chunks = -(-h // rows)
    hp = n_chunks * rows

    ys = jnp.minimum(jnp.arange(hp, dtype=jnp.float32), float(h - 1))
    xs = jnp.arange(w, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)  # (hp, w, 2)
    chunks = grid.reshape(n_chunks, rows * w, 2)

    def one(kp):
        kpb = jnp.broadcast_to(kp[None], (b, kp.shape[0], 2))
        # binarize=False -> raw centered (s1 - s2 - threshold) values in the
        # learned pair order; finalize once over the full map below.
        return sparse_bad(image, kpb, params, orientation=orientation,
                          binarize=False, normalize_descriptors=False,
                          sampling_mode="bilinear")

    descs = jax.lax.map(one, chunks)                   # (n_chunks, B, K, P)
    descs = jnp.moveaxis(descs, 1, 0).reshape(b, hp * w, params.num_pairs)
    centered = descs[:, :h * w]
    out = _finalize(centered, binarize, soft_binarize, temperature)
    return jnp.transpose(out, (0, 2, 1)).reshape(b, params.num_pairs, h, w)


# Patch geometry for the sparse fast path: learned offsets live in [-16, 15]
# (32x32 patch rectified around its center), so any rotation keeps |offset| <=
# 16*sqrt(2) < 23. Patch origins are floored to multiples of 8 (TPU DMA tiling
# proof), adding up to 7 px of slack, so the window is 23+23+7+1(bilinear) = 54
# -> 56 (8-aligned) pixels.
_PATCH_HALF = 23
_PATCH = 56


class SampleLayout(NamedTuple):
    """Static unique-box sample-axis layout for a learned pair table.

    The learned pairs reuse box endpoints: of the 2P (offset, radius) boxes,
    only ~79% are distinct (805/1024 for 512 pairs, 447/512 for 256). The
    sample axis carries each UNIQUE box once, radius-major so each per-radius
    group is one contiguous slice — every downstream cost (MXU N-tiles,
    one-hot builds, epilogue lanes) shrinks by the duplicate fraction. The
    pair descriptor is reassembled by two static index takes (idx1/idx2 map
    original pair order -> unique box), which also absorb the radius-sort
    un-permutation. Shared by ``sparse_bad`` and the ablation harness
    (`benchmarks/ablate_sampler.py`) so measured geometry never diverges
    from production geometry.
    """

    groups: tuple      # ((radius, lo, hi), ...) contiguous on the S axis
    idx1: np.ndarray   # (P,) int32, original pair order -> unique box
    idx2: np.ndarray
    off_y: np.ndarray  # (S,) f32 unique-box offsets, radius-major
    off_x: np.ndarray


_LAYOUT_CACHE: dict = {}


def _build_sample_layout(params: BADParams) -> SampleLayout:
    p = params.num_pairs
    radii_np = np.asarray(params.radii)
    order = np.argsort(radii_np, kind="stable")
    inv_order_np = np.argsort(order)
    radii_sorted = radii_np[order]

    group_bounds = []
    idx1_sorted = np.empty(p, np.int64)
    idx2_sorted = np.empty(p, np.int64)
    off_y_list, off_x_list = [], []
    base = 0
    lo = 0
    for r in sorted(set(int(v) for v in np.unique(radii_sorted))):
        hi = lo + int((radii_sorted == r).sum())
        n_g = hi - lo
        pts = np.stack([
            np.concatenate([params.offset_y1[order][lo:hi],
                            params.offset_y2[order][lo:hi]]),
            np.concatenate([params.offset_x1[order][lo:hi],
                            params.offset_x2[order][lo:hi]]),
        ], axis=1)
        uniq, inv = np.unique(pts, axis=0, return_inverse=True)
        idx1_sorted[lo:hi] = base + inv[:n_g]
        idx2_sorted[lo:hi] = base + inv[n_g:]
        off_y_list.append(uniq[:, 0])
        off_x_list.append(uniq[:, 1])
        group_bounds.append((r, base, base + len(uniq)))
        base += len(uniq)
        lo = hi
    return SampleLayout(
        groups=tuple(group_bounds),
        idx1=idx1_sorted[inv_order_np].astype(np.int32),
        idx2=idx2_sorted[inv_order_np].astype(np.int32),
        off_y=np.concatenate(off_y_list).astype(np.float32),
        off_x=np.concatenate(off_x_list).astype(np.float32))


def sample_layout(params: BADParams) -> SampleLayout:
    """Unique-box sample-axis layout for ``params``.

    Cached by the TABLE CONTENT (a digest of offsets + radii), not just
    ``num_pairs``, so a custom/perturbed BADParams gets its own correct
    geometry rather than the stock table's.
    """
    key = (params.num_pairs,) + tuple(
        np.ascontiguousarray(a).tobytes() for a in
        (params.offset_x1, params.offset_x2, params.offset_y1,
         params.offset_y2, params.radii))
    lay = _LAYOUT_CACHE.get(key)
    if lay is None:
        lay = _LAYOUT_CACHE[key] = _build_sample_layout(params)
    return lay


def sparse_bad(
    image: jax.Array,
    keypoints: jax.Array,
    params: BADParams,
    orientation: jax.Array | None = None,
    binarize: bool = False,
    soft_binarize: bool = True,
    temperature: float = 10.0,
    normalize_descriptors: bool = True,
    sampling_mode: str = "nearest",
    use_pallas: bool | None = None,
    integer_image: bool = False,
    orientation_mm: tuple[jax.Array, jax.Array] | None = None,
    angles: jax.Array | None = None,
) -> jax.Array:
    """BAD descriptors at keypoint locations only.

    TPU-native sampling scheme (replaces the reference's grid_sample gathers,
    `bad.py:538-551`, which are random-access gathers over the full (R+1, H, W)
    bank — the single hottest op on TPU): one image patch per keypoint, per-
    patch box-average banks from tiny valid convolutions, and sampling as
    two-hot matrix products on the MXU. On TPU the whole stage runs as the
    fused Pallas kernel ``kernels/sparse_sampler.py`` (patch DMA + in-VMEM
    one-hots); on CPU an equivalent jnp path is used. Nearest mode uses exact
    one-hot rows; bilinear mode folds the interpolation weights into the rows.

    Args:
        image: (B, 1, H, W) grayscale image.
        keypoints: (B, K, 2) float (y, x); invalid slots are (-1, -1) and produce
            zero descriptors (`bad.py:461,569-570`).
        params: learned constants.
        orientation: optional (B, 1, H, W) orientation map; sampled (nearest) at
            keypoints and used to rotate pair offsets (`bad.py:487-517`).
        orientation_mm: optional (m10, m01) moment-map pair, each (B, 1, H, W),
            as produced by ``kernels.detect_frontend``. Sampled (nearest) at
            keypoints with atan2 applied per keypoint — identical to sampling
            the dense ``arctan2(m01, m10)`` map (nearest sampling commutes
            with elementwise ops) without materializing it. Mutually
            exclusive with ``orientation``.
        angles: optional (B, K) per-keypoint rotation angles (radians),
            already sampled/selected by the caller (e.g. the AKAZE
            tie-normalized scale select at keypoints,
            `models/akaze_family.py`). Mutually exclusive with the map
            forms above.
        sampling_mode: 'nearest' (default, reference default) or 'bilinear'.
        use_pallas: force the Pallas (True) or jnp (False) sampler; None picks
            by the default device platform.
        integer_image: promise that pixel values are integers (uint8-derived
            — true for every image loaded by the CLIs). Routes the nearest-
            mode Pallas sampler through an int8-digit MXU contraction with
            EXACT (zero-rounding) box sums; measured 10-35% slower than the
            default bf16x3 path at every production cell (480p/1080p x
            K 512/1024, `benchmarks/int8_sampler_ab.py`; decision table in
            docs/KERNELS.md), with bit-identical outputs on integer images —
            opt in for exactness-by-construction, not speed. Ignored for
            bilinear mode and on the jnp path.

    Returns:
        (B, K, P) descriptors, optionally L2-normalized.
    """
    from ..kernels.sparse_sampler import reference_box_sample, sparse_box_sample
    if sampling_mode not in ("nearest", "bilinear"):
        raise ValueError(f"sampling_mode must be 'nearest' or 'bilinear', got {sampling_mode}")
    x = image.astype(jnp.float32)[:, 0]
    b, h, w = x.shape
    p = params.num_pairs
    k = keypoints.shape[1]
    r_max = params.max_radius
    ps = _PATCH

    valid = (keypoints[:, :, 0] >= 0).astype(jnp.float32)  # (B, K)
    # jnp.asarray (not float()): H/W may be symbolic dims under a
    # shape-polymorphic jax.export trace.
    ky = jnp.clip(keypoints[:, :, 0], 0.0,
                  jnp.asarray(h - 1, jnp.float32))
    kx = jnp.clip(keypoints[:, :, 1], 0.0,
                  jnp.asarray(w - 1, jnp.float32))

    layout = sample_layout(params)
    idx1 = jnp.asarray(layout.idx1)
    idx2 = jnp.asarray(layout.idx2)
    off_y_j = jnp.asarray(layout.off_y)[None, None, :]  # (1, 1, S_unique)
    off_x_j = jnp.asarray(layout.off_x)[None, None, :]
    group_bounds = layout.groups

    if sum(o is not None for o in (orientation, orientation_mm, angles)) > 1:
        raise ValueError(
            "pass at most one of orientation, orientation_mm, angles")
    if angles is not None:
        theta = angles.astype(jnp.float32)  # (B, K)
    elif orientation_mm is not None:
        m10_s = sample_nearest(orientation_mm[0].astype(jnp.float32)[:, 0], ky, kx)
        m01_s = sample_nearest(orientation_mm[1].astype(jnp.float32)[:, 0], ky, kx)
        theta = jnp.arctan2(m01_s, m10_s)  # (B, K)
    elif orientation is not None:
        theta = sample_nearest(orientation.astype(jnp.float32)[:, 0], ky, kx)  # (B, K)
    else:
        theta = None
    if theta is not None:
        cos_t = jnp.cos(theta)[..., None]  # (B, K, 1)
        sin_t = jnp.sin(theta)[..., None]
        dy = off_x_j * sin_t + off_y_j * cos_t
        dx = off_x_j * cos_t - off_y_j * sin_t
    else:
        dy, dx = off_y_j, off_x_j

    pos_y = jnp.clip(ky[..., None] + dy, 0.0,
                     jnp.asarray(h - 1, jnp.float32))
    pos_x = jnp.clip(kx[..., None] + dx, 0.0,
                     jnp.asarray(w - 1, jnp.float32))

    # One image window per keypoint; origins quantized for TPU DMA tiling
    # (rows to 8, columns to 128 — kernels/sparse_sampler.py geometry) and
    # bounded so the window stays inside the image; the r_max halo of the
    # padded slab supplies the replicate border for every box window.
    # Images smaller than the sample window are edge-extended to ps x ps:
    # sample positions stay clamped to the real [0, h-1] x [0, w-1] region, so
    # box windows only reach the extension through their halo — exactly the
    # reference's replicate-border semantics.
    if h < ps or w < ps:
        he, we = max(h, ps), max(w, ps)
        x = jnp.pad(x, ((0, 0), (0, he - h), (0, we - w)), mode="edge")
        h, w = he, we
    start_y = jnp.clip((jnp.round(ky).astype(jnp.int32) - _PATCH_HALF) // 8 * 8,
                       0, (h - ps) // 8 * 8)
    start_x = jnp.clip(jnp.round(kx).astype(jnp.int32) - _PATCH_HALF, 0, w - ps)
    xp = pad2d(x, r_max, r_max, mode="edge")

    ly = jnp.clip(pos_y - start_y[..., None].astype(jnp.float32), 0.0, ps - 1.0)
    lx = jnp.clip(pos_x - start_x[..., None].astype(jnp.float32), 0.0, ps - 1.0)

    groups = tuple(group_bounds)
    bilinear = sampling_mode == "bilinear"
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas and (b * k) % 8 == 0:
        # Largest keypoint tile that divides K (grid-step overhead amortizes
        # with tile: 0.279 -> 0.222 ms @K=512 going 8 -> 64 on v5e; dividing
        # K keeps the per-image VMEM-residency grouping intact).
        opts = (64, 32, 16, 8)
        tile = next((t for t in opts if k % t == 0),
                    next(t for t in opts if (b * k) % t == 0))
        samples = sparse_box_sample(xp, start_y, start_x, ly, lx, ps, r_max,
                                    groups, bilinear=bilinear, tile=tile,
                                    integer_exact=integer_image)
    else:
        samples = reference_box_sample(xp, start_y, start_x, ly, lx, ps, r_max,
                                       groups, bilinear=bilinear)

    # Pair descriptors from the unique-box samples: two static-index takes in
    # the original learned pair order (idx1/idx2 fold in the un-permutation).
    s1 = jnp.take(samples, idx1, axis=-1)  # (B, K, P)
    s2 = jnp.take(samples, idx2, axis=-1)
    centered = (s1 - s2) - jnp.asarray(params.thresholds)[None, None, :]
    desc = _finalize(centered, binarize, soft_binarize, temperature)
    desc = desc * valid[..., None]

    if normalize_descriptors:
        # torch F.normalize: v / max(||v||_2, 1e-12)
        norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
        desc = desc / jnp.maximum(norm, 1e-12)
    return desc


def extract_descriptors_at_keypoints(descriptor_map: jax.Array,
                                     keypoints: jax.Array) -> jax.Array:
    """Gather dense descriptors at integer keypoints.

    Args:
        descriptor_map: (B, D, H, W).
        keypoints: (B, K, 2) integer-valued (y, x).

    Returns:
        (B, K, D). Parity: `pytorch_model/descriptor/bad.py:221-274`.
    """
    b, d, h, w = descriptor_map.shape
    yi = keypoints[:, :, 0].astype(jnp.int32)
    xi = keypoints[:, :, 1].astype(jnp.int32)
    idx = (yi * w + xi)[:, None, :]  # (B, 1, K)
    flat = descriptor_map.reshape(b, d, h * w)
    out = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (b, d, idx.shape[-1])), axis=2)
    return jnp.transpose(out, (0, 2, 1))


def extract_descriptors_at_keypoints_subpixel(descriptor_map: jax.Array,
                                              keypoints: jax.Array) -> jax.Array:
    """Bilinear sub-pixel descriptor extraction.

    Parity: `pytorch_model/descriptor/bad.py:277-333` (grid_sample bilinear,
    border padding, align_corners=True). Note the reference's 1e-8-slackened
    normalization rescales coordinates by (dim-1)/(dim-1+1e-8); the effect is
    O(1e-8) and ignored here.
    """
    from .sampling import sample_bilinear

    b, d, h, w = descriptor_map.shape
    k = keypoints.shape[1]
    y = jnp.broadcast_to(keypoints[:, None, :, 0], (b, d, k)).reshape(b * d, k)
    x = jnp.broadcast_to(keypoints[:, None, :, 1], (b, d, k)).reshape(b * d, k)
    maps = descriptor_map.reshape(b * d, h, w)
    vals = sample_bilinear(maps, y, x).reshape(b, d, k)
    return jnp.transpose(vals, (0, 2, 1))

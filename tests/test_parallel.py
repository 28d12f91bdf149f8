"""Batch data-parallel execution tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_image_processing_tpu.core import MatcherConfig
from onnx_image_processing_tpu.models.shi_tomasi_family import (
    shi_tomasi_angle_sparse_bad_sinkhorn_match,
)
from onnx_image_processing_tpu.parallel import (
    batch_sharding,
    device_put_batch,
    make_mesh,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices("cpu"))


def test_sharded_matcher_equals_unsharded(mesh):
    """The batch-sharded matcher must produce the same outputs as single-device
    execution (embarrassingly parallel over pairs — no cross-pair coupling)."""
    cfg = MatcherConfig(max_keypoints=32, num_pairs=256, block_size=5,
                        use_pallas=False)

    def step(i1, i2):
        return shi_tomasi_angle_sparse_bad_sinkhorn_match(i1, i2, cfg)

    rng = np.random.default_rng(0)
    b = 8
    i1 = rng.uniform(0, 255, (b, 1, 72, 96)).astype(np.float32)
    i2 = rng.uniform(0, 255, (b, 1, 72, 96)).astype(np.float32)

    sharded = shard_batch(step, mesh)
    out_sharded = sharded(jnp.asarray(i1), jnp.asarray(i2))
    out_local = jax.jit(step)(jnp.asarray(i1), jnp.asarray(i2))

    for a, b_ in zip(out_sharded, out_local):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

    # Outputs carry the batch sharding.
    assert out_sharded[0].sharding.is_equivalent_to(
        batch_sharding(mesh), out_sharded[0].ndim)


def test_shard_batch_rejects_indivisible(mesh):
    f = shard_batch(lambda x: x * 2, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        f(jnp.zeros((3, 4)))


def test_device_put_batch_places_shards(mesh):
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    placed = device_put_batch(x, mesh)
    assert len(placed.sharding.device_set) == mesh.devices.size
    np.testing.assert_array_equal(np.asarray(placed), x)


def test_dryrun_multichip_subprocess():
    """Run the driver's multi-chip dry run exactly as the driver does: a fresh
    subprocess with the TPU plugin registered (no JAX_PLATFORMS=cpu) and a
    forced 8-device virtual CPU host platform. The dry run must be hermetic —
    it must pass even if the TPU tunnel is unhealthy, because every array is
    staged directly onto the CPU mesh (round-1 regression: input staging via
    the default device died on a libtpu version skew)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let any TPU plugin register, as the driver does
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; "
         "dryrun_multichip(8); print('DRYRUN_OK')"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN_OK" in proc.stdout


def test_stream_map_matches_sequential():
    """Pipelined streaming must produce exactly the sequential results, in
    order, at every depth."""
    from onnx_image_processing_tpu.parallel import stream_map

    f = jax.jit(lambda x: (x * 2.0, x.sum()))
    xs = [jnp.full((4, 4), float(i)) for i in range(7)]
    seq = [jax.device_get(f(x)) for x in xs]
    for depth in (1, 2, 4, 16):
        out = list(stream_map(f, xs, depth=depth))
        assert len(out) == len(seq)
        for (a1, b1), (a2, b2) in zip(out, seq):
            np.testing.assert_array_equal(a1, a2)
            np.testing.assert_array_equal(b1, b2)


def test_stream_map_tuple_inputs_and_laziness():
    from onnx_image_processing_tpu.parallel import stream_map

    f = jax.jit(lambda a, b: a + b)
    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield (jnp.float32(i), jnp.float32(10 * i))

    it = stream_map(f, gen(), depth=2)
    first = next(it)
    # depth=2 window: at most `depth` steps are ever in flight, so the first
    # yield drains step 0 right before dispatching step 2 — the stream is
    # lazy and the documented memory bound holds exactly.
    assert produced == [0, 1, 2]
    assert float(first) == 0.0
    rest = list(it)
    assert [float(r) for r in rest] == [11.0, 22.0, 33.0, 44.0]


def test_vmap_pairs_matches_stacked():
    """The multi-pair throughput composition (vmap of the single-pair
    pipeline; BASELINE.md batch-scaling) must reproduce the stacked-batch
    call exactly: same shapes, same keypoints, matching P."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.parallel import vmap_pairs

    rng = np.random.default_rng(7)
    h, w, b = 96, 128, 3
    img1 = jnp.asarray(rng.uniform(0, 255, (b, 1, h, w)).astype(np.float32))
    img2 = jnp.asarray(jnp.roll(img1, 5, axis=3))

    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn",
                      max_keypoints=32, num_pairs=256, use_pallas=False)
    k1_s, k2_s, p_s = (np.asarray(o) for o in fn(img1, img2))
    k1_v, k2_v, p_v = (np.asarray(o) for o in vmap_pairs(fn)(img1, img2))

    assert k1_v.shape == k1_s.shape and p_v.shape == p_s.shape
    np.testing.assert_array_equal(k1_v, k1_s)
    np.testing.assert_array_equal(k2_v, k2_s)
    np.testing.assert_allclose(p_v, p_s, atol=1e-5)

    # The registry-level throughput entry point is the same composition.
    fb = models.build_batched("shi_tomasi_angle_sparse_bad_sinkhorn",
                              max_keypoints=32, num_pairs=256,
                              use_pallas=False)
    k1_b, k2_b, p_b = (np.asarray(o) for o in fb(img1, img2))
    np.testing.assert_array_equal(k1_b, k1_v)
    np.testing.assert_allclose(p_b, p_v, atol=1e-6)


def test_chunk_batch_matches_unchunked():
    """chunk_batch (the batched-streaming analogue of vmap_pairs' chunking;
    round-5 deep-batch drift fix, BASELINE.md) must reproduce the unchunked
    batch call exactly — including a remainder sub-batch (B=5, chunk=2) and
    the pass-through case (B <= chunk)."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.parallel import chunk_batch

    rng = np.random.default_rng(9)
    h, w, b = 96, 128, 5
    imgs = jnp.asarray(rng.uniform(0, 255, (b, 1, h, w)).astype(np.float32))
    prev = jnp.asarray(np.roll(np.asarray(imgs), 5, axis=3))

    extract, match = models.build_streaming(
        "shi_tomasi_angle_sparse_bad_sinkhorn",
        max_keypoints=32, num_pairs=256, use_pallas=False)

    f_prev, f_new = extract(prev), extract(imgs)
    ref = match(f_prev, f_new)

    ex_c = chunk_batch(extract, chunk=2)
    ma_c = chunk_batch(match, chunk=2)
    fc_prev, fc_new = ex_c(prev), ex_c(imgs)
    for a, bb in zip(jax.tree_util.tree_leaves(fc_prev),
                     jax.tree_util.tree_leaves(f_prev)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    out = ma_c(fc_prev, fc_new)
    for a, bb in zip(jax.tree_util.tree_leaves(out),
                     jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    # B <= chunk passes straight through.
    out_small = chunk_batch(match, chunk=8)(f_prev, f_new)
    for a, bb in zip(jax.tree_util.tree_leaves(out_small),
                     jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_shard_map_compiles_with_zero_collectives(mesh):
    """The default shard_batch composition must contain NO collectives at the
    HLO level — the workload is embarrassingly parallel, so any collective is
    a partitioner artifact that costs cross-device synchronization (the 'jit'
    method's pair-stack reshard produced 27 collective-permutes + 30
    all-to-alls and an XLA-CPU rendezvous abort under load; round 3)."""
    cfg = MatcherConfig(max_keypoints=16, num_pairs=256, use_pallas=False)

    def step(i1, i2):
        return shi_tomasi_angle_sparse_bad_sinkhorn_match(i1, i2, cfg)

    rng = np.random.default_rng(1)
    i1 = device_put_batch(
        rng.uniform(0, 255, (8, 1, 48, 64)).astype(np.float32), mesh)
    i2 = device_put_batch(
        rng.uniform(0, 255, (8, 1, 48, 64)).astype(np.float32), mesh)

    spec = jax.sharding.PartitionSpec("batch")
    jitted = jax.jit(jax.shard_map(step, mesh=mesh, in_specs=spec,
                                   out_specs=spec))
    hlo = jitted.lower(i1, i2).compile().as_text()
    for coll in ("collective-permute", "all-gather", "all-to-all",
                 "all-reduce"):
        assert coll not in hlo, f"{coll} found in shard_map HLO"


def test_stream_map_chunked_matches_sequential():
    """Chunked serving must yield exactly the per-pair sequential results, in
    order, including a padded final short chunk."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.parallel import stream_map_chunked

    rng = np.random.default_rng(3)
    h, w, n = 72, 96, 7  # 7 pairs, chunk 3 -> final chunk is short (1)
    pairs = [(rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32),
              rng.uniform(0, 255, (1, 1, h, w)).astype(np.float32))
             for _ in range(n)]

    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn",
                      max_keypoints=16, num_pairs=256, use_pallas=False)
    fb = models.build_batched("shi_tomasi_angle_sparse_bad_sinkhorn",
                              max_keypoints=16, num_pairs=256,
                              use_pallas=False)

    seq = [jax.device_get(fn(jnp.asarray(a), jnp.asarray(b)))
           for a, b in pairs]
    out = list(stream_map_chunked(fb, pairs, chunk=3, depth=2))
    assert len(out) == n
    for got, want in zip(out, seq):
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w_)[0],
                                       atol=1e-5)


def test_vmap_pairs_chunked_matches_monolithic():
    """chunk=N (the deep-batch composition: lax.map over chunk-sized vmapped
    sub-batches) must reproduce the monolithic vmap exactly — same keypoints,
    same P — including the chunk-boundary reshape plumbing."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.parallel import vmap_pairs

    rng = np.random.default_rng(17)
    h, w, b = 96, 128, 4
    img1 = jnp.asarray(rng.uniform(0, 255, (b, 1, h, w)).astype(np.float32))
    img2 = jnp.asarray(jnp.roll(img1, 5, axis=3))

    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn",
                      max_keypoints=32, num_pairs=256, use_pallas=False)
    mono = vmap_pairs(fn)(img1, img2)
    chunked = vmap_pairs(fn, chunk=2)(img1, img2)
    for m, c in zip(mono, chunked):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(c))

    # B <= chunk short-circuits to the monolithic path.
    small = vmap_pairs(fn, chunk=8)(img1, img2)
    for m, c in zip(mono, small):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(c))

    # Indivisible batches run the remainder as a final smaller sub-batch
    # (build_batched defaults to chunk=6, so e.g. B=8 must keep working).
    remainder = vmap_pairs(fn, chunk=3)(img1, img2)
    for m, c in zip(mono, remainder):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(c))


def test_composed_fleet_unit_shard_map_zero_collectives(mesh):
    """The composed deployment unit — vmap_pairs (multi-pair per device)
    UNDER shard_batch — must (a) equal the unsharded call exactly and (b)
    contain zero collectives in its HLO (round-3 pinned this for the
    one-pair-per-device graph only; the '~2,000 pairs/s x chips' headline
    composes BOTH)."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.parallel import vmap_pairs

    per_dev = 2
    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn",
                      max_keypoints=16, num_pairs=256, use_pallas=False)
    batched = vmap_pairs(fn, chunk=per_dev)

    rng = np.random.default_rng(23)
    bt = mesh.devices.size * per_dev
    i1 = rng.uniform(0, 255, (bt, 1, 48, 64)).astype(np.float32)
    i2 = rng.uniform(0, 255, (bt, 1, 48, 64)).astype(np.float32)

    from onnx_image_processing_tpu.parallel import device_put_batch
    composed = shard_batch(batched, mesh)
    i1_s = device_put_batch(i1, mesh)
    i2_s = device_put_batch(i2, mesh)
    out_sharded = composed(i1_s, i2_s)
    out_local = batched(jnp.asarray(i1), jnp.asarray(i2))
    for a, b_ in zip(out_sharded, out_local):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

    spec = jax.sharding.PartitionSpec("batch")
    jitted = jax.jit(jax.shard_map(batched, mesh=mesh, in_specs=spec,
                                   out_specs=spec))
    hlo = jitted.lower(i1_s, i2_s).compile().as_text()
    for coll in ("collective-permute", "all-gather", "all-to-all",
                 "all-reduce"):
        assert coll not in hlo, f"{coll} found in composed shard_map HLO"


def test_streaming_shards_over_mesh(mesh):
    """The streaming serving unit over the mesh (dryrun config 4): extract +
    feature-cached match, one stream per device. The feature pytree must
    shard through shard_batch, and the sharded composition must equal the
    unsharded one (zero collectives by construction — same property as the
    two-image composition)."""
    from onnx_image_processing_tpu import models
    from onnx_image_processing_tpu.parallel import device_put_batch

    ex_fn, ma_fn = models.build_streaming(
        "shi_tomasi_angle_sparse_bad_sinkhorn",
        max_keypoints=16, num_pairs=256, use_pallas=False)
    b = mesh.devices.size
    rng = np.random.default_rng(4)
    f0 = rng.uniform(0, 255, (b, 1, 48, 64)).astype(np.float32)
    f1 = rng.uniform(0, 255, (b, 1, 48, 64)).astype(np.float32)

    sharded_ex = shard_batch(ex_fn, mesh)
    sharded_ma = shard_batch(lambda a, c: ma_fn(a, c), mesh)
    feats0 = sharded_ex(device_put_batch(f0, mesh))
    out_sharded = sharded_ma(feats0, sharded_ex(device_put_batch(f1, mesh)))

    out_local = ma_fn(ex_fn(jnp.asarray(f0)), ex_fn(jnp.asarray(f1)))
    for a, b_ in zip(out_sharded, out_local):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

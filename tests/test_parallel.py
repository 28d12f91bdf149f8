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

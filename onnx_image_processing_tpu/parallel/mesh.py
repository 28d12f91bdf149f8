"""Device-mesh utilities: batch data parallelism over image pairs.

The reference has zero distributed machinery (SURVEY.md §2.13) — its only
parallel axis is the unused batch dimension B. Here that axis becomes a real
scaling axis: a 1-D ``jax.sharding.Mesh`` over all chips, images sharded over
the ``batch`` axis, and every pipeline compiled with ``jax.jit`` +
``NamedSharding`` so XLA keeps each image pair resident on one chip (no
cross-chip collectives are needed for the embarrassingly-parallel
frame-matching workload; collectives appear only if a user reduces across the
batch). TP/PP/SP/EP have no analogue in this domain — there are no weights to
shard and the per-image state (≤480×640 maps, ≤1024² Sinkhorn matrix) fits one
chip's VMEM/HBM trivially (SURVEY.md §2.13); the scaling story is throughput.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis_name: str = "batch") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "batch") -> NamedSharding:
    """Sharding that splits axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(fn: Callable, mesh: Mesh, axis_name: str = "batch",
                n_in: int | None = None) -> Callable:
    """Compile ``fn`` with every input/output sharded over the batch axis.

    ``fn`` must treat axis 0 of every argument as the batch. Batch size must be
    a multiple of the mesh size. Returns a jitted callable; inputs placed
    anywhere are resharded on entry.
    """
    sharding = batch_sharding(mesh, axis_name)

    jitted = jax.jit(fn, in_shardings=sharding, out_shardings=sharding)

    def wrapped(*args):
        for a in args:
            if a.shape[0] % mesh.devices.size != 0:
                raise ValueError(
                    f"batch {a.shape[0]} not divisible by mesh size "
                    f"{mesh.devices.size}")
        return jitted(*args)

    return wrapped


def device_put_batch(x, mesh: Mesh, axis_name: str = "batch"):
    """Place a host array sharded over the batch axis."""
    return jax.device_put(x, batch_sharding(mesh, axis_name))

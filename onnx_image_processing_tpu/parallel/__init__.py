"""Parallelism layer: mesh construction and batch data-parallel execution
(SURVEY.md §2.13 — the reference has none; this is the TPU-native scaling
story for the embarrassingly-parallel frame-matching workload)."""

from .mesh import make_mesh, batch_sharding, shard_batch, device_put_batch
from .throughput import chunk_batch, stream_map, stream_map_chunked, vmap_pairs

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "device_put_batch",
           "chunk_batch", "stream_map", "stream_map_chunked", "vmap_pairs"]

"""Parallel/distributed layer: block data-parallelism over a device mesh
and multi-host orchestration (net-new vs. the single-threaded reference;
SURVEY.md §2.11)."""

from .dp import block_mesh, encode_blocks_sharded

__all__ = ["block_mesh", "encode_blocks_sharded"]

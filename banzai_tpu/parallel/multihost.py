"""Multi-host streaming encode over a TPU pod slice.

The reference is single-process (SURVEY.md §2.11); this is the net-new
distribution layer.  Design (SURVEY.md §7 table, "distribution" row):

* ``jax.distributed.initialize()`` forms the job; every process owns a
  contiguous *span* of the input (process p takes blocks whose index is
  congruent to nothing — spans, not striding, so RLE1's sequential block
  splitting stays host-local).
* Within each host, blocks are encoded with the block-DP shard_map pipeline
  over the host's local devices (ICI only; no cross-host traffic on the hot
  path).
* The compressed (words, bit-length, crc, ptr) tuples are gathered to
  process 0 over DCN via ``jax.experimental.multihost_utils`` gather; the
  stream is stitched and the stream CRC folded *in input order* there — the
  rotate-left-XOR combine (lib/lib.rs:108) is the only order-dependent
  state.

Span boundaries and RLE1: blocks are data-dependent, so spans are formed by
bytes, and each host runs RLE1 from its span start.  To keep block splits
identical to the single-host encode, span starts must land on RLE1 block
boundaries; process 0 computes those boundaries cheaply (run decomposition
is O(n) vectorized) and scatters ``(offset, length)`` spans.  For the
common case — one host — this degenerates to pipeline.compress.

This module is structured for N>=2 processes but validated in-tree on a
single process (the environment exposes one host); multi-process runs use
the same code path via ``initialize()``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import block_capacity
from ..crc32 import combine_stream_crc
from ..rle1 import split_blocks


@dataclass
class Span:
    offset: int
    length: int
    first_block: int     # global block index of the span's first block


def plan_spans(data: bytes, level: int, n_hosts: int) -> list[Span]:
    """Split ``data`` into per-host spans on exact RLE1 block boundaries.

    Runs the vectorized splitter once (process 0 only); the per-block cost
    is tiny compared to encode, and it guarantees the multi-host stream is
    byte-identical to the single-host one.
    """
    blocks = split_blocks(data, level)
    total = len(blocks)
    per = (total + n_hosts - 1) // n_hosts
    spans = []
    off = 0
    bi = 0
    for h in range(n_hosts):
        take = blocks[bi : bi + per]
        length = sum(b.consumed for b in take)
        spans.append(Span(off, length, bi))
        off += length
        bi += len(take)
    return spans


def encode_multihost(data: bytes, level: int = 9) -> bytes:
    """Encode across all processes; returns the stream on process 0
    (other processes return b"")."""
    import jax

    nproc = jax.process_count()
    if nproc == 1:
        from ..pipeline import compress

        return compress(data, level)

    from jax.experimental import multihost_utils

    pid = jax.process_index()
    spans = plan_spans(data, level, nproc)
    span = spans[pid]
    my = data[span.offset : span.offset + span.length]

    from ..pipeline import compress_blocks_payloads

    payloads = compress_blocks_payloads(my, level)

    # Gather variable-length payloads: pad to the max and carry lengths.
    flat = b"".join(p.to_bytes() for p in payloads)
    lengths = np.array([len(flat)], np.int64)
    all_lens = multihost_utils.process_allgather(lengths)
    maxlen = int(all_lens.max())
    buf = np.zeros(maxlen, np.uint8)
    buf[: len(flat)] = np.frombuffer(flat, np.uint8)
    gathered = multihost_utils.process_allgather(buf)

    if pid != 0:
        return b""
    from ..bitio import BitWriter
    from ..container import write_stream_footer, write_stream_header
    from .serial import BlockPayload

    bw = BitWriter()
    write_stream_header(bw, level)
    stream_crc = 0
    for h in range(nproc):
        blob = gathered[h][: int(all_lens[h])].tobytes()
        for p in BlockPayload.iter_from_bytes(blob):
            stream_crc = combine_stream_crc(stream_crc, p.crc)
            p.write(bw)
    write_stream_footer(bw, stream_crc)
    return bw.close()

"""Multi-host streaming encode over a TPU pod slice.

The reference is single-process (SURVEY.md §2.11); this is the net-new
distribution layer.  Design (SURVEY.md §7 table, "distribution" row):

* ``jax.distributed.initialize()`` forms the job; every process owns a
  contiguous *span* of the input (spans, not striding, so RLE1's
  sequential block splitting stays host-local).
* **Process 0 plans, everyone else just encodes.**  Block boundaries are
  data-dependent (an RLE1 block ends where its output hits capacity, which
  depends on every preceding byte), so process 0 streams the whole input
  once through the vectorized splitter (~300 MB/s host-side), derives the
  per-host ``(offset, length)`` spans on exact block boundaries, and
  broadcasts the tiny span table.  No other process ever sees bytes
  outside its own span.
* Input is addressed by *path* on a filesystem every host can read: each
  process opens the file and reads only ``[offset, offset+length)`` — the
  per-host memory footprint is the span, not the input.  (A bytes-based
  entry point remains for single-process use and tests.)
* Within each host, blocks are encoded with the block-DP pipeline over the
  host's local devices (ICI only; no cross-host traffic on the hot path).
* The compressed ``(words, bit-length, crc, ptr)`` payloads are gathered
  over DCN in fixed-size chunks (bounded buffering, not one
  whole-stream-sized allgather) and stitched on process 0 *in input
  order*; the rotate-left-XOR stream-CRC combine (lib/lib.rs:108) is the
  only order-dependent state.

Validated in-tree by a real 2-process ``jax.distributed`` CPU run
(tests/test_multihost.py) producing a byte-identical stream to the
single-host encode.
"""

from __future__ import annotations

import mmap
from dataclasses import dataclass

import numpy as np

from ..crc32 import combine_stream_crc
from ..rle1 import iter_blocks

_GATHER_CHUNK = 8 << 20  # bytes per DCN gather round


@dataclass
class Span:
    offset: int
    length: int
    first_block: int     # global block index of the span's first block


def plan_spans(data, level: int, n_hosts: int) -> list[Span]:
    """Split ``data`` into per-host spans on exact RLE1 block boundaries.

    Called on process 0 only; the result is broadcast (see
    ``_broadcast_spans``).  Guarantees the multi-host stream is
    byte-identical to the single-host one.

    Streams the input through the lazy splitter, retaining only one
    ``consumed`` int per block — planning a 100 GB input costs one block
    of working memory plus ~1 MB of boundary ints, never the block
    payloads themselves.
    """
    consumed = [b.consumed for b in iter_blocks(data, level)]
    total = len(consumed)
    per = (total + n_hosts - 1) // n_hosts
    spans = []
    off = 0
    bi = 0
    for h in range(n_hosts):
        length = sum(consumed[bi : bi + per])
        spans.append(Span(off, length, bi))
        off += length
        bi += min(per, max(0, total - bi))
    return spans


def _broadcast_spans(spans: list[Span] | None, nproc: int) -> list[Span]:
    """Ship the span table from process 0 to everyone (tiny, DCN)."""
    from jax.experimental import multihost_utils

    if spans is not None:
        tbl = np.array(
            [[s.offset, s.length, s.first_block] for s in spans], np.int64
        )
    else:
        tbl = np.zeros((nproc, 3), np.int64)
    tbl = np.asarray(multihost_utils.broadcast_one_to_all(tbl))
    return [Span(int(r[0]), int(r[1]), int(r[2])) for r in tbl]


def _gather_chunked(flat: bytes, nproc: int) -> list[bytes] | None:
    """Gather per-host byte blobs to process 0 in bounded chunks.

    Every host contributes ``flat``; process 0 returns the list of blobs in
    process order, others return None.  Peak extra memory per round is
    nproc * _GATHER_CHUNK, not nproc * max blob size.
    """
    import jax
    from jax.experimental import multihost_utils

    pid = jax.process_index()
    lengths = multihost_utils.process_allgather(
        np.array([len(flat)], np.int64)
    ).reshape(-1)
    maxlen = int(lengths.max())
    nchunks = max(1, -(-maxlen // _GATHER_CHUNK))
    parts: list[list[bytes]] = [[] for _ in range(nproc)]
    src = np.frombuffer(flat, np.uint8)
    for c in range(nchunks):
        lo = c * _GATHER_CHUNK
        hi = min(lo + _GATHER_CHUNK, maxlen)
        buf = np.zeros(hi - lo, np.uint8)
        take = src[lo : min(hi, len(src))]
        buf[: len(take)] = take
        gathered = np.asarray(multihost_utils.process_allgather(buf))
        if pid == 0:
            for h in range(nproc):
                parts[h].append(gathered[h].tobytes())
    if pid != 0:
        return None
    return [
        b"".join(parts[h])[: int(lengths[h])] for h in range(nproc)
    ]


def _stitch(blobs: list[bytes], level: int) -> bytes:
    from ..bitio import BitWriter
    from ..container import write_stream_footer, write_stream_header
    from .serial import BlockPayload

    bw = BitWriter()
    write_stream_header(bw, level)
    stream_crc = 0
    for blob in blobs:
        for p in BlockPayload.iter_from_bytes(blob):
            stream_crc = combine_stream_crc(stream_crc, p.crc)
            p.write(bw)
    write_stream_footer(bw, stream_crc)
    return bw.close()


def encode_multihost_path(path: str, level: int = 9) -> bytes:
    """Encode a file across all processes; returns the stream on process 0
    (other processes return b"").

    Process 0 mmaps the file to plan spans; every process then reads only
    its own span bytes.  ``path`` must be readable on every host.
    """
    import jax

    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc == 1:
        from ..pipeline import compress

        with open(path, "rb") as f:
            return compress(f.read(), level)

    spans = None
    if pid == 0:
        with open(path, "rb") as f:
            mm = None
            try:
                mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
                data = mm
            except ValueError:          # empty file
                data = b""
            try:
                # Streamed boundary scan over the mmap — no input-sized
                # copy; process 0's footprint is one block + the span ints.
                spans = plan_spans(data, level, nproc)
            finally:
                if mm is not None:
                    try:
                        mm.close()
                    except BufferError:
                        pass  # a stray view still holds the buffer; GC's

    spans = _broadcast_spans(spans, nproc)
    span = spans[pid]
    with open(path, "rb") as f:
        f.seek(span.offset)
        my = f.read(span.length)
    return _encode_spans(my, spans, level, nproc, pid)


def encode_multihost(data: bytes, level: int = 9) -> bytes:
    """Encode in-memory bytes across all processes (stream on process 0).

    Only process 0's ``data`` is authoritative: it plans the spans and
    broadcasts the table; every process encodes ``data[offset:offset+len)``
    of its *own* copy, so all processes must be handed identical bytes.
    For inputs too large to replicate, use :func:`encode_multihost_path`.
    """
    import jax

    nproc = jax.process_count()
    if nproc == 1:
        from ..pipeline import compress

        return compress(data, level)

    pid = jax.process_index()
    spans = plan_spans(data, level, nproc) if pid == 0 else None
    spans = _broadcast_spans(spans, nproc)
    span = spans[pid]
    my = data[span.offset : span.offset + span.length]
    return _encode_spans(my, spans, level, nproc, pid)


def _encode_spans(
    my: bytes, spans: list[Span], level: int, nproc: int, pid: int
) -> bytes:
    from ..pipeline import compress_blocks_payloads

    payloads = compress_blocks_payloads(my, level)
    flat = b"".join(p.to_bytes() for p in payloads)
    blobs = _gather_chunked(flat, nproc)
    if blobs is None:
        return b""
    return _stitch(blobs, level)

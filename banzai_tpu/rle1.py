"""RLE1: bzip2's mandatory first-pass run-length encoding + block splitting.

Reference behavior: lib/rle.rs:102-253 — a byte-serial state machine that
walks the input two bytes per iteration, collapses maximal runs of >=4 equal
bytes into ``4 literals + count`` (count <= 251, so a long run is consumed in
chunks of <=255 input bytes), and stops when the block's output bound
(``100_000*level - 1``) is exhausted, with intricate partial-emission rules
at the boundary.

TPU-first design: away from a block boundary the machine is *provably*
equivalent to a pure function of the maximal-run decomposition (each maximal
run of length L is consumed in chunks of min(255, remaining); a chunk c >= 4
emits 5 bytes, else c literal bytes).  We therefore:

1. vectorize the run decomposition and chunk emission with numpy (O(n),
   no Python loop over bytes), and
2. replay the exact state machine only inside a ~600-byte window around each
   block boundary, starting from a provable "loop-top" checkpoint (the end
   of a run emission, where the machine state is fully known).

This reproduces the reference's block splits byte-exactly (differentially
tested against a full Python replay of the machine) at vectorized speed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .constants import block_capacity
from .crc32 import block_crc

# Replay window: the machine can only diverge from the unbounded emission
# when the remaining bound is smaller than one iteration's max emission, but
# we keep a wide safety margin; replay cost is negligible per 100KB+ block.
_REPLAY_MARGIN = 600


# ---------------------------------------------------------------------------
# Exact state machine (oracle + boundary replay)
# ---------------------------------------------------------------------------

def machine_replay(
    data, i: int, floor: int, bound: int
) -> tuple[bytearray, int]:
    """Exact replay of the reference RLE1 loop (lib/rle.rs:133-240) from a
    loop-top state ``(i, floor)`` with ``bound`` output bytes remaining.

    ``data`` is the full input (bytes-like supporting int indexing); EOF is
    ``len(data)``.  Returns (emitted bytes, final input position).
    """
    out = bytearray()
    n = len(data)
    if i >= n:
        return out, i
    b = data[i]
    while True:
        if bound == 0:
            break
        if bound == 1:
            out.append(b)
            i += 1
            break
        out.append(b)
        bound -= 1

        d = n - i
        if d == 1:
            i += 1
            break
        if d == 2:
            out.append(data[i + 1])
            bound -= 1
            i += 2
            break

        hop = data[i + 2]
        out.append(data[i + 1])
        bound -= 1

        if b == hop and b == data[i + 1]:
            run = False
            # Run overlapping the previous pair: [i-1, i, i+1, i+2].
            if i > floor and b == data[i - 1]:
                if bound < 2:
                    i += 2
                    break
                out.append(hop)
                bound -= 1
                i += 3
                run = True
            # Fresh run [i, i+1, i+2, i+3].
            if not run and i + 3 < n:
                if b == data[i + 3]:
                    if bound == 0:
                        i += 2
                        break
                    out.append(hop)
                    bound -= 1
                    if bound < 2:
                        i += 3
                        break
                    out.append(data[i + 3])
                    bound -= 1
                    i += 4
                    run = True
            if run:
                rep = 0
                while rep < 251 and i < n and data[i] == b:
                    rep += 1
                    i += 1
                out.append(rep)
                bound -= 1
                floor = i
                if i >= n:
                    break
                b = data[i]
                continue

        i += 2
        b = hop

    return out, i


# ---------------------------------------------------------------------------
# Vectorized run / chunk decomposition
# ---------------------------------------------------------------------------

@dataclass
class Runs:
    """Maximal-run decomposition of the input (positions ascending)."""

    starts: np.ndarray  # int64[n_runs]
    lens: np.ndarray    # int64[n_runs]
    data: np.ndarray    # uint8[n] original input


def decompose_runs(data: np.ndarray) -> Runs:
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data)
    if n == 0:
        return Runs(np.zeros(0, np.int64), np.zeros(0, np.int64), data)
    boundaries = np.flatnonzero(np.diff(data)) + 1
    starts = np.concatenate(([0], boundaries)).astype(np.int64)
    ends = np.concatenate((boundaries, [n])).astype(np.int64)
    return Runs(starts, ends - starts, data)


@dataclass
class _Events:
    """Chunk emissions of big (>=4) runs, ascending by source position.

    Literal stretches between events advance output 1:1 with input, so they
    need no materialization — this keeps memory O(#big-run chunks).
    """

    src_start: np.ndarray   # input position where the chunk begins
    in_len: np.ndarray      # input bytes consumed (1..255)
    out_len: np.ndarray     # output bytes emitted (5, or in_len if < 4)
    is_run: np.ndarray      # bool: emitted as "4 literals + count"
    value: np.ndarray       # the repeated byte
    out_start: np.ndarray   # block-relative output position of the chunk

    def __len__(self) -> int:
        return len(self.src_start)


def _build_events(
    starts: np.ndarray, lens: np.ndarray, data: np.ndarray, block_offset: int
) -> _Events:
    big = lens >= 4
    bstart = starts[big]
    blen = lens[big]
    q, r = np.divmod(blen, 255)
    npieces = q + (r > 0)
    total = int(npieces.sum())
    run_id = np.repeat(np.arange(len(bstart)), npieces)
    excl = np.cumsum(npieces) - npieces
    within = np.arange(total, dtype=np.int64) - excl[run_id]
    chunk = np.where(within < q[run_id], 255, r[run_id]).astype(np.int64)
    src_start = bstart[run_id] + within * 255
    is_run = chunk >= 4
    out_len = np.where(is_run, 5, chunk)
    value = data[bstart[run_id]] if total else np.zeros(0, np.uint8)
    # Output position: literal gaps between events map 1:1 input->output.
    cum_in = np.cumsum(chunk) - chunk
    cum_out = np.cumsum(out_len) - out_len
    out_start = (src_start - block_offset) - cum_in + cum_out
    return _Events(src_start, chunk, out_len, is_run, value, out_start)


def _emit_unbounded(
    ev: _Events, data: np.ndarray, block_offset: int, n_out: int, src_end: int
) -> np.ndarray:
    """Materialize the first ``n_out`` output bytes of the unbounded RLE1
    stream for the block starting at ``block_offset``.

    Only events fully inside the range are emitted; the caller guarantees
    ``n_out`` lands at an event boundary or inside a literal stretch
    (``src_end`` is the matching input position for the literal tail).
    """
    out = np.empty(n_out, dtype=np.uint8)
    # Which events are fully inside [0, n_out)?
    k = int(np.searchsorted(ev.out_start + ev.out_len, n_out, side="right"))
    e_src = ev.src_start[:k]
    e_in = ev.in_len[:k]
    e_out = ev.out_len[:k]
    e_run = ev.is_run[:k]
    e_val = ev.value[:k]
    e_ostart = ev.out_start[:k]

    # Literal segments = gaps between events plus literal-chunk events
    # (big-run tails < 4 bytes); all copy input->output 1:1.
    gap_src = np.concatenate(([block_offset], e_src + e_in, e_src[~e_run]))
    gap_end = np.concatenate((e_src, [src_end], (e_src + e_in)[~e_run]))
    gap_out = np.concatenate(([0], e_ostart + e_out, e_ostart[~e_run]))
    gap_len = np.maximum(gap_end - gap_src, 0)
    total = int(gap_len.sum())
    if total:
        excl = np.cumsum(gap_len) - gap_len
        seg = np.repeat(np.arange(len(gap_len)), gap_len)
        within = np.arange(total, dtype=np.int64) - excl[seg]
        out[np.repeat(gap_out, gap_len) + within] = (
            data[np.repeat(gap_src, gap_len) + within]
        )

    # Run-emission events: 4 literals + count byte.
    re = np.flatnonzero(e_run)
    if len(re):
        idx = e_ostart[re, None] + np.arange(4)[None, :]
        out[idx.ravel()] = np.repeat(e_val[re], 4)
        out[e_ostart[re] + 4] = (e_in[re] - 4).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Block splitting
# ---------------------------------------------------------------------------

@dataclass
class Rle1Block:
    output: np.ndarray   # uint8 RLE1 bytes, len <= block_capacity(level)
    consumed: int        # raw input bytes consumed by this block
    crc: int             # bzip2 block CRC over the consumed raw bytes


def split_blocks(data, level: int) -> list[Rle1Block]:
    """Split ``data`` into RLE1-encoded blocks exactly as the reference
    does (lib/lib.rs:101-126 + lib/rle.rs), at vectorized speed."""
    if isinstance(data, np.ndarray):
        arr = np.ascontiguousarray(data, dtype=np.uint8)
    else:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(arr)
    cap = block_capacity(level)
    runs = decompose_runs(arr)
    blocks: list[Rle1Block] = []
    offset = 0
    data_bytes = arr.tobytes()
    while offset < n:
        out, consumed = _next_block(runs, arr, data_bytes, offset, cap)
        crc = block_crc(data_bytes[offset : offset + consumed])
        blocks.append(Rle1Block(out, consumed, crc))
        offset += consumed
    return blocks


def _next_block(
    runs: Runs, arr: np.ndarray, data_bytes: bytes, offset: int, cap: int
) -> tuple[np.ndarray, int]:
    n = len(arr)
    nruns = len(runs.starts)
    # Runs overlapping [offset, ...): truncate the first one at offset.
    r0 = int(np.searchsorted(runs.starts + runs.lens, offset, side="right"))
    # Grow the run window until its *actual* unbounded output exceeds cap
    # (or EOF); geometric growth keeps total work O(window).
    step = max(64, cap // 512)
    r1 = r0
    while True:
        r1 = min(r1 + step, nruns)
        src_hi = n if r1 == nruns else int(runs.starts[r1])
        starts = runs.starts[r0:r1].copy()
        lens = runs.lens[r0:r1].copy()
        if len(starts) and starts[0] < offset:
            lens[0] -= offset - starts[0]
            starts[0] = offset
        ev = _build_events(starts, lens, arr, offset)
        ev_out_end = ev.out_start + ev.out_len
        ev_src_end = ev.src_start + ev.in_len
        if len(ev):
            last_out = int(ev_out_end[-1]) + (src_hi - int(ev_src_end[-1]))
        else:
            last_out = src_hi - offset
        if last_out > cap or src_hi >= n:
            break
        step *= 2

    if last_out <= cap and src_hi >= n:
        # Whole remainder fits: pure unbounded emission.
        out = _emit_unbounded(ev, arr, offset, last_out, n)
        return out, n - offset

    # ---- Boundary: find a checkpoint and replay the exact machine. ----
    target = cap - _REPLAY_MARGIN
    # Last run-emission event ending at or before target.
    run_ev = np.flatnonzero(ev.is_run & (ev_out_end <= target))
    if len(run_ev):
        j = int(run_ev[-1])
        cp_i = int(ev_src_end[j])
        cp_floor = cp_i
        cp_out = int(ev_out_end[j])
        next_j = j + 1
    else:
        cp_i = offset
        cp_floor = offset  # blocks path-A lookback across the block start
        cp_out = 0
        next_j = 0
    # Advance through the literal stretch toward the target (1:1, stride 2).
    s_next = int(ev.src_start[next_j]) if next_j < len(ev.src_start) else n
    avail = max(0, target - cp_out)
    lit_span = max(0, (s_next - 4) - cp_i)
    adv = min(avail, lit_span)
    adv -= adv & 1
    if adv > 0:
        cp_i += adv
        cp_out += adv

    tail, final_i = machine_replay(data_bytes, cp_i, cp_floor, cap - cp_out)
    head = _emit_unbounded(ev, arr, offset, cp_out, cp_i)
    out = np.concatenate((head, np.frombuffer(bytes(tail), dtype=np.uint8)))
    return out, final_i - offset


def machine_split_blocks(data, level: int) -> list[Rle1Block]:
    """Oracle: split blocks with the byte-serial machine only (slow)."""
    data_bytes = bytes(data)
    n = len(data_bytes)
    cap = block_capacity(level)
    blocks = []
    offset = 0
    while offset < n:
        out, final_i = machine_replay(data_bytes, offset, offset, cap)
        consumed = final_i - offset
        crc = block_crc(data_bytes[offset:final_i])
        blocks.append(
            Rle1Block(np.frombuffer(bytes(out), dtype=np.uint8), consumed, crc)
        )
        offset = final_i
    return blocks

"""Device pipeline orchestration: batched per-block encode + host framing.

Per-block data flow (all static shapes, one fused jit, vmapped over the
block batch):

    RLE1 bytes [B, N] --bwt_rotations--> BWT column + ptr
                      --mtf_indices_device--> MTF positions
                      --rle2_device--> symbol stream + freqs
                      --plan_entropy_device--> tables/selectors plan
                      --block_payload_entries + pack_entries--> words + bits

The host does streaming RLE1 + block CRCs (rle1.split_blocks), frames the
.bz2 container, and splices each block's device-packed payload words at its
bit offset (SURVEY.md §7 stage table).

Transfer discipline (the host<->device link can be the bottleneck, and on
this relay every call costs ~50 ms of latency regardless of size): each
batch is ONE upload — blocks, lengths and presence bitmaps packed into a
single uint8 array, unpacked in-jit — and ONE fetch — a packed uint32
array of (nbits, ptrs, plan_bits, mtf_lens, banzai splits, words[:, :k])
where the word bucket k is adapted
from previous batches and verified against the nbits riding the same
fetch (a miss refetches wider; rare).  Batches are dispatched ahead
(async) so uploads and compute overlap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bitio import BitWriter
from .constants import SEGMENT_WIDTH, block_capacity
from .encoder_host import TINY_BLOCK as _TINY_BLOCK
from .container import write_stream_footer, write_stream_header
from .crc32 import combine_stream_crc
from .ops.bitpack import S
from .parallel.dp import block_mesh, encode_blocks_sharded, encode_one_block
from .parallel.serial import BlockPayload
from .rle1 import iter_blocks
from .utils import enable_compile_cache

enable_compile_cache()

_K_SEED: dict = {}    # (level, N) -> last run's k_recent window
_CHUNK = 64           # MTF chunk length (sequential depth per chunk)
_DEFAULT_BATCH = 8    # blocks per device batch at level >= 5.  16 at
# level 9 measured SLOWER (vmapped while_loops run max iterations across
# the batch — stragglers); small-block levels amortize fixed per-batch
# costs over more blocks instead (see _batch_for_level).


def _batch_for_level(level: int) -> int:
    """Default device batch: small blocks need bigger batches to amortize
    the ~50 ms/call relay latency and per-batch host costs.  Measured at
    level 1 on-chip: batch 64 = 13.8 MB/s vs batch 8 = 7.6-9."""
    if level <= 2:
        return 64
    if level <= 4:
        return 32
    return _DEFAULT_BATCH


_INFLIGHT = 3         # batches dispatched ahead of the host drain

_SORT_WINDOW = 4      # batches buffered for hardness-sorted scheduling


def _hardness(out: np.ndarray) -> float:
    """Cheap predictor of a block's BWT sort difficulty: max small-period
    autocorrelation of its RLE1 bytes, sampled.

    A vmapped while_loop runs the max trip count over its batch, so one
    periodic block (RLE1-coded runs have period 5; short repeats keep
    rotation tie groups alive for extra doubling rounds) stalls every text
    block sharing its batch — measured 3.4x on the runs-heavy scale
    corpus.  Blocks are independent and payloads stitch by sequence id,
    so the scheduler buffers a window of blocks, sorts by this score, and
    encodes out of order so similar-hardness blocks share batches.
    """
    n = out.size
    if n > 16384:
        step = n // 4
        out = np.concatenate(
            [out[i * step : i * step + 4096] for i in range(4)]
        )
    best = 0.0
    for q in (1, 2, 3, 4, 5, 6, 7, 8):
        m = float(np.mean(out[q:] == out[:-q]))
        if m > best:
            best = m
    return best


def _padded_len(level: int) -> int:
    cap = block_capacity(level)
    return ((cap + _CHUNK - 1) // _CHUNK) * _CHUNK


def _nwords(N: int, nseg: int) -> int:
    # The plan picks the min-total-bits candidate, and the single-optimal-
    # table candidate costs <= (H+1) bits/symbol <= log2(258)+1 = 9.02 in
    # payload plus 2 table defs (<= 5 + 34*S bits each) and 1-bit
    # selectors — so every winning plan fits 9.25 bits/symbol + aux with
    # margin.  (The naive 17-bit/symbol worst case is 1.8x larger and
    # would double the sort/fetch widths downstream.)  drain_one re-checks
    # nbits against this capacity and host-encodes any overflowing block,
    # so the bound is belt-and-braces safe.
    worst = 18 + 6 * nseg + 2 * (5 + S * 34) + (37 * (N + 1)) // 4
    return (worst + 31) // 32 + 2


def _use_pallas() -> bool:
    """Pallas kernels are enabled on real accelerator backends only."""
    return jax.default_backend() not in ("cpu",)


# Packed-row layout for the single batch upload: N block bytes, 256
# presence bytes, 3 little-endian length bytes, 1 spare.
_ROW_EXTRA = 260


def _unpack_rows(packed: jax.Array, N: int):
    blocks = jax.lax.slice(packed, (0, 0), (packed.shape[0], N))
    present = jax.lax.slice(packed, (0, N), (packed.shape[0], N + 256)) != 0
    nb = jax.lax.slice(
        packed, (0, N + 256), (packed.shape[0], N + 259)
    ).astype(jnp.int32)
    ns = nb[:, 0] | (nb[:, 1] << 8) | (nb[:, 2] << 16)
    return blocks, ns, present


@partial(jax.jit, static_argnames=("nseg", "nwords", "use_pallas"))
def _encode_blocks(
    packed: jax.Array,       # uint8 [B, N + _ROW_EXTRA]
    *,
    nseg: int,
    nwords: int,
    use_pallas: bool = False,
):
    from .parallel.dp import encode_batch_rows

    return encode_batch_rows(
        packed, nseg=nseg, nwords=nwords, chunk=_CHUNK,
        use_pallas=use_pallas,
    )


@partial(jax.jit, static_argnames=("k",))
def _fetch_words(words: jax.Array, *, k: int) -> jax.Array:
    return words[:, :k]


@partial(jax.jit, static_argnames=("k",))
def _pack_out(
    words: jax.Array, nbits: jax.Array, ptrs: jax.Array,
    plan_bits: jax.Array, mlens: jax.Array, splits: jax.Array, *, k: int
) -> jax.Array:
    """One fetchable uint32 array:
    [nbits(B), ptrs(B), plan_bits(B), mlens(B), splits(B*3*S),
     words[:, :k] flat].  plan_bits / mlens / splits feed the drain
    thread's host-side <=-banzai contract check (huffman_host.banzai_wins)
    — ~3 KB/block next to the payload words."""
    head = jnp.concatenate(
        [
            nbits.astype(jnp.uint32),
            ptrs.astype(jnp.uint32),
            plan_bits.astype(jnp.uint32),
            mlens.astype(jnp.uint32),
            splits.astype(jnp.uint32).reshape(-1),
        ]
    )
    return jnp.concatenate(
        [head, jax.lax.slice(words, (0, 0), (words.shape[0], k)).reshape(-1)]
    )


def _bucket(n: int) -> int:
    k = 256
    while k < n:
        k *= 2
    return k


def _host_payload(blk) -> BlockPayload:
    """Encode one block's entropy payload on the host (NumPy twin)."""
    from .bitio import BitWriter
    from .encoder_host import block_plan
    from .huffman_host import write_entropy

    ptr, present, syms, plan = block_plan(blk.output)
    bw = BitWriter()
    write_entropy(bw, syms, plan)
    nbits = bw.bit_length
    raw = bw.close()
    raw += b"\x00" * (-len(raw) % 4)
    words = np.frombuffer(raw, dtype=">u4").astype(np.uint32)
    return BlockPayload(
        crc=blk.crc, ptr=ptr, present=present, words=words, nbits=nbits
    )


# ---- Hybrid host+device scheduling -----------------------------------------
# Opt-in (BANZAI_HYBRID_JOBS=J or hybrid_jobs=J): while the device chews
# its batches, J spawn-context worker processes encode stolen blocks with
# the byte-identical host backend (encoder_host.block_plan — the same code
# the device-failure fallback uses), so otherwise-idle host cores add
# throughput.  Workers are spawned (never forked: the parent holds XLA
# threads) and touch only NumPy + the native kernels.  The bench stays
# pure-TPU; this is a deployment knob.

_HYBRID_POOL = None
_HYBRID_POOL_JOBS = 0


def _shutdown_hybrid_pool() -> None:
    """atexit: tear the worker pool down while the interpreter is whole —
    GC-time teardown races module clearing inside the queue feeder."""
    global _HYBRID_POOL
    if _HYBRID_POOL is not None:
        _HYBRID_POOL.terminate()
        _HYBRID_POOL.join()
        _HYBRID_POOL = None


def _hybrid_pool(jobs: int):
    global _HYBRID_POOL, _HYBRID_POOL_JOBS
    if _HYBRID_POOL is None or _HYBRID_POOL_JOBS != jobs:
        if _HYBRID_POOL is not None:
            _HYBRID_POOL.terminate()
        # Workers are NumPy-only: spawn them with the accelerator env
        # scrubbed (utils.spawn_pool scopes + serializes the env window).
        from .utils import spawn_pool

        _HYBRID_POOL = spawn_pool(jobs)
        if _HYBRID_POOL_JOBS == 0:       # first pool this process
            import atexit

            atexit.register(_shutdown_hybrid_pool)
        _HYBRID_POOL_JOBS = jobs
    return _HYBRID_POOL


def compress_blocks_payloads(
    data: bytes,
    level: int = 9,
    batch: int | None = None,
    sharded: bool | None = None,
    blocks=None,
    hybrid_jobs: int | None = None,
) -> list[BlockPayload]:
    """Encode ``data`` into per-block payloads (device pipeline).

    ``blocks``: pre-split RLE1 blocks (an iterable of rle1.Rle1Block);
    when given, ``data`` is ignored and the RLE1 split is not re-run —
    the streaming ``encode()`` already split the span to find its block
    boundary."""
    it = iter(blocks) if blocks is not None else iter_blocks(data, level)
    return [
        p for _blk, p in compress_blocks_iter(
            it, level, batch, sharded, hybrid_jobs=hybrid_jobs
        )
    ]


def compress_blocks_iter(
    block_iter,
    level: int = 9,
    batch: int | None = None,
    sharded: bool | None = None,
    hybrid_jobs: int | None = None,
):
    """Encode a stream of RLE1 blocks; yield (block, payload) in input
    order as payloads complete.

    The generator form is what lets the streaming ``encode()`` overlap
    EVERYTHING: production (staging + upload + dispatch) runs on a worker
    thread that pulls blocks lazily — so the *next* span's host RLE1 runs
    while the device chews the current span's batches — the drain runs on
    its own consumer thread, and the caller writes finished payloads out
    as they appear instead of waiting for a whole span.

    ``hybrid_jobs`` (default BANZAI_HYBRID_JOBS, else 0): host worker
    processes that encode stolen blocks concurrently with the device —
    byte-identical output at any job count (the ordered stitch is the
    only shared state).  Workers use the spawn start method (fork is
    unsafe under JAX threads, and the accelerator env must be scrubbed),
    so a SCRIPT that passes hybrid_jobs > 0 must guard its entry point
    with ``if __name__ == "__main__":`` — standard multiprocessing
    semantics: spawn re-imports the main module in each worker."""
    N = _padded_len(level)
    nseg = (N + 1 + SEGMENT_WIDTH - 1) // SEGMENT_WIDTH
    nwords = _nwords(N, nseg)

    import os

    ndev = len(jax.local_devices())
    if sharded is None:
        sharded = ndev > 1
    mesh = block_mesh() if sharded else None
    if batch is None:
        batch = int(os.environ.get("BANZAI_BATCH", "0")) or (
            ndev * 2 if sharded else _batch_for_level(level)
        )
    if sharded and batch % ndev:
        # shard_map needs B % ndev == 0; round up instead of surfacing a
        # cryptic sharding error from inside jit.
        batch = -(-batch // ndev) * ndev
    import time as _time

    timing: dict[str, float] | None = (
        {} if os.environ.get("BANZAI_TIME") else None
    )

    import threading as _threading

    _tlock = _threading.Lock()

    def _t(name: str, t0: float) -> None:
        # Called from both the producer and the drain consumer thread.
        if timing is not None:
            with _tlock:
                timing[name] = (
                    timing.get(name, 0.0) + _time.perf_counter() - t0
                )

    if hybrid_jobs is None:
        hybrid_jobs = int(os.environ.get("BANZAI_HYBRID_JOBS", "0"))
    pool = _hybrid_pool(hybrid_jobs) if hybrid_jobs > 0 else None
    host_jobs: dict[int, tuple] = {}      # seq -> (blk, AsyncResult)

    results: dict[int, BlockPayload] = {}
    blk_map: dict[int, object] = {}       # seq -> Rle1Block (until yielded)
    avail = _threading.Condition()        # signals new results / completion
    # Adaptive word-fetch bucket: fetch width follows the max compressed
    # size of the last few batches (not an all-time max, so one
    # incompressible stretch can't permanently inflate every later fetch).
    # A shrink that undershoots costs one refetch round trip, then the
    # window re-adapts.  The window is seeded from the last run at this
    # (level, N) — a fresh call would otherwise always start at 256 and
    # pay a guaranteed refetch round trip on its first batch.
    k_recent: list[int] = list(
        _K_SEED.get((level, N), (256, 256, 256))
    )

    def _k_now() -> int:
        return min(max(max(k_recent), 256), nwords)

    def drain_one(item) -> None:
        group, pres_h, dev = item            # group: list of (seq, blk)
        try:
            words_d, nbits_d, ptrs_d, packed_d = dev
            B = nbits_d.shape[0]
            t0 = _time.perf_counter()
            flat = np.asarray(packed_d)
            _t("drain_fetch", t0)
            nbits = flat[:B].astype(np.int64)
            ptrs = flat[B : 2 * B]
            plan_bits = flat[2 * B : 3 * B].astype(np.int64)
            mlens = flat[3 * B : 4 * B].astype(np.int64)
            head = 4 * B + 3 * S * B
            splits = flat[4 * B : head].reshape(B, 3, S)
            k = (len(flat) - head) // B
            words = flat[head:].reshape(B, k)
            kmax = max(1, int(nbits[: len(group)].max() + 31) // 32)
            k_recent.append(min(_bucket(kmax), nwords))
            del k_recent[:-3]
            if kmax > k:
                # Bucket miss: refetch at the wider bucket (one extra
                # round trip); the window keeps later batches on one fetch.
                words = np.asarray(_fetch_words(words_d, k=_k_now()))
        except Exception as e:
            # Failure recovery: blocks are independent, so a lost device
            # batch is simply re-encoded on the host (same algorithms,
            # byte-identical output — see encoder_host).
            import warnings

            warnings.warn(
                f"device batch failed ({type(e).__name__}: {e}); "
                f"re-encoding {len(group)} block(s) on host"
            )
            for seq, blk in group:
                results[seq] = _host_payload(blk)
            return
        from .huffman_host import banzai_wins

        for i, (seq, blk) in enumerate(group):
            if int(nbits[i]) > nwords * 32:
                # Entropy payload exceeded the 9.25-bit/symbol capacity
                # bound (theoretically unreachable — see _nwords); the
                # device words are truncated, so re-encode on host.
                results[seq] = _host_payload(blk)
                continue
            if banzai_wins(
                splits[i], int(pres_h[i].sum()) + 2,
                int(mlens[i]), int(plan_bits[i]),
            ):
                # The <=-banzai contract: banzai's exact plan (heap-built
                # on the host from the device's split) is strictly smaller
                # than the device plan — re-encode on the host, whose
                # candidate set includes banzai's plan.  Vanishingly rare
                # (cheaper delta coding on degenerate blocks only), and
                # byte-identical to the pure-host backend either way.
                results[seq] = _host_payload(blk)
                continue
            results[seq] = BlockPayload(
                crc=blk.crc,
                ptr=int(ptrs[i]),
                present=pres_h[i],
                words=words[i],
                nbits=int(nbits[i]),
            )

    import itertools
    import queue
    import threading

    # Drain runs on a consumer thread: the blocking device fetch and the
    # host payload decode never sit between two dispatches, so staging /
    # upload / RLE1 iteration overlap both device compute AND the drain.
    # In-flight bound: queue (_INFLIGHT) + one in the consumer's hands +
    # the one just dispatched = _INFLIGHT + 2 batches of device output
    # buffers (~15 MB each at level 9 — far under HBM).  Single-consumer
    # order preserves the payload stream order.
    q: "queue.Queue" = queue.Queue(maxsize=_INFLIGHT)
    drain_exc: list[BaseException] = []

    def consumer() -> None:
        while True:
            item = q.get()
            if item is None:
                return
            try:
                drain_one(item)
            except BaseException as e:  # surface after join
                drain_exc.append(e)
                with avail:
                    avail.notify_all()
                return
            with avail:
                avail.notify_all()

    worker = threading.Thread(target=consumer, daemon=True)
    worker.start()

    seq_counter = itertools.count()
    cancelled: list[bool] = []            # non-empty => stop producing

    def device_stream():
        """Sequence-tagged blocks bound for the device; idle host workers
        steal blocks in between (hybrid scheduling)."""
        for blk in block_iter:
            if cancelled:
                return
            seq = next(seq_counter)
            blk_map[seq] = blk
            if len(blk.output) <= _TINY_BLOCK:
                # Tiny blocks (only a stream's final block can be one) go
                # to the host — padding one tail block to the full device
                # shape wastes a batch slot.  Byte-identical either way:
                # host and device planners share the same candidate set,
                # including the banzai plan (ops/banzai_plan).
                results[seq] = _host_payload(blk)
                with avail:
                    avail.notify_all()
                continue
            if pool is not None:
                active = sum(
                    1 for _b, ar in host_jobs.values() if not ar.ready()
                )
                if active < hybrid_jobs:
                    from .encoder_host import hybrid_block

                    with avail:
                        host_jobs[seq] = (blk, pool.apply_async(
                            hybrid_block,
                            (np.ascontiguousarray(blk.output),),
                        ))
                        avail.notify_all()
                    continue
            yield seq, blk

    tagged_iter = device_stream()

    sort_window = int(
        os.environ.get("BANZAI_SORT_WINDOW", str(_SORT_WINDOW))
    )

    def dispatch(group) -> bool:
        """Stage + upload + dispatch one batch; False once the drain died."""
        B = len(group)
        # Batch padding policy: pad to the next power of two <= batch.
        # Dummy slots cost full device time (static shapes), so a tail of
        # 7 real blocks runs as [8], not [batch].  The shape ladder is
        # log2(batch)+1 compiles worst case, all persistent-cached.
        # Sharded always uses the mesh batch (the mesh fixes the shape).
        tgt = batch if sharded else min(batch, 1 << (B - 1).bit_length())
        t0 = _time.perf_counter()
        arr = np.zeros((tgt, N + _ROW_EXTRA), np.uint8)
        arr[:, N] = 1                            # dummy blocks: byte 0
        arr[:, N + 256] = 1                      # present, length 1
        pres = np.zeros((tgt, 256), bool)
        pres[:, 0] = True
        for i, (_seq, blk) in enumerate(group):
            nb = len(blk.output)
            arr[i, :nb] = blk.output
            p = np.bincount(blk.output, minlength=256) > 0
            pres[i] = p
            arr[i, N : N + 256] = p
            arr[i, N + 256] = nb & 0xFF
            arr[i, N + 257] = (nb >> 8) & 0xFF
            arr[i, N + 258] = (nb >> 16) & 0xFF
        _t("stage", t0)
        t0 = _time.perf_counter()
        packed = jnp.asarray(arr)
        _t("upload", t0)
        t0 = _time.perf_counter()
        if sharded:
            dev = encode_blocks_sharded(
                packed, nseg=nseg, nwords=nwords, mesh=mesh, chunk=_CHUNK,
                use_pallas=_use_pallas(),
            )
        else:
            dev = _encode_blocks(
                packed, nseg=nseg, nwords=nwords, use_pallas=_use_pallas(),
            )
        words_d, nbits_d, ptrs_d, planb_d, splits_d, mlens_d = dev
        k = _k_now()
        packed_d = _pack_out(
            words_d, nbits_d, ptrs_d, planb_d, mlens_d, splits_d, k=k
        )
        _t("dispatch", t0)
        try:
            # Begin the device->host copy now; the consumer's np.asarray
            # then finds the bytes staged instead of starting the pull.
            packed_d.copy_to_host_async()
        except Exception:
            pass  # backend without async copies: drain pulls as before
        item = (group, pres, (words_d, nbits_d, ptrs_d, packed_d))
        while not drain_exc:
            try:
                q.put(item, timeout=1.0)
                break
            except queue.Full:  # consumer alive but busy; retry
                continue
        return not drain_exc

    def produce() -> None:
        # The FIRST dispatch is a SMALL batch shipped un-windowed: the
        # device sits idle until the first upload arrives, and that fill
        # edge is RLE1 + staging + upload of everything in front of it
        # (a full-batch first dispatch measured ~120 ms of a 1.12 s
        # 20 MB wall; a 4-batch window made it worse).  A quarter batch
        # starts the device ~4x sooner; its slightly worse per-block
        # vmap efficiency is confined to those few blocks.  Hardness
        # grouping only matters for straggler mixing across MANY
        # batches, so it loses nothing by skipping the pipe fillers.
        small = max(1, batch // 4) if not sharded else batch
        for b0 in (small, batch):
            t0 = _time.perf_counter()
            first = list(itertools.islice(tagged_iter, b0))
            _t("rle1_iter", t0)
            if not first:
                return
            if not dispatch(first):
                return
        while True:
            t0 = _time.perf_counter()
            window = list(itertools.islice(tagged_iter, batch * sort_window))
            _t("rle1_iter", t0)
            if not window:
                break
            if len(window) > batch:
                # Out-of-order encode: group similar-hardness blocks so a
                # periodic straggler can't stall a whole batch of text
                # blocks (sort is stable — equal scores keep input order).
                t0 = _time.perf_counter()
                window.sort(key=lambda sb: _hardness(sb[1].output))
                _t("hardness_sort", t0)
            for gi in range(0, len(window), batch):
                if not dispatch(window[gi : gi + batch]):
                    return

    prod_exc: list[BaseException] = []
    prod_total: list[int] = []            # [block count] once producer ends

    def producer() -> None:
        try:
            produce()
        except BaseException as e:
            prod_exc.append(e)
        finally:
            # Shut the consumer down whether production finished or died —
            # else the thread leaks blocked in get() holding device buffers.
            while not drain_exc:
                try:
                    q.put(None, timeout=1.0)
                    break
                except queue.Full:
                    continue
            worker.join()
            _K_SEED[(level, N)] = tuple(k_recent)
            prod_total.append(next(seq_counter))
            with avail:
                avail.notify_all()

    prod_thread = threading.Thread(target=producer, daemon=True)
    prod_thread.start()

    def resolve_hybrid(seq: int) -> BlockPayload:
        blk, ar = host_jobs.pop(seq)
        try:
            # Bounded get: a worker lost mid-task would otherwise leave
            # this AsyncResult pending forever.
            ptr, present, words, nb = ar.get(timeout=300)
            return BlockPayload(
                crc=blk.crc, ptr=ptr, present=present,
                words=words, nbits=nb,
            )
        except Exception as e:
            import warnings

            warnings.warn(
                f"hybrid host worker failed ({type(e).__name__}: {e}); "
                "re-encoding the block inline"
            )
            return _host_payload(blk)

    next_seq = 0
    try:
        while True:
            payload = None
            hybrid = False
            with avail:
                while True:
                    if next_seq in results:
                        payload = results.pop(next_seq)
                        break
                    if next_seq in host_jobs:
                        hybrid = True
                        break
                    if drain_exc:
                        raise drain_exc[0]
                    if prod_exc:
                        raise prod_exc[0]
                    if prod_total and next_seq >= prod_total[0]:
                        return
                    avail.wait(0.2)
            if hybrid:
                payload = resolve_hybrid(next_seq)
            yield blk_map.pop(next_seq), payload
            next_seq += 1
    finally:
        cancelled.append(True)
        prod_thread.join()
        if timing is not None:
            import sys

            print("pipeline timing:", {k: round(v, 3) for k, v in
                                        sorted(timing.items())},
                  file=sys.stderr)


def compress(
    data: bytes,
    level: int = 9,
    batch: int | None = None,
    sharded: bool | None = None,
    hybrid_jobs: int | None = None,
) -> bytes:
    """Encode ``data`` on the device pipeline into a .bz2 stream."""
    bw = BitWriter()
    write_stream_header(bw, level)
    stream_crc = 0
    for p in compress_blocks_payloads(
        data, level, batch, sharded, hybrid_jobs=hybrid_jobs
    ):
        stream_crc = combine_stream_crc(stream_crc, p.crc)
        p.write(bw)
    write_stream_footer(bw, stream_crc)
    return bw.close()

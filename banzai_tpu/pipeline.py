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

Transfer discipline (the host<->device link can be the bottleneck): block
payload words stay on device; the host first reads the per-block bit counts
(tiny), then fetches only ceil(max nbits/32) words per batch through a
bucketed jitted slice — so device->host traffic is ~the compressed size,
not the worst-case buffer.  Batches are dispatched ahead (async) so uploads
and compute overlap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bitio import BitWriter
from .constants import SEGMENT_WIDTH, block_capacity
from .container import write_stream_footer, write_stream_header
from .crc32 import combine_stream_crc
from .ops.bitpack import S
from .parallel.dp import block_mesh, encode_blocks_sharded, encode_one_block
from .parallel.serial import BlockPayload
from .rle1 import iter_blocks
from .utils import enable_compile_cache

enable_compile_cache()

_CHUNK = 64           # MTF chunk length (sequential depth per chunk)
_DEFAULT_BATCH = 8
_INFLIGHT = 3         # batches dispatched ahead of the host drain


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


@partial(jax.jit, static_argnames=("nseg", "nwords", "use_pallas"))
def _encode_blocks(
    blocks: jax.Array,       # uint8 [B, N]
    ns: jax.Array,           # int32 [B]
    present: jax.Array,      # bool [B, 256]
    *,
    nseg: int,
    nwords: int,
    use_pallas: bool = False,
):
    fn = partial(
        encode_one_block, nseg=nseg, nwords=nwords, chunk=_CHUNK,
        use_pallas=use_pallas,
    )
    return jax.vmap(fn)(blocks, ns, present)


@partial(jax.jit, static_argnames=("k",))
def _fetch_words(words: jax.Array, *, k: int) -> jax.Array:
    return words[:, :k]


def _bucket(n: int) -> int:
    k = 256
    while k < n:
        k *= 2
    return k


def _host_payload(blk) -> BlockPayload:
    """Encode one block's entropy payload on the host (NumPy twin)."""
    from .bitio import BitWriter
    from .huffman_host import plan_entropy, write_entropy
    from .mtf_rle2 import mtf_indices, rle2_encode
    from .oracle.stages import numpy_bwt

    bwt, ptr = numpy_bwt(blk.output)
    present = np.bincount(blk.output, minlength=256) > 0
    num_names = int(present.sum())
    idx = mtf_indices(bwt, present)
    syms, freqs = rle2_encode(idx, num_names)
    plan = plan_entropy(syms, num_names + 2, freqs)
    bw = BitWriter()
    write_entropy(bw, syms, plan)
    nbits = bw.bit_length
    raw = bw.close()
    raw += b"\x00" * (-len(raw) % 4)
    words = np.frombuffer(raw, dtype=">u4").astype(np.uint32)
    return BlockPayload(
        crc=blk.crc, ptr=ptr, present=present, words=words, nbits=nbits
    )


def compress_blocks_payloads(
    data: bytes,
    level: int = 9,
    batch: int | None = None,
    sharded: bool | None = None,
) -> list[BlockPayload]:
    """Encode ``data`` into per-block payloads (device pipeline)."""
    N = _padded_len(level)
    nseg = (N + 1 + SEGMENT_WIDTH - 1) // SEGMENT_WIDTH
    nwords = _nwords(N, nseg)

    ndev = len(jax.local_devices())
    if sharded is None:
        sharded = ndev > 1
    mesh = block_mesh() if sharded else None
    if batch is None:
        batch = ndev * 2 if sharded else _DEFAULT_BATCH

    payloads: list[BlockPayload] = []
    pending: list[tuple[list, np.ndarray, tuple]] = []

    def drain_one() -> None:
        group, pres_h, dev = pending.pop(0)
        try:
            words_d, nbits_d, ptrs_d = dev
            nbits = np.asarray(nbits_d)
            ptrs = np.asarray(ptrs_d)
            kmax = max(1, int(nbits[: len(group)].max() + 31) // 32)
            k = min(_bucket(kmax), nwords)
            words = np.asarray(_fetch_words(words_d, k=k))
        except Exception as e:
            # Failure recovery: blocks are independent, so a lost device
            # batch is simply re-encoded on the host (same algorithms,
            # byte-identical output — see encoder_host).
            import warnings

            warnings.warn(
                f"device batch failed ({type(e).__name__}: {e}); "
                f"re-encoding {len(group)} block(s) on host"
            )
            for blk in group:
                payloads.append(_host_payload(blk))
            return
        for i, blk in enumerate(group):
            if int(nbits[i]) > nwords * 32:
                # Entropy payload exceeded the 9.25-bit/symbol capacity
                # bound (theoretically unreachable — see _nwords); the
                # device words are truncated, so re-encode on host.
                payloads.append(_host_payload(blk))
                continue
            payloads.append(
                BlockPayload(
                    crc=blk.crc,
                    ptr=int(ptrs[i]),
                    present=pres_h[i],
                    words=words[i],
                    nbits=int(nbits[i]),
                )
            )

    import itertools

    block_iter = iter_blocks(data, level)
    saw_full = False
    while True:
        group = list(itertools.islice(block_iter, batch))
        if not group:
            break
        B = len(group)
        # Batch padding policy: small one-shot inputs pad to a power of
        # two (cheap compiles, cheap compute); once a full batch has been
        # seen (a real stream) every tail pads to the full batch so only
        # ONE shape ever compiles.  Sharded always uses the mesh batch.
        if sharded or saw_full:
            tgt = batch
        else:
            tgt = min(batch, 1 << (B - 1).bit_length())
        saw_full = saw_full or B == batch
        pad_b = tgt - B
        arr = np.zeros((B + pad_b, N), np.uint8)
        ns = np.ones(B + pad_b, np.int32)
        pres = np.zeros((B + pad_b, 256), bool)
        pres[:, 0] = True                        # dummy blocks: single byte
        for i, blk in enumerate(group):
            arr[i, : len(blk.output)] = blk.output
            ns[i] = len(blk.output)
            pres[i] = np.bincount(blk.output, minlength=256) > 0
        if sharded:
            dev = encode_blocks_sharded(
                jnp.asarray(arr), jnp.asarray(ns), jnp.asarray(pres),
                nseg=nseg, nwords=nwords, mesh=mesh, chunk=_CHUNK,
                use_pallas=_use_pallas(),
            )
        else:
            dev = _encode_blocks(
                jnp.asarray(arr), jnp.asarray(ns), jnp.asarray(pres),
                nseg=nseg, nwords=nwords, use_pallas=_use_pallas(),
            )
        pending.append((group, pres, dev))
        while len(pending) >= _INFLIGHT:
            drain_one()
    while pending:
        drain_one()
    return payloads


def compress(
    data: bytes,
    level: int = 9,
    batch: int | None = None,
    sharded: bool | None = None,
) -> bytes:
    """Encode ``data`` on the device pipeline into a .bz2 stream."""
    bw = BitWriter()
    write_stream_header(bw, level)
    stream_crc = 0
    for p in compress_blocks_payloads(data, level, batch, sharded):
        stream_crc = combine_stream_crc(stream_crc, p.crc)
        p.write(bw)
    write_stream_footer(bw, stream_crc)
    return bw.close()

"""One-pass Pallas kernels for the two merge-shaped pipeline stages.

Round 4 measured rle2's digit expansion and bitpack's word assembly at
~8.3 ms/block combined — all of it bitonic sorts used purely as data
movement (ops/rle2.py's 2-operand 2M-lane merge + compaction sort,
ops/bitpack.py's two (E+Q)-lane sorts).  A sort moves ~30x the bytes the
job needs; these kernels do each job in ~one read + ~one write of the
stream by exploiting the TPU grid's SEQUENTIAL execution:

  * both problems are monotone interval maps — rle2 entry e covers output
    slots [off_e, off_e + w_e) (reference: the fused emit loop,
    lib/mtf.rs:46-113); bitpack entry i contributes its shifted bits to
    word off_i >> 5 (reference: the bit-serial splicer, lib/out.rs:30-104).
    Offsets are prefix sums of widths, so a tile of T consecutive entries
    covers a BOUNDED output span: for rle2, the width sum is <= T + 20
    (an entry's digit count is bounded by its preceding in-tile zero
    count, +20 for one run carried in from earlier tiles); for bitpack,
    bit lengths <= 32 mean consecutive entries advance by at most one
    word, so <= T + 1 words;
  * within a tile, slot -> covering-entry resolution is a [WIN, T]
    interval-membership mask (slots on sublanes, entries on lanes); the
    per-slot field extraction is ONE tiny MXU contraction over the lane
    axis (dot_general [K, T] x [WIN, T] -> [K, WIN]) — exact in f32
    because every contracted field is < 2^24 and exactly one entry
    covers each live slot (bitpack sums split into byte planes whose
    disjoint-bit-field sums stay < 2^8).  No gather, no scatter, no
    [T, T] 1-D-layout intermediates (the prototype's Mosaic blocker),
    no in-kernel transposes;
  * stores ride a 128-ALIGNED SLIDING WINDOW: Mosaic only allows
    dynamic HBM slices at lane offsets provably divisible by the tiling
    (128), so each step stores the window [abase, abase + WIN) where
    abase = align128(tile's first output index).  The window lives in
    VMEM scratch across the sequential grid: its unaligned head — slots
    before this tile's first, owned by earlier tiles — is carried over
    from the previous window (shift by a multiple of 128: a static-slice
    select, no dynamic lane rotate), and bitpack's shared boundary word
    ORs the carried value with this tile's contribution.  Each store
    fully rewrites the window, so trailing garbage is always overwritten
    by later steps (productionizing ops/compact_pallas.py's overwrite
    trick, made alignment-legal).

Both kernels are bit-exact twins of the XLA-sort formulations they
replace (asserted by tests/test_stream_pallas.py across random and
adversarial cases, and by the device-fuzz device==host battery); the
fused pipeline picks them via use_pallas (pipeline._use_pallas —
accelerator backends only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 256          # entries per grid step (lanes of the interval mask)
_WIN = 512        # aligned store window (sublanes of the mask); must
                  # cover 127 (head) + _T + 21 (max span), mult of 128

_CDIMS = (((1,), (1,)), ((), ()))     # contract lane axes: [K,T]x[W,T]->[K,W]


def _shift_window(win, sh):
    """Shift the window left by ``sh`` lanes, sh a multiple of 128 in
    [0, _WIN]: select among the static slices (no dynamic lane rotate)."""
    out = jnp.zeros_like(win)        # sh == _WIN -> nothing carries over
    for k in range(_WIN // 128 - 1, -1, -1):
        shifted = (
            win if k == 0
            else jnp.concatenate(
                [win[:, k * 128 :],
                 jnp.zeros((1, k * 128), win.dtype)], axis=1
            )
        )
        out = jnp.where(sh == k * 128, shifted, out)
    return out


def _row_len(L: int) -> int:
    """Per-block row length in the flat [1, B*row] output: covers index
    L-1 plus a full window, rounded to the 128 alignment unit."""
    return -(-(L + _WIN) // 128) * 128


# ---------------------------------------------------------------------------
# rle2: entry expansion
# ---------------------------------------------------------------------------


def _rle2_kernel(offw_ref, packed_ref, out_ref, prev_ref, win_ref, sem_ref):
    """One (block, tile) step: expand this tile's entries into their
    output slots inside the aligned window and store it.

    offw_ref [1, 1, 1, T]: (off << 5) | width  (width 0 == dead lane);
    packed_ref [1, 1, 1, T]: (val << 21) | zp1.  The tile's first output
    index is the first lane's off (offsets are the widths' prefix sum).
    prev_ref [1] SMEM scratch: the previous window's aligned base.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    row = out_ref.shape[1] // pl.num_programs(0)
    base = offw_ref[0, 0, 0, 0] >> 5
    abase = (base >> 7) << 7

    @pl.when(t == 0)
    def _():
        prev_ref[0] = 0          # base==0 at t==0, so the head is empty

    sh = abase - prev_ref[0]
    prev_ref[0] = abase

    offw = offw_ref[0, 0]                                # [1, T]
    loff = (offw >> 5) - abase                           # in [0, _WIN)
    w = offw & 31
    pk = packed_ref[0, 0]
    zp1 = pk & 0x1FFFFF
    val = pk >> 21
    s_col = jax.lax.broadcasted_iota(jnp.int32, (_WIN, _T), 0)
    cond = (loff <= s_col) & (s_col < loff + w)          # [WIN, T]
    # Exactly one entry covers each live slot, so a 0/1-weighted sum is a
    # select.  The MXU's bf16 passes carry integers <= 2^8 exactly (and
    # accumulate in f32), so every field is fed as 7-bit planes.
    fields = jnp.concatenate(
        [loff & 127, loff >> 7,                          # loff < 2^9
         zp1 & 127, (zp1 >> 7) & 127, zp1 >> 14,         # zp1 < 2^21
         val & 127, val >> 7],                           # val < 2^9
        axis=0,
    ).astype(jnp.bfloat16)                               # [7, T]
    Y = jax.lax.dot_general(
        fields, cond.astype(jnp.bfloat16), _CDIMS,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)                                  # [7, WIN]
    loff_s = Y[0:1] | (Y[1:2] << 7)
    zp1_s = Y[2:3] | (Y[3:4] << 7) | (Y[4:5] << 14)
    val_s = Y[5:6] | (Y[6:7] << 7)
    s_row = jax.lax.broadcasted_iota(jnp.int32, (1, _WIN), 1)
    d = jnp.clip(s_row - loff_s, 0, 31)
    nd = jnp.zeros_like(zp1_s)
    for k in range(1, 21):                               # bitlength(zp1)-1
        nd = nd + (zp1_s >= (1 << k)).astype(jnp.int32)
    digit = (zp1_s >> d) & 1
    computed = jnp.where(d == nd, val_s, digit)
    # Head slots (< this tile's first output) belong to earlier tiles:
    # take them from the carried window.
    head = _shift_window(win_ref[:], sh)
    win_ref[:] = jnp.where(s_row < base - abase, head, computed)
    copy = pltpu.make_async_copy(
        win_ref,
        out_ref.at[:, pl.ds(pl.multiple_of(b * row + abase, 128), _WIN)],
        sem_ref,
    )
    copy.start()
    copy.wait()


@partial(jax.jit, static_argnames=("interpret",))
def rle2_expand_batch(
    mtf_idx: jax.Array,
    n: jax.Array,
    num_names: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Batched RLE2: [B, N] MTF indices -> ([B, N+1] symbols, [B] out_len).

    Bit-identical to ops/rle2.rle2_device per block (the shared
    rle2_entries builds the same entry stream; only the expansion runs in
    the kernel instead of two 2M-lane sorts).  Batch rides the first grid
    axis — the kernel is never vmapped.
    """
    from .rle2 import rle2_entries

    B, N = mtf_idx.shape
    M = N + 1
    off, width, zp1, val, out_len = jax.vmap(rle2_entries)(
        mtf_idx, n, num_names
    )
    packed = jnp.where(width > 0, (val << 21) | zp1, 0)
    offw = (off << 5) | width                            # width <= 21 < 32

    n_tiles = -(-M // _T)
    pad = n_tiles * _T - M
    if pad:
        # Pad lanes: width 0, off == out_len — a trailing all-pad tile
        # must park its (all-garbage) window AT the stream tail, never
        # rewind onto live data.
        offw = jnp.concatenate(
            [offw, jnp.broadcast_to((out_len << 5)[:, None], (B, pad))],
            axis=1,
        )
        packed = jnp.concatenate(
            [packed, jnp.zeros((B, pad), jnp.int32)], axis=1
        )
    row = _row_len(M)
    out = pl.pallas_call(
        _rle2_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _T), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, _T), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((1, B * row), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, _WIN), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        offw.reshape(B, n_tiles, 1, _T),
        packed.reshape(B, n_tiles, 1, _T),
    )
    out = out.reshape(B, row)
    pos = jnp.arange(M, dtype=jnp.int32)[None, :]
    syms = jnp.where(pos < out_len[:, None], out[:, :M], 258)
    return syms, out_len


# ---------------------------------------------------------------------------
# bitpack: word assembly
# ---------------------------------------------------------------------------


def _pack_kernel(w_ref, hi2_ref, out_ref, prev_ref, win_ref, sem_ref):
    """One (block, tile) step: sum this tile's word contributions into
    the aligned window and store it.

    w_ref [1, 1, 1, T]: clamped word index per entry (nondecreasing; the
    tile's first word is the first lane); hi2_ref: the entry's 32-bit
    contribution to that word (disjoint bit fields -> OR == ADD, and
    each byte plane's disjoint-field sum stays < 2^8).
    prev_ref [2] SMEM scratch: [0] the previous window's aligned base,
    [1] the previous tile's last word (consecutive entries advance by at
    most one word, so that word is the only one this tile may share).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    row = out_ref.shape[1] // pl.num_programs(0)
    wv = w_ref[0, 0]                                     # [1, T]
    h = hi2_ref[0, 0]
    base = w_ref[0, 0, 0, 0]
    abase = (base >> 7) << 7

    @pl.when(t == 0)
    def _():
        prev_ref[0] = 0
        prev_ref[1] = -1

    sh = abase - prev_ref[0]
    plim = prev_ref[1] - abase       # last window lane earlier tiles own
    prev_ref[0] = abase
    prev_ref[1] = wv[0, _T - 1]

    wloc = wv - abase                                    # in [0, _WIN)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (_WIN, _T), 0)
    cond = (wloc == s_col).astype(jnp.bfloat16)          # [WIN, T]
    # bf16 carries integers <= 2^8 exactly and per-plane sums stay < 2^8
    # (disjoint bit fields within a byte), accumulating in f32.
    planes = jnp.concatenate(
        [(h >> (8 * k)) & 255 for k in range(4)], axis=0
    ).astype(jnp.bfloat16)                               # [4, T]
    S4 = jax.lax.dot_general(
        planes, cond, _CDIMS, preferred_element_type=jnp.float32
    ).astype(jnp.int32)                                  # [4, WIN]
    computed = (
        S4[0:1] | (S4[1:2] << 8) | (S4[2:3] << 16) | (S4[3:4] << 24)
    )
    # Words up to plim carry earlier tiles' bits: head words below base
    # come through whole from the carried window (computed is 0 there),
    # and the boundary word (== base, only when shared) ORs both.
    head = _shift_window(win_ref[:], sh)
    s_row = jax.lax.broadcasted_iota(jnp.int32, (1, _WIN), 1)
    win_ref[:] = computed | jnp.where(s_row <= plim, head, 0)
    copy = pltpu.make_async_copy(
        win_ref,
        out_ref.at[:, pl.ds(pl.multiple_of(b * row + abase, 128), _WIN)],
        sem_ref,
    )
    copy.start()
    copy.wait()


@partial(jax.jit, static_argnames=("nwords", "interpret"))
def pack_words_batch(
    vals: jax.Array,
    lens: jax.Array,
    nwords: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Batched bit packing: [B, E] (value, bit-length) entries ->
    ([B, nwords] uint32 words, [B] total bits).

    Bit-identical to ops/bitpack.pack_entries per block (the shared
    splice_entries computes the same per-entry word contributions; only
    the word assembly runs in the kernel instead of two 2M-lane sorts)."""
    from .bitpack import splice_entries

    B = vals.shape[0]
    w, hi2, total = jax.vmap(splice_entries)(vals, lens)
    hi2 = jax.lax.bitcast_convert_type(hi2, jnp.int32)
    wc = jnp.minimum(w, nwords)

    E1 = wc.shape[1]
    n_tiles = -(-E1 // _T)
    pad = n_tiles * _T - E1
    if pad:
        # Pad lanes repeat the last real word with a zero contribution.
        wc = jnp.concatenate(
            [wc, jnp.broadcast_to(wc[:, -1:], (B, pad))], axis=1
        )
        hi2 = jnp.concatenate(
            [hi2, jnp.zeros((B, pad), jnp.int32)], axis=1
        )
    row = _row_len(nwords)
    out = pl.pallas_call(
        _pack_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _T), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, _T), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((1, B * row), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((1, _WIN), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        wc.reshape(B, n_tiles, 1, _T),
        hi2.reshape(B, n_tiles, 1, _T),
    )
    out = out.reshape(B, row)
    # Words past the used count are never stored by any tile; the XLA
    # twin yields exact zeros there, so mask for bit identity.
    used = (total + 31) >> 5
    widx = jnp.arange(nwords, dtype=jnp.int32)[None, :]
    words = jnp.where(widx < used[:, None], out[:, :nwords], 0)
    return jax.lax.bitcast_convert_type(words, jnp.uint32), total

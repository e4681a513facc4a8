"""RLE2 on device: zero-run bijective-base-2 coding as prefix sums.

Reference semantics: lib/mtf.rs:46-65,106-113 — maximal runs of MTF index 0
become RUNA/RUNB digit strings (LSB-first bits of run+1 below its leading
one); nonzero index i becomes symbol i+1; EOB terminates the block.

Device formulation: treat EOB as a sentinel "nonzero" appended at position
n.  For every nonzero, the preceding zero-run length falls out of an
exclusive cummax of nonzero positions; digit counts are exact integer
bit-lengths (comparison ladder, no float log); output offsets are one
exclusive cumsum.  The emit->output expansion is ONE scatter-max of source
positions (targets are monotonic, so a cummax forward-fills coverage) plus
ONE gather of a packed (zrun+1 | value<<21) field — scatters and gathers
are the priciest primitives on this hardware, so the stage runs exactly
one of each.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_DIGITS = 20  # zero runs < 2^20 (block <= 900_000)


def rle2_device(
    mtf_idx: jax.Array,
    n: jax.Array,
    num_names: jax.Array,
    with_freqs: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode the MTF index stream.

    Args:
      mtf_idx: int32[N] (valid first ``n``).
      n: int32 true length.
      num_names: int32 number of present byte values.
      with_freqs: compute the [258] frequency histogram.  The fused device
        pipeline derives frequencies from the segment histogram instead
        (ops/huffman.segment_hist), so it passes False to skip the scatter.
    Returns:
      syms int32[N+1] (RLE2 symbols, padded with 258),
      out_len int32,
      freqs int32[258] (zeros when ``with_freqs`` is False).
    """
    N = mtf_idx.shape[0]
    M = N + 1
    eob = num_names + 1
    pos = jnp.arange(M, dtype=jnp.int32)
    is_eob = pos == n
    nz = (jnp.concatenate([mtf_idx, jnp.zeros(1, jnp.int32)]) > 0) & (pos < n)
    emit = nz | is_eob

    # Previous emit position (exclusive cummax).
    marked = jnp.where(emit, pos, -1)
    prev = jnp.concatenate(
        [jnp.full(1, -1, jnp.int32), jax.lax.cummax(marked, axis=0)[:-1]]
    )
    zrun = jnp.where(emit, pos - prev - 1, 0)

    # Digit count = bitlength(zrun + 1) - 1, exact via comparison ladder.
    zp1 = zrun + 1
    nd = jnp.zeros(M, jnp.int32)
    for k in range(1, _MAX_DIGITS + 1):
        nd = nd + (zp1 >= (1 << k)).astype(jnp.int32)

    emit_i = emit.astype(jnp.int32)
    width = (nd + 1) * emit_i
    ends = jnp.cumsum(width)                            # inclusive
    off = ends - width                                  # exclusive
    out_len = ends[-1]

    # Expansion: scatter each emit entry's *source position* at its output
    # start (targets are monotonic in entry order, so a plain cummax
    # forward-fills every covered slot), then ONE gather of the packed
    # per-entry fields.  zp1 <= 2^20 (21 bits) and val <= 258 (9 bits)
    # pack into 30 bits.
    val = jnp.where(
        is_eob, eob, jnp.concatenate([mtf_idx, jnp.zeros(1, jnp.int32)]) + 1
    )
    packed = zp1 | (val << 21)
    tgt = jnp.where(emit, off, M)
    chain = (
        jnp.full(M + 1, -1, jnp.int32)
        .at[tgt]
        .max(jnp.where(emit, pos, -1))[:M]
    )
    src = jax.lax.cummax(chain, axis=0)                 # covering entry pos
    src_c = jnp.maximum(src, 0)
    pk = packed[src_c]
    zp1_f = pk & 0x1FFFFF
    val_f = pk >> 21

    # Entry start slots: where the covering source changes (or slot 0).
    src_prev = jnp.concatenate([jnp.full(1, -2, jnp.int32), src[:-1]])
    is_start = src != src_prev
    off_f = jax.lax.cummax(jnp.where(is_start, pos, -1), axis=0)
    d = pos - off_f
    digit = (zp1_f >> jnp.clip(d, 0, _MAX_DIGITS)) & 1
    # The symbol occupies an entry's last slot: the next slot starts a new
    # entry or the stream ends.
    is_sym_slot = jnp.concatenate(
        [is_start[1:], jnp.ones(1, bool)]
    ) | (pos == out_len - 1)
    syms = jnp.where(is_sym_slot, val_f, digit)
    live = pos < out_len
    syms = jnp.where(live, syms, 258)

    if with_freqs:
        freqs = (
            jnp.zeros(259, jnp.int32)
            .at[syms]
            .add(live.astype(jnp.int32))[:258]
        )
    else:
        freqs = jnp.zeros(258, jnp.int32)
    return syms, out_len, freqs

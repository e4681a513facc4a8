"""RLE2 on device: zero-run bijective-base-2 coding as prefix sums.

Reference semantics: lib/mtf.rs:46-65,106-113 — maximal runs of MTF index 0
become RUNA/RUNB digit strings (LSB-first bits of run+1 below its leading
one); nonzero index i becomes symbol i+1; EOB terminates the block.

Device formulation: treat EOB as a sentinel "nonzero" appended at position
n.  For every nonzero, the preceding zero-run length falls out of an
exclusive cummax of nonzero positions; digit counts are exact integer
bit-lengths (comparison ladder, no float log); output offsets are one
exclusive cumsum; digits scatter in <=20 masked passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_DIGITS = 20  # zero runs < 2^20 (block <= 900_000)
_TRASH = -1       # scatter target for masked lanes (wraps to the pad slot)


def rle2_device(
    mtf_idx: jax.Array, n: jax.Array, num_names: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode the MTF index stream.

    Args:
      mtf_idx: int32[N] (valid first ``n``).
      n: int32 true length.
      num_names: int32 number of present byte values.
    Returns:
      syms int32[N+1] (RLE2 symbols, padded with 258),
      out_len int32,
      freqs int32[258].
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

    # Output slot j belongs to the emit entry whose output range [off, end)
    # contains j.  Each entry's fields are scattered at its output start
    # packed under its offset's high bits (offsets increase with entries,
    # so a cummax forward-fills the covering entry's fields to every slot)
    # — no gathers at all.  off < 2^20 and all packed fields are < 2^11.
    val = jnp.where(
        is_eob, eob, jnp.concatenate([mtf_idx, jnp.zeros(1, jnp.int32)]) + 1
    )
    tgt = jnp.where(emit, off, M)

    def fill(field: jax.Array) -> jax.Array:
        chain = (
            jnp.full(M + 1, -1, jnp.int32)
            .at[tgt]
            .max(jnp.where(emit, (off << 11) | field, -1))[:M]
        )
        return jax.lax.cummax(chain, axis=0)

    f_lo = fill(zp1 & 0x7FF)
    f_hi = fill(zp1 >> 11)
    f_val = fill(val)
    off_f = f_lo >> 11
    zp1_f = (f_lo & 0x7FF) | ((f_hi & 0x7FF) << 11)
    d = pos - off_f
    digit = (zp1_f >> jnp.clip(d, 0, _MAX_DIGITS)) & 1
    # The symbol occupies an entry's last slot: the next slot starts a new
    # entry (off changes) or the stream ends.
    off_next = jnp.concatenate([off_f[1:], jnp.full(1, -1, jnp.int32)])
    is_sym_slot = (off_next != off_f) | (pos == out_len - 1)
    syms = jnp.where(is_sym_slot, f_val & 0x7FF, digit)
    live = pos < out_len
    syms = jnp.where(live, syms, 258)

    freqs = (
        jnp.zeros(259, jnp.int32)
        .at[syms]
        .add(live.astype(jnp.int32))[:258]
    )
    return syms, out_len, freqs

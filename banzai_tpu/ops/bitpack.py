"""Device bitstream assembly: prefix-sum bit packing.

The reference writes its payload through a byte-serial bit splicer
(lib/out.rs).  On device the entire entropy payload of a block — the 3-bit
table count, 15-bit selector count, unary-MTF selectors, delta-coded length
tables, and every canonical codeword — is modeled as one array of
(value, bit-length) entries; an exclusive prefix sum of lengths gives each
entry's bit offset, and each entry scatter-ORs its <=32 bits into (at most)
two uint32 lanes of the output word array.  Zero-length entries encode
masked-out lanes, so every shape is static.

The host splices the resulting words after the block header + symbol map
(bitio.BitWriter.splice_words).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CODEWORD_MAX_LEN, SEGMENT_WIDTH

S = 258
T = 6


def canonical_words(tables: jax.Array, num_syms: jax.Array) -> jax.Array:
    """Canonical codewords per (table, symbol): int32 [T, S].

    Assignment order (length asc, symbol asc) per the bzip2 format
    (lib/huffman.rs:547-561), computed in closed form: word(s) =
    first_code[len(s)] + rank(s among same-length symbols).
    """
    sym_ids = jnp.arange(S, dtype=jnp.int32)
    lens = jnp.where(sym_ids < num_syms, tables, 0)         # [T, S]
    counts = []
    ranks = jnp.zeros_like(lens)
    for l in range(1, CODEWORD_MAX_LEN + 1):
        is_l = (lens == l).astype(jnp.int32)
        counts.append(jnp.sum(is_l, axis=-1))
        c = jnp.cumsum(is_l, axis=-1)
        ranks = ranks + jnp.where(lens == l, c - 1, 0)
    fc = jnp.zeros_like(counts[0])
    first_codes = [jnp.zeros_like(counts[0])]               # for length 1
    for l in range(1, CODEWORD_MAX_LEN):
        fc = (first_codes[-1] + counts[l - 1]) << 1
        first_codes.append(fc)
    fc_table = jnp.stack(first_codes, axis=-1)              # [T, 17]
    fci = jnp.take_along_axis(
        fc_table, jnp.maximum(lens - 1, 0), axis=-1
    )
    return fci + ranks


def pack_entries(
    vals: jax.Array, lens: jax.Array, nwords: int
) -> tuple[jax.Array, jax.Array]:
    """Scatter (value, bit-length) entries MSB-first into uint32 words."""
    lens = lens.astype(jnp.int32)
    lens_u = lens.astype(jnp.uint32)
    v = vals.astype(jnp.uint32) & jnp.where(
        lens >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << lens_u) - 1
    )
    off = jnp.cumsum(lens) - lens
    total = jnp.sum(lens)
    w = off >> 5
    b = off & 31
    space = 32 - b
    fits = lens <= space
    hi = jnp.where(
        fits,
        v << jnp.where(fits, space - lens, 0).astype(jnp.uint32),
        v >> jnp.where(fits, 0, lens - space).astype(jnp.uint32),
    )
    lo = jnp.where(
        fits,
        jnp.uint32(0),
        v << (((64 - b - lens) & 31).astype(jnp.uint32)),
    )
    # Word assembly without scatters: contributions to a word are a
    # contiguous run of entries (w is sorted), and OR == ADD (disjoint
    # bits), so each word is a difference of wrapping prefix sums taken at
    # word-boundary entry indices.  boundary[x] = last entry index whose
    # word <= x (one scatter-max + cummax), then two small gathers.
    s_hi = jnp.cumsum(jax.lax.bitcast_convert_type(hi, jnp.int32))
    s_lo = jnp.cumsum(jax.lax.bitcast_convert_type(lo, jnp.int32))
    # int32 addition wraps, and OR == ADD for disjoint bit fields, so the
    # mod-2^32 prefix differences below are exact word values.
    E = lens.shape[0]
    last = (
        jnp.full(nwords + 1, -1, jnp.int32)
        .at[jnp.minimum(w, nwords)]
        .max(jnp.arange(E, dtype=jnp.int32))
    )
    last = jax.lax.cummax(last, axis=0)                     # [nwords+1]
    s_hi_e = jnp.concatenate([jnp.zeros(1, jnp.int32), s_hi])
    s_lo_e = jnp.concatenate([jnp.zeros(1, jnp.int32), s_lo])
    g_hi = s_hi_e[last + 1]                                 # prefix at last
    g_lo = s_lo_e[last + 1]
    g_hi_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), g_hi[:-1]])
    g_lo_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), g_lo[:-1]])
    g_lo_prev2 = jnp.concatenate([jnp.zeros(2, jnp.int32), g_lo[:-2]])
    words = (g_hi - g_hi_prev) + (g_lo_prev - g_lo_prev2)
    return (
        jax.lax.bitcast_convert_type(words[:nwords], jnp.uint32),
        total,
    )


def block_payload_entries(
    syms: jax.Array,
    out_len: jax.Array,
    num_syms: jax.Array,
    num_tables: jax.Array,
    tables: jax.Array,
    selectors: jax.Array,
    sel_mtf_idx: jax.Array,
    nseg_used: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Build the (vals, lens) entry arrays for one block's entropy payload."""
    M = syms.shape[0]
    nseg = selectors.shape[0]

    # -- header: num_tables (3), num_selectors (15) -------------------------
    h_vals = jnp.stack([num_tables, nseg_used]).astype(jnp.uint32)
    h_lens = jnp.array([3, 15], jnp.int32)

    # -- selectors: unary MTF codes ----------------------------------------
    seg_pos = jnp.arange(nseg, dtype=jnp.int32)
    live_seg = seg_pos < nseg_used
    s_vals = (
        (jnp.uint32(1) << (sel_mtf_idx + 1).astype(jnp.uint32)) - 2
    ).astype(jnp.uint32)
    s_lens = jnp.where(live_seg, sel_mtf_idx + 1, 0)

    # -- tables: 5-bit initial + per symbol delta groups + terminator ------
    sym_ids = jnp.arange(S, dtype=jnp.int32)
    t_ids = jnp.arange(T, dtype=jnp.int32)
    t_live = t_ids < num_tables                             # [T]
    s_live = sym_ids < num_syms                             # [S]
    lens_tab = tables.astype(jnp.int32)                     # [T, S]
    prev = jnp.concatenate([lens_tab[:, :1], lens_tab[:, :-1]], axis=1)
    d = lens_tab - prev
    dabs = jnp.abs(d)
    inc = d > 0
    ga = jnp.minimum(dabs, 8)
    gb = dabs - ga

    def group_pattern(g, is_inc):
        base = (
            (jnp.uint32(1) << (2 * g).astype(jnp.uint32)) - 1
        ) // 3                                              # 0b0101..
        return jnp.where(is_inc, base * 2, base * 3)

    emit = (t_live[:, None] & s_live[None, :])
    a_vals = group_pattern(ga, inc)
    a_lens = jnp.where(emit, 2 * ga, 0)
    b_vals = group_pattern(gb, inc)
    b_lens = jnp.where(emit, 2 * gb, 0)
    z_vals = jnp.zeros((T, S), jnp.uint32)
    z_lens = jnp.where(emit, 1, 0)
    init_vals = lens_tab[:, 0].astype(jnp.uint32)
    init_lens = jnp.where(t_live, 5, 0)
    # interleave per table: init, then (A,B,term) per symbol
    per_sym = jnp.stack([a_vals, b_vals, z_vals], axis=2)   # [T, S, 3]
    per_sym_l = jnp.stack([a_lens, b_lens, z_lens], axis=2)
    t_vals = jnp.concatenate(
        [init_vals[:, None], per_sym.reshape(T, S * 3)], axis=1
    ).reshape(-1)
    t_lens = jnp.concatenate(
        [init_lens[:, None], per_sym_l.reshape(T, S * 3)], axis=1
    ).reshape(-1)

    # -- payload codewords --------------------------------------------------
    # One gather of a packed (word << 5 | len) table halves the dominant
    # random-access cost (gathers are the priciest primitive here).
    words_tab = canonical_words(lens_tab, num_syms)         # [T, S]
    packed_tab = (words_tab << 5) | lens_tab                # word<2^17,len<32
    pos = jnp.arange(M, dtype=jnp.int32)
    live = pos < out_len
    sym_c = jnp.where(live, jnp.minimum(syms, S - 1), 0)
    # Static 50x repeat instead of a full-width gather (nseg*50 >= M).
    sel_per_sym = jnp.repeat(selectors, SEGMENT_WIDTH)[:M]
    packed = packed_tab.reshape(-1)[sel_per_sym * S + sym_c]
    p_vals = (packed >> 5).astype(jnp.uint32)
    p_lens = jnp.where(live, packed & 31, 0)

    vals = jnp.concatenate([h_vals, s_vals, t_vals, p_vals])
    lens = jnp.concatenate([h_lens, s_lens, t_lens, p_lens])
    return vals, lens

"""Pallas TPU kernel for the within-chunk MTF shuffle.

The chunk-parallel MTF (ops/mtf.py) runs a K-step sequential shuffle over a
256-entry recency state per chunk.  In plain XLA every step round-trips the
state through HBM; this kernel keeps the state resident in VMEM for all K
steps and streams chunk tiles through a sequential grid, so the inner loop
is pure VPU work (compare, masked-max, sublane roll, select).

Layout: everything is *transposed* — state is int32 [256, TC] (symbol slot
= sublane, chunk = lane; Mosaic's dynamic rotate requires 32-bit data) and
the symbol stream is [K, TC] — because Mosaic only allows dynamic indexing
on the sublane dimension, and it makes the per-step reduction a cheap
sublane reduce.  The -1 padding sentinel never matches any byte value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = 256
_TC = 1024        # chunk columns per grid tile


def _make_kernel(debug_checks: bool):
    """Build the MTF kernel; with ``debug_checks`` it also emits a
    per-column error bitmask (SURVEY §5 sanitizer analog — the in-kernel
    invariant checks run in tests via ``mtf_shuffle_pallas(...,
    debug_checks=True)`` and are absent from the bench's compiled kernel):

      bit 0 — a valid symbol missed every state slot (state corrupted);
      bit 1 — a valid symbol hit more than one slot (state not a
              permutation of byte values).
    """

    def kernel(syms_ref, state0_ref, out_ref, *rest):
        if debug_checks:
            err_ref, state = rest
            err_ref[:] = jnp.zeros_like(err_ref)
        else:
            (state,) = rest
        K = syms_ref.shape[0]
        state[:] = state0_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (_S, state.shape[1]), 0)

        def step(t, _):
            s = syms_ref[pl.ds(t, 1), :]                # [1, TC] int32
            hit = state[:] == s                         # -1 pad never hits
            idx = jnp.max(jnp.where(hit, row, -1), axis=0, keepdims=True)
            out_ref[pl.ds(t, 1), :] = idx
            if debug_checks:
                valid_s = s >= 0
                miss = valid_s & (idx < 0)
                nhit = jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)
                dup = valid_s & (nhit > 1)
                err_ref[:] = (
                    err_ref[:] | miss.astype(jnp.int32)
                    | (dup.astype(jnp.int32) << 1)
                )
            rolled = pltpu.roll(state[:], shift=1, axis=0)
            insert = jnp.where(row == 0, s, rolled)
            keep = (row > idx) | (s < 0)
            state[:] = jnp.where(keep, state[:], insert)
            return 0

        jax.lax.fori_loop(0, K, step, 0)

    return kernel


def mtf_shuffle_pallas(
    syms_p: jax.Array,
    state0: jax.Array,
    interpret: bool = False,
    debug_checks: bool = False,
) -> jax.Array:
    """Run the MTF shuffle: syms_p int32 [C, K] (pad -1), state0 int32
    [C, 256] byte values.  Returns int32 [C, K] MTF indices.

    Columns are padded to the grid tile; padded columns carry -1 symbols
    (inert).  ``debug_checks`` compiles the in-kernel invariant checks in
    (see _make_kernel) and raises on any violation; the default kernel
    carries no check code at all.  The check readout concretizes the error
    mask, so ``debug_checks=True`` is for eager (test) use, not under jit.
    """
    C, K = syms_p.shape
    Cp = ((C + _TC - 1) // _TC) * _TC
    syms_t = jnp.full((K, Cp), -1, jnp.int32)
    syms_t = jax.lax.dynamic_update_slice(syms_t, syms_p.T, (0, 0))
    state_t = jnp.zeros((_S, Cp), jnp.int32)
    state_t = jax.lax.dynamic_update_slice(
        state_t, state0.astype(jnp.int32).T, (0, 0)
    )
    tile = pl.BlockSpec((K, _TC), lambda i: (0, i), memory_space=pltpu.VMEM)
    err_spec = pl.BlockSpec(
        (1, _TC), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_specs = [tile, err_spec] if debug_checks else tile
    out_shape = jax.ShapeDtypeStruct((K, Cp), jnp.int32)
    if debug_checks:
        out_shape = [out_shape, jax.ShapeDtypeStruct((1, Cp), jnp.int32)]
    res = pl.pallas_call(
        _make_kernel(debug_checks),
        grid=(Cp // _TC,),
        in_specs=[
            tile,
            pl.BlockSpec((_S, _TC), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((_S, _TC), jnp.int32)],
        interpret=interpret,
    )(syms_t, state_t)
    if debug_checks:
        out, err = res
        bad = int(jnp.max(jnp.abs(err[:, :C]))) if C else 0
        if bad:
            raise AssertionError(
                f"MTF kernel invariant violated (error bits {bad:#x}): "
                "recency state is not a byte permutation"
            )
        return out[:, :C].T
    return res[:, :C].T

"""Microbench: scatter+cummax forward-fill vs 2M-lane merge-sort fill.

rle2/bitpack place per-entry payloads at computed offsets and forward-fill
across slots.  Round 1 chose 1-key merge sorts over scatters based on
single-shot microbenches (scatter ~5-9 ms/M lanes); this re-measures both
under the production conditions (vmap x batch, 900K lanes) since batched
costs diverged from single-shot costs for gathers too.

Usage: python tools/scatter_vs_merge.py [batch]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    M = 917_504
    _BIG = jnp.int32(2**30)

    def merge_fill(off, payload, emit):
        # current pattern: concat (entry keys, slot keys), 1-key sort,
        # cummax forward fill, compact back.
        e_key = jnp.where(emit, off * 2, _BIG)
        pos = jnp.arange(M, dtype=jnp.int32)
        keys = jnp.concatenate([e_key, pos * 2 + 1])
        pays = jnp.concatenate([payload, jnp.zeros(M, jnp.int32)])
        k_s, p_s = jax.lax.sort((keys, pays), num_keys=1, is_stable=False)
        is_entry = (k_s & 1) == 0
        f = jnp.where(is_entry, (k_s >> 1 << 11) | (p_s & 0x7FF), -1)
        F = jax.lax.cummax(f, axis=0)
        s_key = jnp.where(is_entry | (k_s >= _BIG), _BIG, k_s >> 1)
        _, out = jax.lax.sort((s_key, F), num_keys=1, is_stable=False)
        return out[:M]

    def scatter_fill(off, payload, emit):
        # scatter entries at their offsets, then one cummax.
        tgt = jnp.where(emit, off, M)
        f0 = jnp.full(M + 1, -1, jnp.int32)
        f = f0.at[tgt].set(
            jnp.where(emit, (off << 11) | (payload & 0x7FF), -1),
            mode="drop",
        )[:M]
        return jax.lax.cummax(f, axis=0)

    rng = np.random.default_rng(0)
    emit = rng.random((B, M)) < 0.5
    off_np = np.where(
        emit, np.cumsum(emit, axis=1) * 2 - 1, 0
    ).astype(np.int32)
    off_np = np.minimum(off_np, M - 1)
    pay = rng.integers(0, 2047, (B, M)).astype(np.int32)

    off_d = jnp.asarray(off_np)
    pay_d = jnp.asarray(pay)
    emit_d = jnp.asarray(emit)

    mf = jax.jit(jax.vmap(merge_fill))
    sf = jax.jit(jax.vmap(scatter_fill))

    for name, fn in [("merge", mf), ("scatter", sf)]:
        out = fn(off_d, pay_d, emit_d)
        np.asarray(out[0, :4])
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(off_d, pay_d, emit_d)
            np.asarray(out[0, :4])
        dt = (time.perf_counter() - t0) / 4
        print(f"{name}: {dt * 1000:.1f} ms/batch = {dt / B * 1000:.2f} ms/block")


if __name__ == "__main__":
    main()

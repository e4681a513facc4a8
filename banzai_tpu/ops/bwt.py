"""Wrap-around BWT on device: cyclic prefix-doubling rotation sort.

The reference computes the cyclic BWT by running sequential SA-IS over the
doubled input (lib/bwt.rs:526-756) — pointer-chasing induced sorting that
cannot map onto a TPU.  The TPU-native design sorts the n *rotations*
directly by prefix doubling (Manber–Myers): O(log n) rounds of
sort-by-(rank, rank-shifted-k) + rank relabeling, where every round is a
batched XLA sort plus elementwise scans — exactly the shape XLA compiles
well.  No doubled input is needed: the cyclic shift ``(i + k) mod n``
realizes rotation comparison exactly.

Rotation ties (periodic inputs, where ranks never become distinct) are
harmless: identical rotations contribute identical BWT characters
(SURVEY.md §2.3), so the loop can stop at k >= n.

Shapes are static: blocks are padded to capacity N; padded positions get
rank +inf so they sort behind every real rotation and never disturb them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PAD_RANK = jnp.int32(2**30)


@jax.jit
def bwt_rotations(block: jax.Array, n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Compute the wrap-around BWT of ``block[:n]``.

    Args:
      block: uint8[N] padded block (N static).
      n: int32 true length (1 <= n <= N).
    Returns:
      (bwt uint8[N] — first ``n`` entries valid, ptr int32).
    """
    N = block.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    rank = jnp.where(valid, block.astype(jnp.int32), _PAD_RANK)

    def shift_rank(rank: jax.Array, k: jax.Array) -> jax.Array:
        # rank of rotation (i + k) mod n; padded lanes stay +inf.
        j = idx + k
        j = jnp.where(j >= n, j - n, j)          # k < n on every round
        j = jnp.where(valid, j, 0)               # keep gathers in bounds
        return jnp.where(valid, rank[j], _PAD_RANK)

    def round_body(state):
        k, rank, _done = state
        r2 = shift_rank(rank, k)
        # Single sort, two keys: lexicographic (rank, r2) with idx payload.
        r1s, r2s, order = jax.lax.sort((rank, r2, idx), num_keys=2)
        changed = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(
                    jnp.int32
                ),
            ]
        )
        new_rank_sorted = jnp.cumsum(changed)
        new_rank = jnp.zeros(N, jnp.int32).at[order].set(new_rank_sorted)
        new_rank = jnp.where(valid, new_rank, _PAD_RANK)
        distinct = new_rank_sorted[jnp.maximum(n - 1, 0)] == n - 1
        return (k * 2, new_rank, distinct | (k * 2 >= n))

    def cond(state):
        _k, _rank, done = state
        return ~done

    state = (jnp.int32(1), rank, n <= 1)
    _, rank, _ = jax.lax.while_loop(cond, round_body, state)

    # Final order: ranks are unique on real lanes (or tied identical
    # rotations, any order valid); padded lanes sort last.
    _, order = jax.lax.sort((rank, idx), num_keys=1)
    prev = jnp.where(order == 0, n - 1, order - 1)   # (i + n - 1) mod n
    bwt = block[prev]
    ptr = jnp.argmax(order == 0).astype(jnp.int32)
    return bwt, ptr

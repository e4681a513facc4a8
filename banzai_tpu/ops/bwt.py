"""Wrap-around BWT on device: cyclic prefix-doubling rotation sort.

The reference computes the cyclic BWT by running sequential SA-IS over the
doubled input (lib/bwt.rs:526-756) — pointer-chasing induced sorting that
cannot map onto a TPU.  The TPU-native design sorts the n *rotations*
directly by prefix doubling (Manber–Myers): O(log n) rounds of
sort-by-(rank, rank-shifted-k) + rank relabeling, where every round is a
batched XLA sort plus elementwise scans — exactly the shape XLA compiles
well.  No doubled input is needed: the cyclic shift ``(i + k) mod n``
realizes rotation comparison exactly.

TPU-specific engineering:
  * the ``(i+k) mod n`` access is two contiguous dynamic slices, not a
    gather (gathers are the most expensive primitive on this hardware);
  * inverse permutations are key-sorts, not scatters;
  * round 1 sorts packed 3-byte keys on both lanes, so doubling starts at
    k = 6 (two rounds saved);
  * the sorted order is carried through the loop — the final relabel
    needs no extra sort.

Rotation ties (periodic inputs, where ranks never become distinct) are
harmless: identical rotations contribute identical BWT characters
(SURVEY.md §2.3), so the loop stops at k >= n.

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
    zeros = jnp.zeros(N, jnp.int32)

    def cyc_shift(arr: jax.Array, k: jax.Array) -> jax.Array:
        # arr[(i + k) mod n] for i < n.  Two contiguous dynamic slices
        # replace a full-width gather; k is reduced mod n so any shift
        # amount is cyclically correct.
        k = jnp.where(n > 0, k % n, 0)
        ext = jnp.concatenate([arr, zeros])
        lo = jax.lax.dynamic_slice(ext, (jnp.maximum(k, 0),), (N,))
        ext2 = jnp.concatenate([zeros, arr])
        start = jnp.clip(N - (n - k), 0, N)
        hi = jax.lax.dynamic_slice(ext2, (start,), (N,))
        r2 = jnp.where(idx < n - k, lo, hi)
        return jnp.where(valid, r2, _PAD_RANK)

    b = jnp.where(valid, block.astype(jnp.int32), 0)
    pack3 = (b << 16) | (cyc_shift(b, 1) & 0xFF) << 8 | (cyc_shift(b, 2) & 0xFF)
    rank0 = jnp.where(valid, pack3, _PAD_RANK)

    def round_body(state):
        # Quadrupling rounds: sort by ranks at offsets (0, k, 2k, 3k), so
        # each round extends the compared prefix 4x — half the rounds of
        # classic doubling, and sorts dominate the round cost.
        k, rank, _order, ngroups, _done = state
        r2 = cyc_shift(rank, k)
        r3 = cyc_shift(rank, 2 * k)
        r4 = cyc_shift(rank, 3 * k)
        s1, s2, s3, s4, order = jax.lax.sort(
            (rank, r2, r3, r4, idx), num_keys=4
        )
        diff = (
            (s1[1:] != s1[:-1])
            | (s2[1:] != s2[:-1])
            | (s3[1:] != s3[:-1])
            | (s4[1:] != s4[:-1])
        )
        changed = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), diff.astype(jnp.int32)]
        )
        new_rank_sorted = jnp.cumsum(changed)
        # Inverse permutation via key sort (scatters are slower on TPU).
        _, new_rank = jax.lax.sort((order, new_rank_sorted), num_keys=1)
        new_rank = jnp.where(valid, new_rank, _PAD_RANK)
        ng2 = new_rank_sorted[jnp.maximum(n - 1, 0)] + 1
        distinct = ng2 == n
        # Fixpoint: a round that splits no group can never split one later
        # (remaining ties are identical rotations — periodic input), so
        # stop instead of doubling k all the way to n.
        stalled = ng2 == ngroups
        k4 = k * 4
        return (k4, new_rank, order, ng2, distinct | stalled | (k4 >= n))

    # Round 1 unconditionally (keys: 3-byte packs at 0/3/6/9 -> k=12).
    state = round_body((jnp.int32(3), rank0, idx, jnp.int32(-1), False))
    _, rank, _, _, _ = jax.lax.while_loop(
        lambda s: ~s[4], round_body, state
    )

    # Extract the BWT column by sorting the preceding-byte payload by final
    # rank — one key sort instead of a full-width random gather.  Tied
    # (identical) rotations carry identical preceding bytes, so unstable
    # tie order is harmless; ptr may point at any row of rotation 0's tie
    # group (all rows are identical strings).
    prev_byte = cyc_shift(b, n - 1)
    _, bwt_sorted = jax.lax.sort((rank, prev_byte), num_keys=1)
    bwt = bwt_sorted.astype(jnp.uint8)
    ptr = jnp.sum(((rank < rank[0]) & valid).astype(jnp.int32))
    return bwt, ptr

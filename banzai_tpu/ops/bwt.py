"""Wrap-around BWT on device: cyclic prefix-doubling rotation sort.

The reference computes the cyclic BWT by running sequential SA-IS over the
doubled input (lib/bwt.rs:526-756) — pointer-chasing induced sorting that
cannot map onto a TPU.  The TPU-native design sorts the n *rotations*
directly by prefix doubling (Manber–Myers): O(log n) rounds of
sort-by-shifted-ranks + rank relabeling, where every round is a batched XLA
sort plus elementwise scans — exactly the shape XLA compiles well.  No
doubled input is needed: the cyclic shift ``(i + k) mod n`` realizes
rotation comparison exactly.

TPU-specific engineering:
  * the ``(i+k) mod n`` access is two contiguous dynamic slices, not a
    gather (gathers are the most expensive primitive on this hardware);
  * inverse permutations are key-sorts, not scatters;
  * round 1 sorts packed 3-byte keys on four lanes, so quadrupling starts
    at k = 12; each later round sorts ranks at offsets (0, k, 2k, 3k) —
    half the rounds of classic doubling;
  * ranks are *positional* (Larsson–Sadakane style: a rank is the SA slot
    of its group head), which lets a narrow phase-2 loop refine only the
    unresolved lanes once they fit a quarter-width buffer;
  * a round that splits no group is a fixpoint (remaining ties are
    identical rotations — periodic input), so the loop exits early
    instead of doubling k all the way to n.

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
    N4 = max(N // 8, 1024)
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

    def relabel(diffs: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Positional ranks from a sorted-neighbor difference mask.

        Returns (rank_sorted, ngroups, unresolved) over the valid region.
        """
        is_head = jnp.concatenate([jnp.ones(1, bool), diffs])
        head_pos = jax.lax.cummax(
            jnp.where(is_head, idx, -1), axis=0
        )
        vmask = valid  # sorted valid lanes are exactly the first n
        ngroups = jnp.sum((is_head & vmask).astype(jnp.int32))
        nxt_head = jnp.concatenate([is_head[1:], jnp.ones(1, bool)])
        singleton = is_head & nxt_head & vmask
        unresolved = n - jnp.sum(singleton.astype(jnp.int32))
        return head_pos, ngroups, unresolved

    def round_body(state):
        k, rank, ngroups, _unres, _done = state
        r2 = cyc_shift(rank, k)
        r3 = cyc_shift(rank, 2 * k)
        r4 = cyc_shift(rank, 3 * k)
        s1, s2, s3, s4, order = jax.lax.sort(
            (rank, r2, r3, r4, idx), num_keys=4
        )
        diffs = (
            (s1[1:] != s1[:-1])
            | (s2[1:] != s2[:-1])
            | (s3[1:] != s3[:-1])
            | (s4[1:] != s4[:-1])
        )
        new_rank_sorted, ng2, unres = relabel(diffs)
        # Inverse permutation via key sort (scatters are slower on TPU).
        _, new_rank = jax.lax.sort((order, new_rank_sorted), num_keys=1)
        new_rank = jnp.where(valid, new_rank, _PAD_RANK)
        distinct = ng2 == n
        stalled = ng2 == ngroups
        k4 = k * 4
        done = distinct | stalled | (k4 >= n)
        return (k4, new_rank, ng2, unres, done)

    # Round 1 unconditionally (keys: 3-byte packs at 0/3/6/9 -> k=12).
    state = round_body((jnp.int32(3), rank0, jnp.int32(-1), n, False))
    k, rank, ngroups, unres, done = jax.lax.while_loop(
        lambda s: ~s[4] & (s[3] > N4), round_body, state
    )

    # ---- Phase 2: refine only the unresolved lanes (fit in N4). ----------
    def phase2(args):
        k, rank, ngroups = args
        # Recover SA order and group structure, then compact unresolved
        # lanes (whole groups are unresolved together).
        r_s, ord_s = jax.lax.sort((rank, idx), num_keys=1)
        nxt_same = jnp.concatenate(
            [r_s[1:] == r_s[:-1], jnp.zeros(1, bool)]
        )
        multi = (r_s != idx) | nxt_same          # group size > 1
        unres_lane = multi & valid
        ckey = jnp.where(unres_lane, idx, _PAD_RANK)
        ck_s, c_pos, c_head = jax.lax.sort((ckey, ord_s, r_s), num_keys=1)
        c_pos = c_pos[:N4]
        c_head = jnp.where(ck_s[:N4] < _PAD_RANK, c_head[:N4], _PAD_RANK)
        j2 = jnp.arange(N4, dtype=jnp.int32)

        def p2_body(st):
            k, rank, c_pos, c_head, ngroups, _done = st
            live = c_head < _PAD_RANK
            ext = jnp.concatenate([rank, jnp.zeros(1, jnp.int32)])

            def shifted(mult):
                j = c_pos + mult * k
                j = jnp.where(n > 0, j % n, 0)
                j = jnp.where(live, j, N)
                return jnp.where(live, ext[j], _PAD_RANK)

            g2 = shifted(1)
            g3 = shifted(2)
            g4 = shifted(3)
            h_s, k2_s, k3_s, k4_s, p_s = jax.lax.sort(
                (c_head, g2, g3, g4, c_pos), num_keys=4
            )
            grp_change = jnp.concatenate(
                [jnp.zeros(1, bool), h_s[1:] != h_s[:-1]]
            )
            sub_change = grp_change | jnp.concatenate(
                [
                    jnp.zeros(1, bool),
                    (k2_s[1:] != k2_s[:-1])
                    | (k3_s[1:] != k3_s[:-1])
                    | (k4_s[1:] != k4_s[:-1]),
                ]
            )
            grp_start = jax.lax.cummax(
                jnp.where(grp_change | (j2 == 0), j2, -1), axis=0
            )
            sub_start = jax.lax.cummax(
                jnp.where(sub_change | (j2 == 0), j2, -1), axis=0
            )
            live_s = h_s < _PAD_RANK
            new_head = jnp.where(live_s, h_s + (sub_start - grp_start),
                                 _PAD_RANK)
            # Scatter refined ranks back into the full rank array.
            tgt = jnp.where(live_s, p_s, N)
            rank2 = (
                jnp.concatenate([rank, jnp.zeros(1, jnp.int32)])
                .at[tgt]
                .set(jnp.where(live_s, new_head, 0))[:N]
            )
            rank2 = jnp.where(valid, rank2, _PAD_RANK)
            # Group accounting within the compact buffer.
            nsub = jnp.sum(((sub_change | (j2 == 0)) & live_s).astype(jnp.int32))
            nlanes = jnp.sum(live_s.astype(jnp.int32))
            distinct = nsub == nlanes
            stalled = nsub == ngroups
            k4x = k * 4
            done = distinct | stalled | (k4x >= n)
            return (k4x, rank2, p_s, new_head, nsub, done)

        st = (k, rank, c_pos, c_head, jnp.int32(-1), unres == 0)
        _, rank, _, _, _, _ = jax.lax.while_loop(
            lambda s: ~s[5], p2_body, st
        )
        return rank

    rank = jax.lax.cond(
        done, lambda a: a[1], phase2, (k, rank, ngroups)
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

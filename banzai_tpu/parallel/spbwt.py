"""Within-block sharded BWT: one block's rotation sort across a device mesh.

SURVEY.md §5's "long-context" stretch axis: the reference's sequential
suffix sort (lib/bwt.rs:526-756) has no scaling story beyond one core; the
block-DP layer (parallel/dp.py) scales across *blocks* but a single block's
sort still lives on one chip.  This module shards ONE block's rotation
sort lane-wise over a 1-D ``('lanes',)`` mesh with XLA collectives:

  * each device owns a contiguous shard of rotation indices;
  * every doubling round builds its (rank, shifted-rank) keys locally from
    a replicated rank array (one all_gather per round — O(N) bytes on ICI,
    which at ~100 GB/s is noise next to the sort FLOPs);
  * the global sort is an **odd-even merge-split of shards**: D rounds of
    pairwise shard exchange (ppermute) + local 3-operand merge sorts — the
    block-level odd-even transposition sort (by the 0-1 principle, D
    merge-split rounds over D locally-sorted blocks sort the whole array);
  * rank relabeling crosses shard boundaries with 1-hop ppermutes (the
    neighbours' boundary keys) and a D-scalar all_gather carry (group
    heads are a prefix-max, which composes associatively across shards);
  * termination is a global psum of unresolved lanes.

Honest perf model: bzip2 blocks are <= 900 KB (level 9), which fits one
chip's HBM ~100x over, and XLA's bitonic sort costs O(n log^2 n) whether
it runs whole on one chip or as 2m-wide merge-splits — so for *this*
format the block-DP axis is strictly better and this path is a capability
demonstration, validated byte-identical against ops.bwt.bwt_rotations on
the virtual 8-device CPU mesh (tests/test_spbwt.py).  The design transfers
unchanged to inputs that genuinely exceed one chip (the real long-context
case): shard size m = N/D is what bounds per-device memory, and all
cross-device traffic (ppermute shard pairs + one all_gather per round)
rides ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_PAD = np.uint32(0xFFFFFFFF)  # padded-lane key; np scalar: no device put at import


def lane_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.local_devices()
    return Mesh(np.asarray(devices), ("lanes",))


def _merge_split_sort(ops, axis: str, D: int, num_keys: int):
    """Globally sort equal-shape shard tuples ``ops`` over mesh axis ``axis``.

    Odd-even transposition over shards: every round, paired devices
    exchange shards (ppermute), both sort the 2m concatenation, the lower
    device keeps the lower half, the upper the upper half.  After D rounds
    the concatenation of shards in device order is globally sorted.  Shards
    must enter locally sorted (round 0's local sort is the caller's).
    """
    m = ops[0].shape[0]
    me = jax.lax.axis_index(axis)

    for r in range(D):
        if r % 2 == 0:
            partner_of = [d ^ 1 for d in range(D)]
        else:
            partner_of = [d - 1 if d % 2 == 0 else d + 1 for d in range(D)]
        perm = [(d, p) for d, p in enumerate(partner_of) if 0 <= p < D]
        if not perm:
            continue
        recv = [jax.lax.ppermute(op, axis, perm) for op in ops]
        partner = jnp.asarray(partner_of, jnp.int32)[me]
        paired = (partner >= 0) & (partner < D)
        keep_low = paired & (me < partner)
        keep_high = paired & (me > partner)
        # Both partners MUST sort the identical 2m sequence (lower shard
        # first): with tied keys an unstable sort may order payloads
        # differently for different concatenation orders, and the two
        # kept halves would no longer partition the pair's lanes.
        merged = jax.lax.sort(
            tuple(
                jnp.concatenate(
                    [
                        jnp.where(keep_low, a, b),
                        jnp.where(keep_low, b, a),
                    ]
                )
                for a, b in zip(ops, recv)
            ),
            num_keys=num_keys,
            is_stable=False,
        )
        ops = tuple(
            jnp.where(
                keep_low,
                jax.lax.slice_in_dim(mg, 0, m),
                jnp.where(
                    keep_high, jax.lax.slice_in_dim(mg, m, 2 * m), op
                ),
            )
            for op, mg in zip(ops, merged)
        )
    return ops


def _carry_max(local_last: jax.Array, axis: str, D: int) -> jax.Array:
    """Exclusive prefix-max over devices of a per-device int32 scalar."""
    allv = jax.lax.all_gather(local_last, axis)  # [D]
    me = jax.lax.axis_index(axis)
    mask = jnp.arange(D) < me
    return jnp.max(jnp.where(mask, allv, jnp.int32(-1)))


def _edge(x_slice: jax.Array, axis: str, perm, active, fill) -> jax.Array:
    """A 1-element shard-boundary exchange; ``fill`` where not receiving."""
    got = jax.lax.ppermute(x_slice, axis, perm)
    return jnp.where(active, got[0], jnp.asarray(fill, x_slice.dtype))


@partial(jax.jit, static_argnames=("mesh",))
def bwt_rotations_sharded(
    block: jax.Array, n: jax.Array, *, mesh: Mesh
) -> tuple[jax.Array, jax.Array]:
    """Wrap-around BWT of ``block[:n]`` with the sort sharded over ``mesh``.

    Same contract as ops.bwt.bwt_rotations: uint8[N] padded block (N must
    be a multiple of the mesh size), int32 true length (1 <= n <= N);
    returns (bwt uint8[N] — first n entries valid, ptr int32), byte-
    identical to the single-chip path.
    """
    N = block.shape[0]
    D = mesh.devices.size
    assert N % D == 0, "padded block length must divide the lane mesh"
    m = N // D
    right_perm = [(d, d + 1) for d in range(D - 1)]  # d's tail -> d+1
    left_perm = [(d + 1, d) for d in range(D - 1)]   # d+1's head -> d

    def shard_fn(block_rep, n):
        n = n[0]
        me = jax.lax.axis_index("lanes")
        idx = me * m + jnp.arange(m, dtype=jnp.int32)
        valid = idx < n
        gslot = idx  # global sorted-slot ids for this device's shard
        b32 = block_rep.astype(jnp.uint32)

        def bref(off):
            # block[(idx + off) mod n]: local gather of m lanes from the
            # replicated block.
            j = jnp.where(n > 0, (idx + off) % n, 0)
            return b32[j]

        def relabel(k1, k2):
            """Positional ranks for sorted shards (rank = global slot of
            the group head), the global unresolved-lane count, and the
            global multi-group count (groups of size >= 2)."""
            pk1 = jnp.concatenate(
                [_edge(k1[-1:], "lanes", right_perm, me > 0, _PAD)[None],
                 k1[:-1]]
            )
            pk2 = jnp.concatenate(
                [_edge(k2[-1:], "lanes", right_perm, me > 0, 0)[None],
                 k2[:-1]]
            )
            is_head = (k1 != pk1) | (k2 != pk2) | (gslot == 0)
            local_head = jax.lax.cummax(
                jnp.where(is_head, gslot, -1), axis=0
            )
            carry = _carry_max(local_head[-1], "lanes", D)
            rank_sorted = jnp.maximum(local_head, carry)
            nk1 = jnp.concatenate(
                [k1[1:],
                 _edge(k1[:1], "lanes", left_perm, me < D - 1, _PAD)[None]]
            )
            nk2 = jnp.concatenate(
                [k2[1:],
                 _edge(k2[:1], "lanes", left_perm, me < D - 1, 0)[None]]
            )
            lane_valid = k1 != _PAD
            tied = lane_valid & (
                ((k1 == pk1) & (k2 == pk2)) | ((k1 == nk1) & (k2 == nk2))
            )
            unres = jax.lax.psum(jnp.sum(tied.astype(jnp.int32)), "lanes")
            groups = jax.lax.psum(
                jnp.sum((is_head & tied).astype(jnp.int32)), "lanes"
            )
            return rank_sorted, unres, groups

        def replicate_rank(sidx, rank_sorted):
            # all_gather the (idx, rank) pairs, scatter into idx order.
            # O(N) received + an O(N) local scatter per round: the price
            # of keeping every shifted-rank lookup local.
            gi = jax.lax.all_gather(sidx, "lanes").reshape(-1)
            gr = jax.lax.all_gather(rank_sorted, "lanes").reshape(-1)
            return jnp.zeros(N, jnp.int32).at[gi].set(gr)

        # ---- Round 0: 3-byte packed prefix --------------------------------
        key0 = jnp.where(
            valid, (bref(0) << 16) | (bref(1) << 8) | bref(2), _PAD
        )
        zero_k = jnp.zeros_like(key0)
        k1, k2, sidx = jax.lax.sort(
            (key0, zero_k, idx), num_keys=2, is_stable=False
        )
        k1, k2, sidx = _merge_split_sort(
            (k1, k2, sidx), "lanes", D, num_keys=2
        )
        rank_sorted, unres, groups = relabel(k1, k2)
        rank_rep = replicate_rank(sidx, rank_sorted)

        # ---- Doubling rounds ----------------------------------------------
        def body(state):
            k, _rank_rep, _sidx, unres, groups, _cont = state
            r0 = jnp.where(
                valid,
                jax.lax.dynamic_slice(_rank_rep, (me * m,), (m,))
                .astype(jnp.uint32),
                _PAD,
            )
            j = jnp.where(n > 0, (idx + k) % n, 0)
            r1 = jnp.where(valid, _rank_rep[j], 0).astype(jnp.uint32)
            s1, s2, sidx = jax.lax.sort(
                (r0, r1, idx), num_keys=2, is_stable=False
            )
            s1, s2, sidx = _merge_split_sort(
                (s1, s2, sidx), "lanes", D, num_keys=2
            )
            rank_sorted, unres2, groups2 = relabel(s1, s2)
            rank_rep2 = replicate_rank(sidx, rank_sorted)
            k2x = k * 2
            # Stalled <=> no lane resolved AND no tie group split (a round
            # can split a group into smaller multi-groups without changing
            # the lane count — progress the count alone misses; see the
            # single-chip guard in ops/bwt.py full_round).  Then remaining
            # ties are identical rotations (periodic input): done.
            stalled = (unres2 == unres) & (groups2 == groups)
            done = (unres2 == 0) | stalled | (k2x >= n)
            return (
                k2x, rank_rep2, sidx, unres2, groups2,
                jnp.where(done, 0, 1).astype(jnp.int32),
            )

        cont0 = jnp.where((unres == 0) | (3 >= n), 0, 1).astype(jnp.int32)
        state = (jnp.int32(3), rank_rep, sidx, unres, groups, cont0)
        state = jax.lax.while_loop(lambda s: s[5] > 0, body, state)
        _, rank_rep, sidx, _, _, _ = state

        # ---- Extraction ----------------------------------------------------
        # The final sorted-slot shards order the rotations; identical-
        # rotation ties carry identical preceding bytes, so tie order in
        # sidx is harmless.  ptr: positional ranks ARE sorted slots, so
        # rotation 0's slot is just its rank.
        pj = jnp.where(n > 0, (sidx + n - 1) % n, 0)
        bwt_shard = jnp.where(sidx < n, block_rep[pj], 0).astype(jnp.uint8)
        ptr = rank_rep[0]
        return bwt_shard, ptr[None]

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P("lanes"), P("lanes")),
        check_vma=False,
    )
    bwt, ptrs = sharded(block, jnp.broadcast_to(n, (D,)))
    return bwt, ptrs[0]

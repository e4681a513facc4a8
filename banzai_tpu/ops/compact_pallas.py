"""Stream compaction as a Pallas kernel — round-5 prototype, OFF the hot
path (nothing imports this from the pipeline yet).

Why: several device stages pay a full bitonic sort purely to COMPACT a
masked subset to the front (the BWT tier entry's ckey sort, the rle2
merge's implicit entry packing, the bitpack query extraction).  A sort
moves ~30x the data of the single pass the job needs.  The TPU grid is
SEQUENTIAL, which makes one-pass compaction expressible:

  * per tile, the positions of the masked lanes are recovered with a
    rank trick: lane i's output rank inside the tile is
    cumsum(mask)[i] - 1, and the i-th kept element's source lane is
    found by comparing ranks against an iota — a [T, T/8-free]
    compare+sum, then a same-shape axis-0 ``take_along_axis`` (Mosaic
    ``dynamic_gather``; extent = the tile height, well inside support);
  * the tile writes its FULL buffer (kept lanes first, garbage tail) to
    the output at the running base offset (the exclusive cumsum of
    per-tile keep counts, precomputed outside the kernel — one tiny
    XLA cumsum over n_tiles scalars).  The sequential grid guarantees
    tile t+1's write lands exactly where tile t's garbage began, so
    later tiles overwrite earlier garbage and only the global tail past
    the total count is padding.

Net: one read + ~one write of the stream vs a sort's ~30 passes.  The
same skeleton extends to the two-pointer merges (rle2 digit expansion,
bitpack word assembly) by carrying a covering-entry state in scratch.

Status: CORRECTNESS PROTOTYPE — validated in interpreter mode
(tests/test_compact_pallas.py).  Mosaic findings so far (2026-08-20):
1-D ``jnp.cumsum`` has no TC lowering (now a triangular compare-sum);
direct stores to ANY/HBM are rejected (now an in-step async copy);
the remaining blocker is the [T, T] 1-D-layout intermediates — the
remote compile helper 500s on them, so the tile internals need a
(sublane, lane)-shaped reformulation (e.g. [T/128, 128] rank tiles +
``dynamic_gather`` selection) before on-chip timing.  Production
wiring is round-5 work.  Reference seed: this replaces sort-based
compaction, which the reference never needed (sequential code compacts
for free; SURVEY.md §7 "variable-length everything under static
shapes").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128


def _compact_tile_kernel(mask_ref, pay_ref, base_ref, out_ref,
                         buf_ref, sem_ref):
    """One grid step: pack this tile's masked lanes to the front and
    write the whole tile at the running output base.

    mask_ref: int32 [T] (0/1); pay_ref: int32 [T]; base_ref: int32
    [n_tiles] exclusive cumsum of keep counts (scalar-prefetch-style
    small array in VMEM); out_ref: int32 [N] in ANY/HBM, written with a
    dynamic offset.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    T = mask_ref.shape[0]
    m = mask_ref[:]
    pay = pay_ref[:]
    # rank[i] = #kept lanes strictly before i (exclusive prefix sum).
    # 1-D cumsum has no Mosaic TC lowering, so it rides the same [T, T]
    # triangular compare-sum the selection below needs anyway.
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    ranks = jnp.sum(
        jnp.where(i_ids < r_ids, m[None, :], 0), axis=1
    )                                                       # [T]
    # packed[r] = payload of the r-th kept element: the unique i with
    # mask[i] == 1 and rank[i] == r.  Everything stays in registers
    # (T <= 512 here).
    hit = (ranks[None, :] == r_ids) & (m[None, :] == 1)
    packed = jnp.sum(
        jnp.where(hit, pay[None, :], 0), axis=1
    )                                                       # [T]
    # HBM writes go through an explicit DMA (direct stores are VMEM/SMEM
    # only).  The copy is awaited in-step: the NEXT tile's write
    # overlaps this tile's garbage tail, so completion order matters.
    buf_ref[:] = packed
    copy = pltpu.make_async_copy(
        buf_ref, out_ref.at[pl.ds(base_ref[t], T)], sem_ref
    )
    copy.start()
    copy.wait()


@partial(jax.jit, static_argnames=("tile", "interpret"))
def compact_stream(
    mask: jax.Array, payload: jax.Array, *, tile: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Pack ``payload[mask]`` to the front of a same-length buffer.

    Returns (packed int32 [N] — first ``count`` lanes valid, garbage
    beyond — and ``count``).  One sequential-grid pass; see module
    docstring.  ``N`` must be a multiple of ``tile``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = mask.shape[0]
    assert N % tile == 0, (N, tile)
    n_tiles = N // tile
    m = mask.astype(jnp.int32)
    counts = jnp.sum(m.reshape(n_tiles, tile), axis=1)
    base = jnp.cumsum(counts) - counts                      # [n_tiles]
    count = jnp.sum(counts)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles,), lambda t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tile,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    packed = pl.pallas_call(
        _compact_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(m, payload.astype(jnp.int32), base)
    return packed, count

#!/usr/bin/env python
"""Per-stage device timing for the block pipeline (VERDICT r1 item 9).

Runs each pipeline stage as its own jit on a batch of real level-9 blocks
from the bench corpus and prints a JSON breakdown (ms per batch and per
block).  Timing rule for this environment: sync by fetching a small
reduction with np.asarray (block_until_ready does not reliably sync
through the axon relay).

Usage: python tools/profile_stages.py [--batch 8] [--reps 3]
bench.py also imports measure_stages() to embed the breakdown in its JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from banzai_tpu.constants import SEGMENT_WIDTH
from banzai_tpu.pipeline import _CHUNK, _nwords, _padded_len, _use_pallas
from banzai_tpu.rle1 import iter_blocks


def _time(fn, *args, reps: int) -> float:
    """Median wall ms of fn(*args); sync via a tiny fetched reduction."""
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(best))


def measure_stages(
    corpus: bytes, level: int = 9, batch: int = 8, reps: int = 3
) -> dict:
    """Per-stage device timings on a batch of real blocks from ``corpus``."""
    N = _padded_len(level)
    nseg = (N + 1 + SEGMENT_WIDTH - 1) // SEGMENT_WIDTH
    nwords = _nwords(N, nseg)
    B = batch

    blocks = []
    for blk in iter_blocks(corpus, level):
        blocks.append(blk)
        if len(blocks) == B:
            break
    arr = np.zeros((B, N), np.uint8)
    ns = np.ones(B, np.int32)
    pres = np.zeros((B, 256), bool)
    for i, blk in enumerate(blocks):
        arr[i, : len(blk.output)] = blk.output
        ns[i] = len(blk.output)
        pres[i] = np.bincount(blk.output, minlength=256) > 0

    from banzai_tpu.ops.bitpack import block_payload_entries, pack_entries
    from banzai_tpu.ops.bwt import bwt_rotations
    from banzai_tpu.ops.huffman import plan_entropy_device
    from banzai_tpu.ops.mtf import mtf_indices_device
    from banzai_tpu.ops.rle2 import rle2_device

    use_pallas = _use_pallas()
    dev_blocks = jnp.asarray(arr)
    dev_ns = jnp.asarray(ns)
    dev_pres = jnp.asarray(pres)

    # --- stage jits (each returns full outputs + a tiny checksum) ----------
    @jax.jit
    def st_bwt(b, n):
        bwt, ptr = jax.vmap(bwt_rotations)(b, n)
        return bwt, ptr, jnp.sum(ptr)

    @partial(jax.jit, static_argnames=("up",))
    def st_mtf(bwt, n, pres, up):
        idx = jax.vmap(
            partial(mtf_indices_device, chunk=_CHUNK, use_pallas=up)
        )(bwt, n, pres)
        return idx, jnp.sum(idx[:, 0])

    @jax.jit
    def st_rle2(idx, n, nn):
        syms, out_len, _ = jax.vmap(
            partial(rle2_device, with_freqs=False)
        )(idx, n, nn)
        return syms, out_len, jnp.sum(out_len)

    @partial(jax.jit, static_argnames=("nseg",))
    def st_plan(syms, out_len, num_syms, nseg):
        plan = jax.vmap(partial(plan_entropy_device, nseg=nseg))(
            syms, out_len, num_syms
        )
        return plan, jnp.sum(plan["total_bits"])

    @partial(jax.jit, static_argnames=("nwords",))
    def st_pack(syms, out_len, num_syms, plan, nwords):
        def one(s, ol, nsym, p):
            vals, lens = block_payload_entries(
                s, ol, nsym, p["num_tables"], p["tables"], p["selectors"],
                p["sel_mtf_idx"], p["nseg_used"],
            )
            return pack_entries(vals, lens, nwords)

        words, total = jax.vmap(one)(syms, out_len, num_syms, plan)
        return words, total, jnp.sum(total)

    num_names = jnp.sum(dev_pres.astype(jnp.int32), axis=1)
    num_syms = num_names + 2

    # Materialize stage inputs once (not timed), then time each stage.
    bwt, ptr, _ = st_bwt(dev_blocks, dev_ns)
    idx, _ = st_mtf(bwt, dev_ns, dev_pres, use_pallas)
    syms, out_len, _ = st_rle2(idx, dev_ns, num_names)
    plan, _ = st_plan(syms, out_len, num_syms, nseg)
    _ = st_pack(syms, out_len, num_syms, plan, nwords)

    t = {}
    t["bwt"] = _time(lambda: st_bwt(dev_blocks, dev_ns)[2], reps=reps)
    t["mtf"] = _time(
        lambda: st_mtf(bwt, dev_ns, dev_pres, use_pallas)[1], reps=reps
    )
    t["rle2"] = _time(lambda: st_rle2(idx, dev_ns, num_names)[2], reps=reps)
    t["plan"] = _time(
        lambda: st_plan(syms, out_len, num_syms, nseg)[1], reps=reps
    )
    t["bitpack"] = _time(
        lambda: st_pack(syms, out_len, num_syms, plan, nwords)[2],
        reps=reps,
    )

    total = sum(t.values())
    return {
        "backend": jax.default_backend(),
        "batch": B,
        "N": N,
        "per_batch_ms": {k: round(v, 1) for k, v in t.items()},
        "per_block_ms": {k: round(v / B, 2) for k, v in t.items()},
        "total_ms_per_block": round(total / B, 2),
        "implied_MBps_device": round(
            float(np.sum(ns)) / 1e6 / (total / 1e3), 2
        ),
        "out_len_mean": int(np.mean(np.asarray(out_len))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--level", type=int, default=9)
    args = ap.parse_args()

    from bench import build_corpus

    corpus = build_corpus()
    print(
        json.dumps(
            measure_stages(
                corpus, level=args.level, batch=args.batch, reps=args.reps
            )
        )
    )


if __name__ == "__main__":
    main()

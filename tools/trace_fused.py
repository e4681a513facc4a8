#!/usr/bin/env python
"""Trace the fused batch-encode jit on real bench blocks and print a
self-time-per-source-line breakdown (XProf source attribution).

The axon trace nests events (while-loop bodies inherit the loop's line),
so exclusive time is recovered with an interval-stack sweep.  Usage:

    python tools/trace_fused.py [--batch 8]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import shutil
import sys

sys.path.insert(0, ".")

import numpy as np

# Set by run_trace: measured jit wall per block (ms) — self-time sum plus
# per-op scheduling and the relay round trip.
LAST_FUSED_WALL_MS_PER_BLOCK: float = 0.0


def run_trace(batch: int, quiet: bool = False, level: int = 9) -> str:
    import jax
    import jax.numpy as jnp

    from bench import build_corpus
    from banzai_tpu.constants import SEGMENT_WIDTH
    from banzai_tpu.pipeline import (
        _ROW_EXTRA, _encode_blocks, _nwords, _padded_len, _use_pallas,
    )
    from banzai_tpu.rle1 import iter_blocks

    N = _padded_len(level)
    nseg = (N + 1 + SEGMENT_WIDTH - 1) // SEGMENT_WIDTH
    nwords = _nwords(N, nseg)
    corpus = build_corpus()
    blocks = []
    for blk in iter_blocks(corpus, level):
        blocks.append(blk)
        if len(blocks) == batch:
            break
    arr = np.zeros((batch, N + _ROW_EXTRA), np.uint8)
    for i, blk in enumerate(blocks):
        nb = len(blk.output)
        arr[i, :nb] = blk.output
        arr[i, N : N + 256] = np.bincount(blk.output, minlength=256) > 0
        arr[i, N + 256] = nb & 0xFF
        arr[i, N + 257] = (nb >> 8) & 0xFF
        arr[i, N + 258] = (nb >> 16) & 0xFF
    a = jnp.asarray(arr)

    def call():
        out = _encode_blocks(
            a, nseg=nseg, nwords=nwords, use_pallas=_use_pallas()
        )
        np.asarray(out[1])

    call()  # warm
    import time

    t0 = time.perf_counter()
    for _ in range(3):
        call()
    wall = (time.perf_counter() - t0) / 3 * 1000
    # The measured jit wall exceeds the trace's self-time sum by per-op
    # scheduling + the relay round trip; exported so the bench can report
    # the wall-vs-device ratio against the number a caller actually pays.
    global LAST_FUSED_WALL_MS_PER_BLOCK
    LAST_FUSED_WALL_MS_PER_BLOCK = wall / batch
    if not quiet:
        print(
            f"fused wall: {wall:.1f} ms/batch = {wall / batch:.2f} ms/block"
        )
    shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace"):
        call()
    return glob.glob("/tmp/jaxtrace/plugins/profile/*/vm.trace.json.gz")[0]


def stage_breakdown(path: str, batch: int, top: int = 12) -> dict:
    """Aggregate self-time per pipeline area (ms/block) from a trace."""
    import collections as _c

    agg, _ = _self_times(path)
    area: _c.Counter = _c.Counter()
    for k, v in agg.items():
        m = re.search(r"ops/(\w+)\.py", k)
        area[m.group(1) if m else "other"] += v
    return {
        k: round(v / batch / 1000, 2)
        for k, v in area.most_common(top)
    }


def _self_times(path: str):
    ev = json.load(gzip.open(path))["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M":
            key = (e.get("pid"), e.get("tid"), e["name"])
            names[key] = (e.get("args") or {}).get("name")
    ops = []
    for e in ev:
        if e.get("ph") != "X":
            continue
        tn = names.get((e.get("pid"), e.get("tid"), "thread_name"))
        if tn != "XLA Ops":
            continue
        ops.append((e["ts"], e["ts"] + e.get("dur", 0), e))
    ops.sort(key=lambda x: (x[0], -(x[1] - x[0])))
    import collections as _c

    self_time: _c.Counter = _c.Counter()
    cnt: _c.Counter = _c.Counter()
    stack: list = []
    for st, en, e in ops:
        while stack and stack[-1][1] <= st:
            stack.pop()
        args = e.get("args") or {}
        src = args.get("source") or e.get("name", "")
        if stack:
            pe = stack[-1][2]
            pargs = pe.get("args") or {}
            psrc = pargs.get("source") or pe.get("name", "")
            self_time[psrc] -= en - st
        self_time[src] += en - st
        cnt[src] += 1
        stack.append((st, en, e))
    agg: _c.Counter = _c.Counter()
    c2: _c.Counter = _c.Counter()
    for k, v in self_time.items():
        m = re.search(r"banzai_tpu/((?:ops/)?\w+\.py:\d+)", k)
        key = m.group(1) if m else "other:" + k.split("/")[-1][:40]
        agg[key] += v
        c2[key] += cnt[k]
    return agg, c2


def analyze(path: str, batch: int, top: int = 30) -> None:
    agg, c2 = _self_times(path)
    tot = sum(agg.values())
    print(f"total self: {tot / batch / 1000:.1f} ms/block")
    for k, v in agg.most_common(top):
        print(f"{v / batch / 1000:7.2f} ms/blk x{c2[k]:5d}  {k}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--level", type=int, default=9)
    ap.add_argument("--analyze-only", default=None)
    args = ap.parse_args()
    p = args.analyze_only or run_trace(args.batch, level=args.level)
    analyze(p, args.batch)

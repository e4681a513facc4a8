"""Trace a single bwt_rotations call on one content class.

Usage: python tools/bwt_trace_one.py [case] [level]
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, ".")

import numpy as np

from tools.bwt_cases import cases


def main() -> None:
    case = sys.argv[1] if len(sys.argv) > 1 else "text"
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    import jax
    import jax.numpy as jnp

    from banzai_tpu.ops.bwt import bwt_rotations
    from banzai_tpu.pipeline import _padded_len

    N = _padded_len(level)
    arr = cases(N - 64)[case]
    blk = np.zeros(N, np.uint8)
    blk[: len(arr)] = arr
    d = jnp.asarray(blk)
    n = jnp.int32(len(arr))
    bwt, _ = bwt_rotations(d, n)
    np.asarray(bwt[:8])

    shutil.rmtree("/tmp/jaxtrace1", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace1"):
        bwt, _ = bwt_rotations(d, n)
        np.asarray(jnp.sum(bwt.astype(jnp.int32)))

    path = glob.glob("/tmp/jaxtrace1/plugins/profile/*/vm.trace.json.gz")[0]
    ev = json.load(gzip.open(path))["traceEvents"]
    import collections

    agg = collections.Counter()
    cnt = collections.Counter()
    import re

    for e in ev:
        if e.get("ph") != "X" or "args" not in e:
            continue
        a = e["args"] or {}
        src = a.get("source") or ""
        name = e.get("name", "")
        key = src if src else name[:50]
        agg[key] += e.get("dur", 0)
        cnt[key] += 1
    tot = sum(agg.values())
    print(f"case {case}: total traced {tot/1000:.1f} ms")
    for k, v in agg.most_common(25):
        print(f"  {v/1000:8.1f} ms x{cnt[k]:4d}  {k}")


if __name__ == "__main__":
    main()

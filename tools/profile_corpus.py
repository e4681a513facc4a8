"""Profile compress() end-to-end on the wall_profile corpus with a JAX trace.

Usage: python tools/profile_corpus.py [mb] [level]
Prints wall, then device self-time per pipeline area from the trace, and
the top host-side gaps (trace covers device ops only; the difference is
host/tunnel).
"""

from __future__ import annotations

import glob
import shutil
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from tools.wall_profile import corpus


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    data = corpus(mb)

    import jax

    from banzai_tpu import compress
    from banzai_tpu.rle1 import split_blocks

    t0 = time.perf_counter()
    blocks = split_blocks(data, level)
    t_split = time.perf_counter() - t0
    print(f"RLE1 split: {len(blocks)} blocks in {t_split*1e3:.0f} ms; "
          f"post-RLE1 {sum(len(b.output) for b in blocks)} bytes")

    out = compress(data[: 4 << 20], level)      # warm compiles
    t0 = time.perf_counter()
    out = compress(data, level)
    wall = time.perf_counter() - t0
    print(f"warm wall {wall*1e3:.0f} ms  {mb/wall:.2f} MB/s  "
          f"compressed {len(out)}")

    shutil.rmtree("/tmp/jaxtrace2", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace2"):
        t0 = time.perf_counter()
        compress(data, level)
        wall = time.perf_counter() - t0
    print(f"traced wall {wall*1e3:.0f} ms")

    from tools.trace_fused import _self_times

    path = glob.glob("/tmp/jaxtrace2/plugins/profile/*/vm.trace.json.gz")[0]
    agg, c2 = _self_times(path)
    tot = sum(agg.values())
    print(f"device self total: {tot/1e3:.0f} ms  "
          f"(host+tunnel gap {wall*1e3 - tot/1e3:.0f} ms)")
    for k, v in agg.most_common(15):
        print(f"  {v/1e3:8.1f} ms x{c2[k]:5d}  {k}")


if __name__ == "__main__":
    main()

"""Wall-clock attribution for the end-to-end compress() path on the TPU.

Device self-time (tools/trace_fused.py) explains ~52 ms/block; wall is
~90 ms/block.  This tool times the host-side phases of the production
pipeline — RLE1 split + CRC, batch staging, dispatch, drain (nbits/ptrs
fetch, bucketed word fetch), bitstream splice — to attribute the gap.

Usage: python tools/wall_profile.py [mb] [level]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def corpus(mb: int) -> bytes:
    rng = np.random.default_rng(42)
    parts = []
    words = [rng.bytes(rng.integers(2, 9)) for _ in range(64)]
    while sum(map(len, parts)) < mb << 20:
        k = rng.integers(0, 4)
        if k == 0:
            parts.append(b" ".join(words[i] for i in rng.integers(0, 64, 4096)))
        elif k == 1:
            parts.append(bytes([int(rng.integers(0, 4))]) * int(rng.integers(1000, 300_000)))
        elif k == 2:
            p = rng.bytes(int(rng.integers(1, 9)))
            parts.append(p * int(rng.integers(1000, 100_000) // max(1, len(p))))
        else:
            parts.append(bytes(((np.arange(65536) * 37) & 0xFF).astype(np.uint8)))
    return b"".join(parts)[: mb << 20]


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    data = corpus(mb)

    import banzai_tpu.pipeline as pl
    from banzai_tpu import compress

    # Phase timers, monkeypatched around the pipeline's own helpers.
    t: dict[str, float] = {}

    def timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            t[name] = t.get(name, 0.0) + time.perf_counter() - t0
            return r
        return wrap

    import banzai_tpu.rle1 as rle1_mod

    orig_iter = rle1_mod.iter_blocks

    def timed_iter(*a, **kw):
        it = orig_iter(*a, **kw)
        while True:
            t0 = time.perf_counter()
            try:
                blk = next(it)
            except StopIteration:
                t["rle1+crc"] = t.get("rle1+crc", 0.0) + time.perf_counter() - t0
                return
            t["rle1+crc"] = t.get("rle1+crc", 0.0) + time.perf_counter() - t0
            yield blk

    pl.iter_blocks = timed_iter

    orig_fetch = pl._fetch_words

    def timed_fetch(words, *, k):
        t0 = time.perf_counter()
        r = np.asarray(orig_fetch(words, k=k))
        t["fetch_words"] = t.get("fetch_words", 0.0) + time.perf_counter() - t0
        return r

    # _fetch_words result is wrapped in np.asarray by the caller; returning
    # a numpy array keeps that a no-op so the timing lands here.
    pl._fetch_words = timed_fetch

    orig_encode = pl._encode_blocks

    def timed_encode(*a, **kw):
        t0 = time.perf_counter()
        r = orig_encode(*a, **kw)
        t["dispatch"] = t.get("dispatch", 0.0) + time.perf_counter() - t0
        return r

    pl._encode_blocks = timed_encode

    import banzai_tpu.parallel.serial as ser

    orig_write = ser.BlockPayload.write

    def timed_write(self, bw):
        t0 = time.perf_counter()
        r = orig_write(self, bw)
        t["splice"] = t.get("splice", 0.0) + time.perf_counter() - t0
        return r

    ser.BlockPayload.write = timed_write

    # Also time the blocking nbits/ptr sync inside drain by wrapping
    # np.asarray is too broad; instead time whole drain via pipeline source
    # patch of drain's np.asarray calls is invasive — approximate instead:
    # everything not otherwise attributed shows up in "other".

    # Warm up compile cache.
    compress(data[: 4 << 20], level)
    t.clear()

    t0 = time.perf_counter()
    out = compress(data, level)
    wall = time.perf_counter() - t0

    mbps = (mb) / wall
    nblocks = max(1, (mb << 20) // (level * 100_000))
    print(f"wall {wall*1e3:.0f} ms  {mbps:.2f} MB/s  ~{nblocks} blocks")
    acc = 0.0
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v*1e3:8.0f} ms   {v*1e3/nblocks:6.1f} ms/block")
        acc += v
    print(f"  {'other':12s} {(wall-acc)*1e3:8.0f} ms   "
          f"{(wall-acc)*1e3/nblocks:6.1f} ms/block")
    print(f"compressed {len(out)} bytes")


if __name__ == "__main__":
    main()

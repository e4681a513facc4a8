#!/usr/bin/env python
"""Differential fuzz harness — the reference's fuzz targets, deterministic.

Mirrors fuzz/fuzz_targets/{encode,round_trip}.rs: random inputs are encoded
and (a) must not raise, (b) must decode bit-exactly through the independent
system bzip2 decoder, (c) must be no larger than the banzai model's output.

Usage: python fuzz.py [iterations] [--seed S] [--backend numpy|jax]
                      [--platform cpu|<default>]

``--platform cpu`` pins the jax backend to the host CPU (the axon
sitecustomize otherwise forces the TPU, which may be unreachable).
"""

from __future__ import annotations

import argparse
import random
import subprocess
import sys


def gen_case(rng: random.Random) -> bytes:
    """Structured generator: mixes literals, runs, periodic repeats."""
    kind = rng.randrange(6)
    n = rng.choice([0, 1, 2, 3, 7, 100, 1000, 10_000, 120_000])
    if kind == 0:
        return rng.randbytes(n)
    if kind == 1:
        alpha = rng.choice([1, 2, 3, 16])
        return bytes(rng.randrange(alpha) for _ in range(n))
    if kind == 2:                      # run soup
        parts, tot = [], 0
        while tot < n:
            ln = rng.choice([1, 2, 3, 4, 5, 250, 251, 255, 256, 259, 260])
            parts.append(bytes([rng.randrange(8)]) * ln)
            tot += ln
        return b"".join(parts)
    if kind == 3:                      # periodic
        period = rng.randrange(1, 12)
        seed = rng.randbytes(period)
        return (seed * (n // max(1, period) + 1))[:n]
    if kind == 4:                      # text-ish
        words = [rng.randbytes(rng.randrange(2, 9)) for _ in range(16)]
        out = bytearray()
        while len(out) < n:
            out += rng.choice(words) + b" "
        return bytes(out[:n])
    return rng.randbytes(rng.randrange(0, 300))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("iterations", nargs="?", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default="numpy")
    ap.add_argument(
        "--level", type=int, default=1,
        help="compression level 1-9, or 0 to draw a random level per case",
    )
    ap.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. cpu); default: backend's choice",
    )
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from banzai_tpu import compress
    from banzai_tpu.oracle import banzai_compress

    rng = random.Random(args.seed)
    for i in range(args.iterations):
        data = gen_case(rng)
        level = args.level or rng.randrange(1, 10)
        out = compress(data, level, backend=args.backend)
        p = subprocess.run(["bzip2", "-d"], input=out, capture_output=True)
        if p.returncode != 0 or p.stdout != data:
            print(f"FAIL roundtrip @ iter {i}: {len(data)} bytes "
                  f"(seed {args.seed})", file=sys.stderr)
            with open("fuzz_fail.bin", "wb") as f:
                f.write(data)
            return 1
        ref = banzai_compress(data, level)
        if len(out) > len(ref):
            print(f"FAIL size @ iter {i}: ours {len(out)} > banzai "
                  f"{len(ref)} ({len(data)} bytes input)", file=sys.stderr)
            with open("fuzz_fail.bin", "wb") as f:
                f.write(data)
            return 1
        if i % 10 == 0:
            print(f"iter {i}: {len(data):7d} -> {len(out):7d} "
                  f"(banzai {len(ref)})")
    print(f"{args.iterations} iterations clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Time bwt_rotations per block content class on the real TPU.

Usage: python tools/bwt_cases.py [level]
Cases: text, random, runs (post-RLE1 period-5), periodic-8, periodic-256,
periodic-64k — the classes wall_profile's corpus mixes.  Exposes which
content class blows up the rotation sort.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def cases(N: int) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(3)
    words = [rng.bytes(rng.integers(2, 9)) for _ in range(64)]
    text = b" ".join(words[i] for i in rng.integers(0, 64, N // 4))[:N]
    run5 = (b"AAAA\xfb" * (N // 5 + 1))[:N]          # RLE1-coded long run
    p8 = (rng.bytes(8) * (N // 8 + 1))[:N]
    p256 = (bytes(((np.arange(256) * 37) & 0xFF).astype(np.uint8)) * (N // 256 + 1))[:N]
    p64k = (bytes(((np.arange(65536) * 37) & 0xFF).astype(np.uint8)) * (N // 65536 + 1))[:N]
    return {
        "text": np.frombuffer(text, np.uint8).copy(),
        "random": rng.integers(0, 256, N).astype(np.uint8),
        "run5": np.frombuffer(run5, np.uint8).copy(),
        "per8": np.frombuffer(p8, np.uint8).copy(),
        "per256": np.frombuffer(p256, np.uint8).copy(),
        "per64k": np.frombuffer(p64k, np.uint8).copy(),
    }


def main() -> None:
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    import jax
    import jax.numpy as jnp

    from banzai_tpu.ops.bwt import bwt_rotations
    from banzai_tpu.pipeline import _padded_len

    N = _padded_len(level)
    for name, arr in cases(N - 64).items():
        blk = np.zeros(N, np.uint8)
        blk[: len(arr)] = arr
        d = jnp.asarray(blk)
        n = jnp.int32(len(arr))
        bwt, ptr = bwt_rotations(d, n)          # compile + warm
        np.asarray(bwt[:8])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            bwt, ptr = bwt_rotations(d, n)
            s = int(np.asarray(jnp.sum(bwt.astype(jnp.int32))))
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:8s} {dt:8.1f} ms  (checksum {s})")


if __name__ == "__main__":
    main()


def interleaved(reps: int = 5) -> None:
    """Interleave case timings to cancel tenancy drift."""
    import jax.numpy as jnp
    import jax

    from banzai_tpu.ops.bwt import bwt_rotations
    from banzai_tpu.pipeline import _padded_len

    N = _padded_len(int(sys.argv[2]) if len(sys.argv) > 2 else 9)
    cs = cases(N - 64)
    devs = {}
    for name, arr in cs.items():
        blk = np.zeros(N, np.uint8)
        blk[: len(arr)] = arr
        devs[name] = (jnp.asarray(blk), jnp.int32(len(arr)))
    times = {k: [] for k in cs}
    for name, (d, n) in devs.items():   # warm compile
        b, _ = bwt_rotations(d, n)
        np.asarray(jnp.sum(b.astype(jnp.int32)))
    for r in range(reps):
        for name, (d, n) in devs.items():
            t0 = time.perf_counter()
            b, _ = bwt_rotations(d, n)
            np.asarray(jnp.sum(b.astype(jnp.int32)))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ms = sorted(ts)
        print(f"{name:8s} min {ms[0]*1e3:7.1f}  med {ms[len(ms)//2]*1e3:7.1f} ms")

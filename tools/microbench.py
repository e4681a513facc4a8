#!/usr/bin/env python
"""Primitive-cost microbenchmarks on the current backend (sorts, gathers,
scatters at pipeline-relevant widths).  Informs kernel design choices;
results land in tools/microbench.out.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from banzai_tpu.utils import enable_compile_cache

enable_compile_cache()

N = 900032
B = 8
rng = np.random.default_rng(0)
data = jnp.asarray(rng.integers(0, 1 << 20, size=(B, N), dtype=np.int32))
idx = jnp.asarray(rng.integers(0, N, size=(B, N), dtype=np.int32))


def timeit(fn, *a, reps=5):
    fn(*a)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        ts.append((time.perf_counter() - t0) * 1e3)
    return np.median(ts)


@jax.jit
def sort2(x):
    a, b = jax.lax.sort((x, x + 1), num_keys=1, dimension=1)
    return jnp.sum(b[:, :1])


@jax.jit
def sort5k4(x):
    o = jax.lax.sort((x, x + 1, x + 2, x + 3, x + 4), num_keys=4, dimension=1)
    return jnp.sum(o[4][:, :1])


@jax.jit
def sort9k8(x):
    ops = tuple(x + i for i in range(9))
    o = jax.lax.sort(ops, num_keys=8, dimension=1)
    return jnp.sum(o[8][:, :1])


@jax.jit
def sort3k2(x):
    o = jax.lax.sort((x, x + 1, x + 2), num_keys=2, dimension=1)
    return jnp.sum(o[2][:, :1])


def gat(W):
    @jax.jit
    def f(x, i):
        g = jnp.take_along_axis(x, i[:, :W], axis=1)
        return jnp.sum(g[:, :1])
    return f


def scat(W):
    @jax.jit
    def f(x, i):
        z = (
            jnp.zeros((B, N), jnp.int32)
            .at[jnp.arange(B)[:, None], i[:, :W]]
            .max(x[:, :W])
        )
        return jnp.sum(z[:, :1])
    return f


@jax.jit
def cs(x):
    return jnp.sum(jnp.cumsum(x, axis=1)[:, -1:])


def main():
    print("sort 2op1key :", round(timeit(sort2, data), 1), "ms/batch8")
    print("sort 3op2key :", round(timeit(sort3k2, data), 1))
    print("sort 5op4key :", round(timeit(sort5k4, data), 1))
    print("sort 9op8key :", round(timeit(sort9k8, data), 1))
    for W in (N, N // 4, N // 8, N // 16, N // 64):
        print(f"gather W={W:7d}:", round(timeit(gat(W), data, idx), 1))
    for W in (N, N // 4, N // 8, N // 16, N // 64):
        print(f"scatter W={W:7d}:", round(timeit(scat(W), data, idx), 1))
    print("cumsum:", round(timeit(cs, data), 1))


if __name__ == "__main__":
    main()

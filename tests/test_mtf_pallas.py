"""Pallas MTF kernel vs the XLA formulation (interpret mode on CPU)."""

import random
from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest

from banzai_tpu.mtf_rle2 import mtf_indices
from banzai_tpu.ops.mtf import mtf_indices_device


@pytest.mark.parametrize("seed,n,alpha", [(0, 100, 3), (1, 5000, 256), (2, 8000, 2)])
def test_pallas_kernel_interpret_matches_host(seed, n, alpha):
    rng = random.Random(seed)
    arr = np.frombuffer(
        bytes(rng.randrange(alpha) for _ in range(n)), np.uint8
    )
    present = np.zeros(256, bool)
    present[arr] = True
    N = 8192
    block = np.zeros(N, np.uint8)
    block[:n] = arr
    f = partial(mtf_indices_device, chunk=64, use_pallas=True, interpret=True)
    idx = np.asarray(f(jnp.asarray(block), jnp.int32(n), jnp.asarray(present)))
    assert np.array_equal(idx[:n], mtf_indices(arr, present))


def test_kernel_debug_checks_pass_on_valid_state():
    """In-kernel sanitizer (SURVEY §5): checks compiled in, no violation."""
    from banzai_tpu.ops.mtf_pallas import mtf_shuffle_pallas

    rng = random.Random(7)
    C, K = 3, 64
    syms = np.full((C, K), -1, np.int32)
    for c in range(C):
        k = rng.randrange(1, K + 1)
        syms[c, :k] = [rng.randrange(256) for _ in range(k)]
    state0 = np.stack([np.random.RandomState(c).permutation(256) for c in range(C)])
    out = mtf_shuffle_pallas(
        jnp.asarray(syms), jnp.asarray(state0.astype(np.int32)),
        interpret=True, debug_checks=True,
    )
    base = mtf_shuffle_pallas(
        jnp.asarray(syms), jnp.asarray(state0.astype(np.int32)), interpret=True
    )
    assert np.array_equal(np.asarray(out), np.asarray(base))


def test_kernel_debug_checks_catch_corrupt_state():
    """A non-permutation recency state (duplicate entry) must be caught."""
    from banzai_tpu.ops.mtf_pallas import mtf_shuffle_pallas

    C, K = 1, 8
    syms = np.zeros((C, K), np.int32)
    state0 = np.tile(np.arange(256, dtype=np.int32), (C, 1))
    state0[0, 1] = 0  # duplicate symbol 0 -> two hits for byte 0
    with pytest.raises(AssertionError, match="invariant"):
        mtf_shuffle_pallas(
            jnp.asarray(syms), jnp.asarray(state0),
            interpret=True, debug_checks=True,
        )

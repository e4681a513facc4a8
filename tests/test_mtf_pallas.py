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

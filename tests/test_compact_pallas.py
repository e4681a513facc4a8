"""Round-5 prototype: one-pass Pallas stream compaction (interpret mode;
the production wiring + on-chip lowering are future work — see
ops/compact_pallas.py docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("seed,n,density", [
    (0, 2048, 0.5),
    (1, 4096, 0.05),
    (2, 4096, 0.95),
    (3, 512, 0.0),
    (4, 512, 1.0),
])
def test_compact_stream_matches_numpy(seed, n, density):
    from banzai_tpu.ops.compact_pallas import compact_stream

    rng = np.random.default_rng(seed)
    mask = (rng.random(n) < density)
    pay = rng.integers(0, 1 << 30, n).astype(np.int32)
    packed, count = compact_stream(
        jnp.asarray(mask), jnp.asarray(pay), tile=512, interpret=True
    )
    want = pay[mask]
    assert int(count) == len(want)
    assert np.array_equal(np.asarray(packed)[: len(want)], want)

"""Differential tests: the one-pass Pallas stream kernels
(ops/stream_pallas) must be bit-exact twins of the XLA-sort formulations
they replace (ops/rle2.rle2_device, ops/bitpack.pack_entries).

Run in interpreter mode on the CPU mesh; the on-chip compiled path is
covered by the device fuzz battery (fuzz.py --backend jax on a TPU) and
test_device_pipeline's device==host stream checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banzai_tpu.ops.bitpack import pack_entries
from banzai_tpu.ops.rle2 import rle2_device
from banzai_tpu.ops.stream_pallas import (
    _T, _WIN, pack_words_batch, rle2_expand_batch,
)


def _mtf_case(rng, N, kind):
    if kind == "mixed":
        raw = np.where(
            rng.random(N) < 0.6, 0, rng.integers(1, 200, N)
        )
    elif kind == "zeros":
        raw = np.zeros(N, np.int64)          # one huge run -> 20 digits
    elif kind == "alternating":
        raw = np.tile([0, 3], N // 2 + 1)[:N]
    elif kind == "runs":
        parts = []
        while sum(len(p) for p in parts) < N:
            parts += [np.zeros(rng.integers(1, 300)),
                      np.array([rng.integers(1, 255)])]
        raw = np.concatenate(parts)[:N]
    else:
        raw = rng.integers(0, 255, N)
    return raw.astype(np.int32)


@pytest.mark.parametrize(
    "kind", ["mixed", "zeros", "alternating", "runs", "dense"]
)
def test_rle2_kernel_matches_xla(kind):
    rng = np.random.default_rng(sum(kind.encode()))
    N = 4 * _T  # several tiles; non-multiple M = N+1 exercises padding
    B = 3
    idx = np.stack([_mtf_case(rng, N, kind) for _ in range(B)])
    ns = np.array([N, N - 1, _T + 7], np.int32)
    names = np.array([200, 254, 31], np.int32)
    syms_k, len_k = rle2_expand_batch(
        jnp.asarray(idx), jnp.asarray(ns), jnp.asarray(names),
        interpret=True,
    )
    for b in range(B):
        syms_x, len_x, _ = rle2_device(
            jnp.asarray(idx[b]), jnp.int32(ns[b]), jnp.int32(names[b]),
            with_freqs=False,
        )
        assert int(len_k[b]) == int(len_x), (kind, b)
        np.testing.assert_array_equal(
            np.asarray(syms_k[b]), np.asarray(syms_x), err_msg=f"{kind}/{b}"
        )


def test_rle2_kernel_tiny_n():
    # n smaller than one tile, plus the n == N edge (EOB at the last pos).
    rng = np.random.default_rng(7)
    N = 2 * _T
    idx = rng.integers(0, 5, (2, N)).astype(np.int32)
    ns = np.array([3, 1], np.int32)
    names = np.array([5, 2], np.int32)
    syms_k, len_k = rle2_expand_batch(
        jnp.asarray(idx), jnp.asarray(ns), jnp.asarray(names),
        interpret=True,
    )
    for b in range(2):
        syms_x, len_x, _ = rle2_device(
            jnp.asarray(idx[b]), jnp.int32(ns[b]), jnp.int32(names[b]),
            with_freqs=False,
        )
        assert int(len_k[b]) == int(len_x)
        np.testing.assert_array_equal(np.asarray(syms_k[b]), np.asarray(syms_x))


def _entry_case(rng, E, kind):
    if kind == "mixed":
        lens = rng.integers(0, 18, E)
        vals = rng.integers(0, 1 << 17, E)
    elif kind == "wide":
        lens = rng.integers(24, 33, E)       # force straddles
        vals = rng.integers(0, 1 << 31, E, dtype=np.int64)
    elif kind == "sparse":
        lens = np.where(rng.random(E) < 0.9, 0, rng.integers(1, 16, E))
        vals = rng.integers(0, 1 << 15, E)
    else:  # boundary: many exact-32-bit entries
        lens = np.where(rng.random(E) < 0.5, 32, 16)
        vals = rng.integers(0, 1 << 31, E, dtype=np.int64)
    return vals.astype(np.uint32), lens.astype(np.int32)


@pytest.mark.parametrize("kind", ["mixed", "wide", "sparse", "boundary"])
def test_pack_kernel_matches_xla(kind):
    rng = np.random.default_rng(sum(kind.encode()))
    E = 4 * _T - 9          # non-multiple exercises padding
    B = 3
    vals = np.stack([_entry_case(rng, E, kind)[0] for _ in range(B)])
    lens = np.stack([_entry_case(rng, E, kind)[1] for _ in range(B)])
    nwords = int(lens.sum(1).max()) // 32 + 3
    words_k, tot_k = pack_words_batch(
        jnp.asarray(vals), jnp.asarray(lens), nwords, interpret=True
    )
    for b in range(B):
        words_x, tot_x = pack_entries(
            jnp.asarray(vals[b]), jnp.asarray(lens[b]), nwords
        )
        assert int(tot_k[b]) == int(tot_x), (kind, b)
        np.testing.assert_array_equal(
            np.asarray(words_k[b]), np.asarray(words_x),
            err_msg=f"{kind}/{b}",
        )


def test_pack_kernel_single_word_pileup():
    # Hundreds of zero-length entries sharing one word across several
    # tiles: the carry must chain through whole tiles untouched.
    E = 3 * _T
    lens = np.zeros(E, np.int32)
    lens[0] = 7
    lens[-1] = 13
    vals = np.full(E, 0x5A, np.uint32)
    nwords = 4
    words_k, tot_k = pack_words_batch(
        jnp.asarray(vals[None]), jnp.asarray(lens[None]), nwords,
        interpret=True,
    )
    words_x, tot_x = pack_entries(
        jnp.asarray(vals), jnp.asarray(lens), nwords
    )
    assert int(tot_k[0]) == int(tot_x) == 20
    np.testing.assert_array_equal(np.asarray(words_k[0]), np.asarray(words_x))


def test_span_bounds_hold():
    """The WCAP store size rests on two inequalities — re-check them on
    adversarial data (they are load-bearing for memory safety).
    """
    rng = np.random.default_rng(3)
    # rle2: per-tile width sum <= _T + 20.
    from banzai_tpu.ops.rle2 import rle2_entries

    N = 8 * _T
    idx = jnp.asarray(_mtf_case(rng, N, "runs"))
    off, width, _, _, _ = rle2_entries(idx, jnp.int32(N), jnp.int32(250))
    ends = np.asarray(off + width)
    offs = np.asarray(off)
    for t in range(0, N + 1, _T):
        hi = min(t + _T, N + 1)
        span = ends[t:hi].max(initial=0) - offs[t]
        assert span <= _T + 21 <= _WIN - 127, (t, span)

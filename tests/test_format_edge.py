"""Format-edge guards: fields whose static capacity sits near a format
limit (VERDICT r4 weak #6).

The 15-bit ``num_selectors`` field (lib/huffman.rs:470) caps at 32,767
segments; a max-size level-9 block produces ~18,003 (900,096/50) — close
enough that a future block-capacity change could silently wrap it.  The
write sites now assert the cap (huffman_host.write_entropy, device
ops/bitpack.block_payload_entries at trace time); this test drives a real
max-size block through the edge.
"""

import numpy as np

from banzai_tpu.encoder_host import block_plan, compress as host_compress
from banzai_tpu.rle1 import split_blocks


def test_max_block_selector_count_near_edge(bunzip):
    # Random bytes: RLE1 almost never finds runs, so one level-9 block
    # consumes the full 899,999-byte RLE1 budget and MTF emits ~1 symbol
    # per byte — the worst case for the selector count.
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, size=1_000_000, dtype=np.uint8).tobytes()
    blocks = split_blocks(data, 9)
    assert len(blocks) >= 2 and len(blocks[0].output) == 899_999

    ptr, present, syms, plan = block_plan(blocks[0].output)
    nseg = len(plan.selectors)
    # Near the edge but under it: the format has ~1.8x headroom at the
    # current 900k block capacity, and that headroom is load-bearing.
    assert 17_000 <= nseg < (1 << 15), nseg
    assert nseg == (len(syms) + 49) // 50

    # The full stream still encodes and survives the independent decoder.
    out = host_compress(data, 9)
    assert bunzip(out) == data

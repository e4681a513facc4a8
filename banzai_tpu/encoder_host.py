"""Host (NumPy) production encoder: the full per-block pipeline without JAX.

This backend is the differential twin of the device pipeline — identical
algorithms (cyclic rotation sort, chunk-parallel MTF, package-merge entropy
plan), NumPy execution.  It is also the fallback when no accelerator is
present.  Output is guaranteed valid .bz2 and — via the adaptive entropy
candidate search — no larger than the banzai model's on every tested input.
"""

from __future__ import annotations

import numpy as np

from .bitio import BitWriter
from .container import (
    write_block_header,
    write_stream_footer,
    write_stream_header,
    write_sym_map,
)
from .crc32 import combine_stream_crc
from .huffman_host import plan_entropy, write_entropy
from .mtf_rle2 import mtf_indices, rle2_encode
from .oracle.stages import numpy_bwt
from .rle1 import iter_blocks


def compress(data: bytes, level: int = 9) -> bytes:
    """Encode ``data`` to a .bz2 stream (host backend)."""
    bw = BitWriter()
    write_stream_header(bw, level)
    stream_crc = 0
    for blk in iter_blocks(data, level):
        stream_crc = combine_stream_crc(stream_crc, blk.crc)
        encode_block(bw, blk.output, blk.crc)
    write_stream_footer(bw, stream_crc)
    return bw.close()


def block_plan(rle1_out: np.ndarray):
    """The five-stage host pipeline for one block: (ptr, present, syms,
    plan).  The ONE implementation shared by the host backend and the
    device-failure fallback (pipeline._host_payload) — they must emit
    byte-identical streams, so the stages live in exactly one place."""
    bwt, ptr = numpy_bwt(rle1_out)
    present = np.zeros(256, dtype=bool)
    present[rle1_out] = True
    num_names = int(present.sum())
    idx = mtf_indices(bwt, present)
    syms, freqs = rle2_encode(idx, num_names)
    plan = plan_entropy(syms, num_names + 2, freqs)
    return ptr, present, syms, plan


def encode_block(bw: BitWriter, rle1_out: np.ndarray, crc: int) -> tuple[int, int]:
    """Write one block; returns (ptr, entropy_payload_bits) so callers can
    report the same numbers the device path does (BlockStats contract:
    payload bits exclude the header/symbol map)."""
    ptr, present, syms, plan = block_plan(rle1_out)
    write_block_header(bw, crc, ptr)
    write_sym_map(bw, present)
    bits0 = bw.bit_length
    write_entropy(bw, syms, plan)
    return ptr, bw.bit_length - bits0

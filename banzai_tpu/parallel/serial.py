"""Serializable per-block compressed payloads (multi-host gather unit).

A BlockPayload carries everything needed to write one block into the final
stream: its CRC (host-computed during RLE1), BWT ptr, byte-presence map,
and the device-packed payload words + bit length.  Payloads cross DCN as
flat bytes during the ordered gather (SURVEY.md §2.11)."""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..bitio import BitWriter
from ..container import write_block_header, write_sym_map

_HDR = struct.Struct("<IIiI")   # crc, ptr, nbits, nwords


@dataclass
class BlockPayload:
    crc: int
    ptr: int
    present: np.ndarray        # bool[256]
    words: np.ndarray          # uint32[<=nwords], tight
    nbits: int

    def write(self, bw: BitWriter) -> None:
        write_block_header(bw, self.crc, self.ptr)
        write_sym_map(bw, self.present)
        bw.splice_words(self.words, self.nbits)

    def to_bytes(self) -> bytes:
        tight = self.words[: (self.nbits + 31) // 32].astype("<u4")
        return (
            _HDR.pack(self.crc, self.ptr, self.nbits, len(tight))
            + np.packbits(self.present).tobytes()
            + tight.tobytes()
        )

    @classmethod
    def iter_from_bytes(cls, blob: bytes) -> Iterator["BlockPayload"]:
        off = 0
        while off < len(blob):
            crc, ptr, nbits, nwords = _HDR.unpack_from(blob, off)
            off += _HDR.size
            present = np.unpackbits(
                np.frombuffer(blob, np.uint8, 32, off)
            ).astype(bool)
            off += 32
            words = np.frombuffer(blob, "<u4", nwords, off)
            off += 4 * nwords
            yield cls(crc, ptr, present, words, nbits)
